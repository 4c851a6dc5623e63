package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Flac

/** FLAC codec certification: lossless ⇒ every roundtrip is EXACT equality.
  * No independent decoder exists in this container (the JDK does not read
  * FLAC), so certification rests on exact roundtrips through every subframe
  * type, CRC tamper-detection, and fuzz no-throw — the same regimen as the
  * pre-ImageIO pure-bytes decoders (BMP/PGM/WAV), plus the f09 analytic
  * oracle downstream.
  */
class FlacSpec extends AnyFunSuite with SparkTestBase {

  private def rnd(seed: Long, n: Int): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(65536) - 32768)
  }

  test("every subframe type roundtrips exactly: CONSTANT, FIXED, VERBATIM, LPC") {
    val n = 1000
    val smooth = Array.tabulate(n)(i =>
      (2000 * math.sin(i / 25.0)).toInt + (i % 7)) // FIXED-friendly
    for ((name, samples, mode) <- Seq(
      ("fixed/auto", smooth, (_: Int) => Flac.Auto),
      ("constant", Array.fill(n)(-1234), (_: Int) => Flac.Auto),
      ("verbatim", rnd(1, n), (_: Int) => Flac.Verbatim),
      ("lpc2", smooth, (_: Int) => Flac.Lpc2(c1 = 3 << 8, c2 = -(1 << 9), shift = 10)),
      ("mixed", smooth, (f: Int) => f % 3 match {
        case 0 => Flac.Auto
        case 1 => Flac.Verbatim
        case _ => Flac.Lpc2(c1 = 3 << 8, c2 = -(1 << 9), shift = 10)
      }))) {
      val enc = Flac.encode(samples, 16000, blockSize = 192, mode = mode)
      val dec = Flac.decode(enc).getOrElse(fail(s"$name failed to decode"))
      assert(dec.sampleRate == 16000 && dec.nSamples == n, name)
      assert(dec.samples.sameElements(samples), s"$name: sample mismatch")
    }
  }

  test("partial final block and extreme amplitudes roundtrip") {
    val samples = Array(Short.MinValue.toInt, Short.MaxValue.toInt, 0, -1, 1) ++
      rnd(9, 777) // 782 samples, blockSize 256 → 3 full + 14-sample tail
    val dec = Flac.decode(Flac.encode(samples, 8000, blockSize = 256)).get
    assert(dec.samples.sameElements(samples))
  }

  test("CRC gates: a flipped bit anywhere in a frame rejects the stream") {
    val good = Flac.syntheticFlac(13L)
    assert(Flac.decode(good).isDefined)
    // flip one bit in the LAST qtr of the payload (frame data, not metadata)
    val bad = good.clone()
    bad(good.length - good.length / 4) = (bad(good.length - good.length / 4) ^ 0x10).toByte
    assert(Flac.decode(bad).isEmpty, "bit flip inside a frame must fail a CRC")
  }

  test("malformed payloads dead-letter: magic, truncation, unsupported shapes") {
    val good = Flac.syntheticFlac(3L)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode("OggS not flac".getBytes("UTF-8")).isEmpty)
    assert(Flac.decode(good.take(4)).isEmpty)
    assert(Flac.decode(good.take(good.length / 2)).isEmpty)
    // stereo flip in STREAMINFO (byte 8+4+12, channels bits): the stream's
    // frames are mono, so the channel-consistency gate must reject the
    // mismatch (metadata blocks carry no CRC — this is the only guard)
    val stereo = good.clone()
    stereo(8 + 12) = (stereo(8 + 12) | 0x02).toByte // channels-1: 0 → 1
    assert(Flac.decode(stereo).isEmpty)
  }

  test("fuzz: random corruptions never throw") {
    val rng = new scala.util.Random(77)
    val good = Flac.syntheticFlac(21L)
    for (_ <- 0 until 500) {
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Flac.decode(mut)
    }
    for (_ <- 0 until 100) {
      val junk = new Array[Byte](rng.nextInt(300))
      rng.nextBytes(junk)
      Flac.decode(junk)
    }
  }

  test("synthetic payloads decode to the closed-form samples (f09 oracle contract)") {
    for (docId <- 0L until 40L) {
      val n = (600 + (docId % 4) * 200).toInt
      val dec = Flac.decode(Flac.syntheticFlac(docId))
        .getOrElse(fail(s"doc $docId failed to decode"))
      assert(dec.nSamples == n && dec.sampleRate == 16000)
      for (i <- 0 until n) {
        val expected =
          if ((i / 128 + docId) % 4 == 0) ((docId * 31) % 1024).toInt - 512
          else (((docId * 7 + i.toLong * 13) % 2048) - 1024).toInt
        assert(dec.samples(i) == expected, s"doc $docId sample $i")
      }
    }
  }

  test("stereo roundtrips exactly through every channel decorrelation") {
    val n = 900
    val rngL = new scala.util.Random(5)
    // correlated channels (decorrelation's target case) + hard extremes
    val left = Array.tabulate(n)(i => (3000 * math.sin(i / 17.0)).toInt + rngL.nextInt(64))
    val right = Array.tabulate(n)(i => left(i) - 200 + (i % 9))
    left(0) = Short.MaxValue; right(0) = Short.MinValue   // side = +65535 (17 bits)
    left(1) = Short.MinValue; right(1) = Short.MaxValue   // side = -65535
    for (chMode <- Seq(1, 8, 9, 10)) {
      val enc = Flac.encodeStereo(left, right, 44100, blockSize = 192,
        chModeFor = _ => chMode)
      val dec = Flac.decode(enc).getOrElse(fail(s"chMode $chMode failed to decode"))
      assert(dec.channels == 2 && dec.nSamples == n, s"chMode $chMode")
      assert(dec.chans(0).sameElements(left), s"chMode $chMode: left mismatch")
      assert(dec.chans(1).sameElements(right), s"chMode $chMode: right mismatch")
    }
    // one stream cycling all four assignments frame by frame
    val enc = Flac.encodeStereo(left, right, 44100, blockSize = 128,
      chModeFor = f => Seq(1, 8, 9, 10)(f % 4))
    val dec = Flac.decode(enc).get
    assert(dec.chans(0).sameElements(left) && dec.chans(1).sameElements(right),
      "mixed-assignment stream mismatch")
  }

  test("stereo Lpc2 subframes roundtrip with a negative 17-bit side warmup") {
    // side channel bps = 17; sample 1's side value is NEGATIVE, so a writer
    // that masks the second warmup with a hardcoded 0xffff (instead of the
    // bps-wide mask) loses the sign bit and mis-encodes silently
    val n = 384
    val left = Array.tabulate(n)(i => (2500 * math.sin(i / 11.0)).toInt)
    val right = Array.tabulate(n)(i => left(i) + 150 - (i % 7))
    left(1) = Short.MinValue; right(1) = Short.MaxValue // side(1) = -65535
    left(2) = Short.MaxValue; right(2) = Short.MinValue // side(2) = +65535
    for (chMode <- Seq(8, 9, 10)) {
      val enc = Flac.encodeStereo(left, right, 44100, blockSize = 192,
        chModeFor = _ => chMode,
        mode = _ => Flac.Lpc2(c1 = 3 << 8, c2 = -(1 << 9), shift = 10))
      val dec = Flac.decode(enc).getOrElse(fail(s"chMode $chMode Lpc2 decode failed"))
      assert(dec.chans(0).sameElements(left), s"chMode $chMode Lpc2: left mismatch")
      assert(dec.chans(1).sameElements(right), s"chMode $chMode Lpc2: right mismatch")
    }
  }

  test("extractFlac over a payload column dead-letters corrupt rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      (id, if (id % 5 == 2) Array[Byte](9, 9, 9) else Flac.syntheticFlac(id))
    }
    val feats = Flac.extractFlac(spark, rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect()
    assert(feats.length == 16)
    feats.foreach(f => assert(f.n_samples == 600 + (f.doc_id % 4) * 200))
  }
}
