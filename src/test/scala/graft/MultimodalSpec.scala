package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("binary payload pipeline extracts deterministic features") {
    val df = Tables.documents(spark, sfDir).limit(50)
      .withColumn("payload", col("text").cast("binary"))
    val feats = Multimodal.extractFeatures(spark, df, "doc_id", "payload").collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
      assert(f.width >= 0 && f.width < 4096)
    }
    // re-run must produce identical features (stub decode is pure)
    val again = Multimodal.extractFeatures(spark, df, "doc_id", "payload").collect()
    assert(feats.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("real PGM decoder: known-answer roundtrip, malformed payloads dead-letter") {
    // hand-built 2x2 P5 image, pixels 10,20,30,40 → mean 25.0
    val img = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30, 40)
    val f = Multimodal.decodePgm(7L, img).get
    assert(f.width == 2 && f.height == 2 && f.n_pixels == 4 && f.mean_gray == 25.0)
    // synthetic generator roundtrips through the real parser
    val s = Multimodal.decodePgm(42L, Multimodal.syntheticPgm(42L)).get
    assert(s.width == (8 + 42 % 9) && s.height == (8 + 42 % 7))
    // malformed: wrong magic, truncated pixel plane, junk — dropped, no throw
    assert(Multimodal.decodePgm(1L, "P6\n2 2\n255\nxxxx".getBytes).isEmpty)
    assert(Multimodal.decodePgm(1L, "P5\n9 9\n255\nxx".getBytes).isEmpty)
    assert(Multimodal.decodePgm(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodePgm(1L, Array.emptyByteArray).isEmpty)
  }

  test("real WAV decoder: chunk walk, known answers, malformed dead-letter") {
    // synthetic generator roundtrips through the real parser
    val s = Multimodal.decodeWav(42L, Multimodal.syntheticWav(42L)).get
    assert(s.sample_rate == 8000 + (42 % 4) * 4000)
    assert(s.n_samples == 64 + 42 % 129)
    assert(s.peak <= 255 && s.mean_amp > 0)
    // a LIST chunk BEFORE fmt/data must be skipped by the chunk walk —
    // this is what separates a chunk parser from a fixed-offset reader.
    // LIST payload is 5 bytes (odd) to exercise the word-alignment pad.
    val base = Multimodal.syntheticWav(7L)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val withList = base.take(12) ++ listChunk ++ base.drop(12)
    // RIFF size field must cover the inserted chunk
    val fixed = withList.clone()
    val newSize = withList.length - 8
    fixed(4) = newSize.toByte; fixed(5) = (newSize >>> 8).toByte
    fixed(6) = (newSize >>> 16).toByte; fixed(7) = (newSize >>> 24).toByte
    assert(Multimodal.decodeWav(7L, fixed) == Multimodal.decodeWav(7L, base))
    // malformed: wrong magic, truncated data chunk, stereo/16-bit/non-PCM
    assert(Multimodal.decodeWav(1L, "RIFZ".getBytes ++ base.drop(4)).isEmpty)
    assert(Multimodal.decodeWav(1L, base.dropRight(10)).isEmpty)
    val stereo = base.clone(); stereo(22) = 2
    assert(Multimodal.decodeWav(1L, stereo).isEmpty)
    val bits16 = base.clone(); bits16(34) = 16
    assert(Multimodal.decodeWav(1L, bits16).isEmpty)
    val nonPcm = base.clone(); nonPcm(20) = 3
    assert(Multimodal.decodeWav(1L, nonPcm).isEmpty)
    assert(Multimodal.decodeWav(1L, Array.emptyByteArray).isEmpty)
  }

  test("WAV differential: javax.sound-authored RIFF wires decode exactly (r17 sweep pin)") {
    // the chunk-walk tests above use hand-built / synthetic wires; this
    // pins the r17 sweep axis — an INDEPENDENT JDK RIFF writer with its
    // own chunk layout — at a fixed seed so it runs per commit.
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val rng = new scala.util.Random(1717)
    for (t <- 0 until 20) {
      val rate = 8000 + rng.nextInt(40001)
      val n = 1 + rng.nextInt(5000)
      val data = new Array[Byte](n)
      rng.nextBytes(data)
      var sum = 0L; var peak = 0
      data.foreach { s => val v = s & 0xff; sum += v; if (v > peak) peak = v }
      val fmt = new AudioFormat(rate.toFloat, 8, 1, false, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      val wire = bos.toByteArray
      val f = Multimodal.decodeWav(t.toLong, wire)
        .getOrElse(fail(s"trial $t: decodeWav rejected a JDK-authored WAV (rate=$rate n=$n)"))
      assert(f.sample_rate == rate && f.n_samples == n, s"trial $t header fields")
      assert(f.peak == peak && f.mean_amp == sum.toDouble / n, s"trial $t sample stats")
      assert(Multimodal.fingerprintWav(t.toLong, wire).isDefined, s"trial $t fingerprint")
    }
  }

  test("nearest-neighbor resize samples the exact grid") {
    // 2×2 source (10,20 / 30,40) resized to 4×4: sy=⌊oy·2/4⌋, sx=⌊ox·2/4⌋ →
    // each source pixel replicated 2×2 → sum = (10+20+30+40)·4 = 400
    val img = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30, 40)
    val r = Multimodal.resizePgm(7L, img, 4, 4).get
    assert(r.checksum == 400L && r.mean_resized == 25.0)
    assert(r.out_w == 4 && r.out_h == 4 && r.width == 2 && r.height == 2)
    // downscale: 4×4 → 1×1 keeps only source (0,0)
    val img4 = "P5\n4 4\n255\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](16)(i => (i * 10).toByte)
    assert(Multimodal.resizePgm(8L, img4, 1, 1).get.checksum == 0L)
    assert(Multimodal.resizePgm(1L, "junk".getBytes, 4, 4).isEmpty)
  }

  test("frame-sampling decode: seeks unsampled frames, dead-letters bad containers") {
    val vid = Multimodal.syntheticVideo(43L) // 43 % 5 = 3 → 5 frames
    val s3 = Multimodal.decodeVideo(43L, vid, stride = 3).get
    assert(s3.n_frames == 5 && s3.n_sampled == 2) // frames 0 and 3
    // stride 1 decodes everything; pooled mean over all frames
    val s1 = Multimodal.decodeVideo(43L, vid, stride = 1).get
    assert(s1.n_sampled == 5 && s1.sampled_pixels > s3.sampled_pixels)
    // the container walk must be exact: truncated tail, bad magic, frame
    // count mismatch and mid-stream corruption all dead-letter — even when
    // the corrupt frame would not have been sampled (structure is always
    // validated; only pixel DECODING is skipped)
    assert(Multimodal.decodeVideo(43L, vid.dropRight(1)).isEmpty)
    assert(Multimodal.decodeVideo(43L, "XVID".getBytes ++ vid.drop(4)).isEmpty)
    val overCount = vid.clone(); overCount(4) = 9
    assert(Multimodal.decodeVideo(43L, overCount).isEmpty)
    val corrupt = vid.clone()
    // smash frame 1's magic (the second "P5" in the container)
    val idx = (6 until corrupt.length - 1).filter(i =>
      corrupt(i) == 'P' && corrupt(i + 1) == '5')(1)
    corrupt(idx) = 'Q'
    assert(Multimodal.decodeVideo(43L, corrupt).isEmpty)
  }

  test("real BMP decoder: bottom-up BGR rows, padding, data-offset gap, dead-letter") {
    // hand-built 2x2 24-bit BMP, bottom-up: stored rows are logical row 1
    // then row 0; each 6-byte row padded to 8. Logical pixels (BGR):
    //   (0,0)=(1,2,3)  (1,0)=(4,5,6)  (0,1)=(7,8,9)  (1,1)=(10,11,12)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val header = "BM".getBytes ++ le32(54 + 16) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val rows = Array[Byte](7, 8, 9, 10, 11, 12, 0, 0, // logical row 1 first
      1, 2, 3, 4, 5, 6, 0, 0)
    val f = Multimodal.decodeBmp(5L, header ++ rows).get
    assert(f.width == 2 && f.height == 2 && f.n_pixels == 4)
    assert(f.mean_b == (1 + 4 + 7 + 10) / 4.0)  // B channel = bytes 0 of each px
    assert(f.mean_g == (2 + 5 + 8 + 11) / 4.0)
    assert(f.mean_r == (3 + 6 + 9 + 12) / 4.0)
    // negative height = top-down: swap stored row order, same means, and the
    // decoder must read rows forward
    val tdHeader = header.clone()
    System.arraycopy(le32(-2), 0, tdHeader, 22, 4)
    val tdRows = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0, 7, 8, 9, 10, 11, 12, 0, 0)
    val td = Multimodal.decodeBmp(5L, tdHeader ++ tdRows).get
    assert(td.mean_r == f.mean_r && td.mean_g == f.mean_g && td.mean_b == f.mean_b)
    // a data-offset gap (palette/ICC space) must be honored, not assumed 54
    val gapHeader = header.clone()
    System.arraycopy(le32(54 + 8), 0, gapHeader, 10, 4)
    val gap = Multimodal.decodeBmp(5L, gapHeader ++ Array.fill[Byte](8)(99) ++ rows).get
    assert(gap.mean_r == f.mean_r)
    // synthetic generator roundtrips through the real parser
    val s = Multimodal.decodeBmp(42L, Multimodal.syntheticBmp(42L)).get
    assert(s.width == (4 + 42 % 5) && s.height == (3 + 42 % 4))
    // malformed: bad magic, 8bpp, RLE compression, truncated plane, crafted
    // width that wraps Int in w*3, short header — all dead-letter, no throw
    assert(Multimodal.decodeBmp(1L, "XX".getBytes ++ header.drop(2) ++ rows).isEmpty)
    val bpp8 = header.clone(); System.arraycopy(le16(8), 0, bpp8, 28, 2)
    assert(Multimodal.decodeBmp(1L, bpp8 ++ rows).isEmpty)
    val rle = header.clone(); System.arraycopy(le32(1), 0, rle, 30, 4)
    assert(Multimodal.decodeBmp(1L, rle ++ rows).isEmpty)
    assert(Multimodal.decodeBmp(1L, header ++ rows.take(9)).isEmpty)
    val wide = header.clone(); System.arraycopy(le32(0x7ffffff0), 0, wide, 18, 4)
    assert(Multimodal.decodeBmp(1L, wide ++ rows).isEmpty)
    val minH = header.clone(); System.arraycopy(le32(Int.MinValue), 0, minH, 22, 4)
    assert(Multimodal.decodeBmp(1L, minH ++ rows).isEmpty)
    assert(Multimodal.decodeBmp(1L, (header ++ rows).take(53)).isEmpty)
  }

  test("dhash: identity, brightness invariance, perturbation bound, dead-letter") {
    val img = Multimodal.syntheticPgm(42L)
    val h = Multimodal.dhashPgm(42L, img).get
    // identical payload → identical hash (the exact-dup collision)
    assert(Multimodal.dhashPgm(999L, img).get == h)
    // uniform brightness shift leaves every gradient SIGN unchanged —
    // shift the whole plane by a constant (mod-free: clamp-safe +1)
    val bright = img.clone()
    val w = (8 + 42 % 9); val hh = (8 + 42 % 7)
    val plane = bright.length - w * hh
    (plane until bright.length).foreach { i =>
      bright(i) = (((bright(i) & 0xff) + 1) % 256).toByte
    }
    // +1 mod 256 wraps 255→0, which CAN flip a gradient at wrap points —
    // use a plane with no 255s to make the invariance exact
    val safe = img.clone()
    (plane until safe.length).foreach { i =>
      safe(i) = ((safe(i) & 0xff) % 200).toByte
    }
    val hSafe = Multimodal.dhashPgm(42L, safe).get
    val shifted = safe.clone()
    (plane until shifted.length).foreach { i =>
      shifted(i) = (((shifted(i) & 0xff) + 40)).toByte
    }
    assert(Multimodal.dhashPgm(42L, shifted).get == hSafe,
      "dHash must be invariant to uniform brightness shift")
    // single-pixel perturbation moves at most 2 gradient bits
    val pert = img.clone()
    pert(plane) = (((pert(plane) & 0xff) + 16) % 256).toByte
    val hp = Multimodal.dhashPgm(42L, pert).get
    assert(java.lang.Long.bitCount(h ^ hp) <= 2)
    // malformed payloads dead-letter
    assert(Multimodal.dhashPgm(42L, img.take(5)).isEmpty)
    assert(Multimodal.dhashPgm(42L, "P6\n1 1\n255\nx".getBytes("US-ASCII")).isEmpty)
  }

  test("audio fingerprint: identity, perturbation bound, short/malformed dead-letter") {
    val wav = Multimodal.syntheticWav(42L)
    val h = Multimodal.fingerprintWav(42L, wav).get
    assert(Multimodal.fingerprintWav(999L, wav).get == h)
    // single-sample perturbation only moves window 0's mean → ≤ 1 bit
    val pert = wav.clone()
    pert(44) = (((pert(44) & 0xff) + 32) % 256).toByte
    val hp = Multimodal.fingerprintWav(42L, pert).get
    assert(java.lang.Long.bitCount(h ^ hp) <= 1)
    // fingerprint needs every window non-empty: a 10-sample clip dead-letters
    // even though decodeWav accepts it
    val tiny = Multimodal.syntheticWav(42L)
    // rewrite as a valid 10-sample wav via the synthetic writer's layout:
    // easier to build from scratch through syntheticWav is fixed-n, so just
    // truncate structurally → malformed → None for BOTH paths
    assert(Multimodal.fingerprintWav(42L, tiny.take(20)).isEmpty)
    assert(Multimodal.fingerprintWav(42L, "RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // 32 comparison bits only — bits 32+ never set
    assert((h >>> 32) == 0L)
  }

  test("stub decode is a pure function of the payload") {
    val a = Multimodal.stubDecode(Multimodal.MMRecord(1L, "hello world".getBytes("UTF-8")))
    val b = Multimodal.stubDecode(Multimodal.MMRecord(1L, "hello world".getBytes("UTF-8")))
    val c = Multimodal.stubDecode(Multimodal.MMRecord(1L, "other bytes!".getBytes("UTF-8")))
    assert(a == b)
    assert(a.p_hash != c.p_hash)
    assert(Multimodal.stubDecode(Multimodal.MMRecord(2L, Array.emptyByteArray)).n_bytes == 0)
  }
}
