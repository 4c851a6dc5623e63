package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jpeg

/** Baseline JPEG codec certification. Two independent anchors:
  *  - analytic: block-constant images decode EXACTLY (the f07 oracle's
  *    contract — zero AC energy, integer DC, all-ones quant);
  *  - differential: the JDK's ImageIO (an independent libjpeg-lineage
  *    implementation) both (a) decodes OUR encoder's output and (b)
  *    produces real-world bitstreams OUR decoder must read, with per-pixel
  *    tolerance only for the spec-permitted IDCT implementation variance.
  */
class JpegSpec extends AnyFunSuite with SparkTestBase {

  private def gray(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
  }

  test("block-constant synthetic payloads decode exactly (f07 oracle contract)") {
    for (docId <- 0L until 60L) {
      val w = (9 + docId % 8).toInt
      val h = (8 + docId % 5).toInt
      val f = Jpeg.decodeJpeg(docId, Jpeg.syntheticJpeg(docId))
        .getOrElse(fail(s"doc $docId failed to decode"))
      assert(f.width == w && f.height == h && f.n_pixels == w * h)
      val img = Jpeg.decode(Jpeg.syntheticJpeg(docId)).get
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (((docId * 31 + (x / 8) * 17 + (y / 8) * 29) % 256 + 256) % 256).toInt
        assert(img.planes(0)(y * w + x) == expected,
          s"doc $docId pixel ($x,$y): got ${img.planes(0)(y * w + x)}, want $expected")
      }
    }
  }

  test("ImageIO decodes our encoder's output to the identical pixels (block-constant)") {
    for (docId <- Seq(0L, 3L, 17L, 40L, 123L)) {
      val bytes = Jpeg.syntheticJpeg(docId)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(theirs != null, s"ImageIO rejected our bitstream for doc $docId")
      val ours = Jpeg.decode(bytes).get
      assert(theirs.getWidth == ours.width && theirs.getHeight == ours.height)
      assert(gray(theirs).sameElements(ours.planes(0)),
        s"doc $docId: ImageIO and our decoder disagree on a block-constant image")
    }
  }

  test("our encoder's AC path: non-constant image roundtrips within IDCT-rounding") {
    // gradient + texture → every block has live AC coefficients (runs, ZRL,
    // EOB all exercised); all-ones quant keeps quantization error at pure
    // coefficient rounding, so decode must sit within ±2 of the source.
    val w = 37; val h = 23 // non-multiples of 8 → edge-replicated partial blocks
    def px(x: Int, y: Int): Int = (x * 7 + y * 11 + (x * y) % 13) % 256
    val bytes = Jpeg.encodeGray(w, h, px, restartInterval = 3)
    val img = Jpeg.decode(bytes).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(img.planes(0)(y * w + x) - px(x, y))
      assert(d <= 2, s"pixel ($x,$y) off by $d")
    }
    // and ImageIO agrees with us within its own IDCT variance
    val theirs = gray(ImageIO.read(new ByteArrayInputStream(bytes)))
    val ours = img.planes(0)
    val maxDiff = ours.indices.map(i => math.abs(ours(i) - theirs(i))).max
    assert(maxDiff <= 2, s"max per-pixel disagreement with ImageIO: $maxDiff")
  }

  test("real-world bitstream: ImageIO-encoded grayscale decodes within tolerance") {
    // libjpeg-lineage encoder: real quant tables, optimized-or-default
    // Huffman, real AC statistics — none of it authored by our encoder.
    val w = 40; val h = 25
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 5 + y * 9) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(src, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Jpeg.decode(bytes).getOrElse(fail("our decoder rejected an ImageIO jpeg"))
    assert(ours.width == w && ours.height == h && ours.nComp == 1)
    val theirs = gray(ImageIO.read(new ByteArrayInputStream(bytes)))
    val maxDiff = ours.planes(0).indices.map(i => math.abs(ours.planes(0)(i) - theirs(i))).max
    assert(maxDiff <= 2, s"max per-pixel disagreement decoding ImageIO's bitstream: $maxDiff")
  }

  test("real-world color bitstream: 3-component YCbCr with subsampling") {
    // flat-color image → chroma constant per macroblock, so any conforming
    // subsample/upsample chain reconstructs it; pins the multi-component
    // MCU layout, chroma upsampling, and YCbCr→RGB conversion.
    val w = 48; val h = 32
    val (r0, g0, b0) = (200, 120, 40)
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) src.setRGB(x, y, (r0 << 16) | (g0 << 8) | b0)
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(src, "jpg", baos))
    val ours = Jpeg.decode(baos.toByteArray).getOrElse(fail("color jpeg rejected"))
    assert(ours.nComp == 3 && ours.width == w && ours.height == h)
    for (ch <- 0 until 3; i <- Seq(0, w * h / 2, w * h - 1)) {
      val want = Seq(r0, g0, b0)(ch)
      val got = ours.planes(ch)(i)
      assert(math.abs(got - want) <= 3, s"channel $ch pixel $i: got $got, want ~$want")
    }
  }

  private def progressiveBytes(src: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    writer.dispose(); ios.close()
    val bytes = baos.toByteArray
    // sanity: the writer really produced SOF2
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not emit a progressive JPEG")
    bytes
  }

  test("progressive (SOF2) grayscale: ImageIO-encoded scans decode within tolerance") {
    // libjpeg's default progressive script: DC-first + refinement, spectral
    // AC bands with EOB runs, successive-approximation AC refinement —
    // every ProgState path, authored by an independent encoder.
    val w = 41; val h = 27
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 6 + y * 11 + (x * y) % 17) % 256)
    val bytes = progressiveBytes(src)
    val ours = Jpeg.decode(bytes).getOrElse(fail("progressive grayscale rejected"))
    assert(ours.width == w && ours.height == h && ours.nComp == 1)
    val theirs = gray(ImageIO.read(new ByteArrayInputStream(bytes)))
    val maxDiff = ours.planes(0).indices.map(i => math.abs(ours.planes(0)(i) - theirs(i))).max
    assert(maxDiff <= 2, s"max per-pixel disagreement on progressive bitstream: $maxDiff")
  }

  test("progressive (SOF2) color with subsampling decodes within tolerance") {
    val w = 48; val h = 32
    val (r0, g0, b0) = (60, 180, 220)
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) src.setRGB(x, y, (r0 << 16) | (g0 << 8) | b0)
    val bytes = progressiveBytes(src)
    val ours = Jpeg.decode(bytes).getOrElse(fail("progressive color rejected"))
    assert(ours.nComp == 3 && ours.width == w && ours.height == h)
    for (ch <- 0 until 3; i <- Seq(0, w * h / 2, w * h - 1)) {
      val want = Seq(r0, g0, b0)(ch)
      assert(math.abs(ours.planes(ch)(i) - want) <= 3,
        s"channel $ch pixel $i: got ${ours.planes(ch)(i)}, want ~$want")
    }
  }

  test("malformed payloads dead-letter: truncation, bad magic, lossless SOF, garbage") {
    val good = Jpeg.syntheticJpeg(5L)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode("not a jpeg at all".getBytes("UTF-8")).isEmpty)
    assert(Jpeg.decode(good.take(2)).isEmpty) // bare SOI
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty) // truncated mid-scan
    // flip SOF0 to SOF3 (lossless) → out of scope, must reject
    val lossless = good.clone()
    val sof = lossless.indices.find(i => (lossless(i) & 0xff) == 0xff && i + 1 < lossless.length
      && (lossless(i + 1) & 0xff) == 0xc0).get
    lossless(sof + 1) = 0xc3.toByte
    assert(Jpeg.decode(lossless).isEmpty)
    // a baseline-tagged stream whose scan header claims progressive bands
    // must also reject (ss/se/ah/al are now parsed, not skipped)
  }

  test("fuzz: random single-byte corruptions never throw (baseline + progressive)") {
    val rnd = new scala.util.Random(42)
    val good = Jpeg.syntheticJpeg(11L)
    for (_ <- 0 until 500) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(mut) // Some or None, never an exception
    }
    val src = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24) src.getRaster.setSample(x, y, 0, (x * 9 + y * 5) % 256)
    val prog = progressiveBytes(src)
    for (_ <- 0 until 300) {
      val mut = prog.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(mut) // ProgState paths must also never throw
    }
    for (_ <- 0 until 100) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      Jpeg.decode(junk)
    }
  }

  test("extractJpeg over a payload column: well-formed rows decode, malformed dead-letter") {
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      val payload = if (id % 5 == 4) "corrupt".getBytes("UTF-8") else Jpeg.syntheticJpeg(id)
      (id, payload)
    }
    val df = rows.toDF("doc_id", "payload")
    val feats = Jpeg.extractJpeg(spark, df, "doc_id", "payload").collect()
    assert(feats.length == 16) // 4 of 20 dead-lettered
    feats.foreach { f =>
      assert(f.width == 9 + f.doc_id % 8 && f.height == 8 + f.doc_id % 5)
      assert(f.mean_luma >= 0 && f.mean_luma <= 255)
    }
  }
}
