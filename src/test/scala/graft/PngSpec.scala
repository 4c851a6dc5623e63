package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Png

/** PNG codec certification. PNG is lossless, so every differential here is
  * EXACT equality — no tolerance bands: our encoder's output must decode
  * identically under ImageIO, and ImageIO-authored bitstreams (different
  * filter choices, chunking, ancillary chunks) must decode identically
  * under our decoder.
  */
class PngSpec extends AnyFunSuite with SparkTestBase {

  private def rgb(img: java.awt.image.BufferedImage): (Array[Int], Array[Int], Array[Int]) = {
    val w = img.getWidth; val h = img.getHeight
    val r = new Array[Int](w * h); val g = new Array[Int](w * h); val b = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      r(y * w + x) = (p >> 16) & 0xff; g(y * w + x) = (p >> 8) & 0xff; b(y * w + x) = p & 0xff
    }
    (r, g, b)
  }

  test("all five filter types roundtrip exactly through our encoder+decoder") {
    val w = 23; val h = 11
    def px(i: Int): Int = (i * 7 + (i * i) % 31) % 256
    for (ft <- 0 to 4) {
      val img = Png.decode(Png.encode(w, h, 3, px, filterType = ft))
        .getOrElse(fail(s"filter $ft failed to decode"))
      assert(img.width == w && img.height == h && img.nComp == 3)
      for (i <- 0 until w * h; c <- 0 until 3)
        assert(img.planes(c)(i) == px(i * 3 + c), s"filter $ft pixel $i ch $c")
    }
    // greyscale path
    val g = Png.decode(Png.encode(w, h, 1, px, filterType = 4)).get
    assert(g.nComp == 1)
    for (i <- 0 until w * h) assert(g.planes(0)(i) == px(i))
  }

  test("ImageIO decodes our bitstreams to identical pixels (lossless, no tolerance)") {
    for (docId <- Seq(0L, 7L, 13L, 29L, 101L)) {
      val bytes = Png.syntheticPng(docId)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(theirs != null, s"ImageIO rejected our PNG for doc $docId")
      val ours = Png.decode(bytes).get
      assert(theirs.getWidth == ours.width && theirs.getHeight == ours.height)
      val (r, g, b) = rgb(theirs)
      assert(r.sameElements(ours.planes(0)) && g.sameElements(ours.planes(1))
        && b.sameElements(ours.planes(2)), s"doc $docId pixel mismatch vs ImageIO")
    }
  }

  test("our decoder reads ImageIO-authored bitstreams exactly") {
    val w = 31; val h = 17
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 11 % 256) << 16) | ((y * 23 % 256) << 8) | ((x + y) * 5 % 256))
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(src, "png", baos))
    val ours = Png.decode(baos.toByteArray).getOrElse(fail("ImageIO png rejected"))
    assert(ours.width == w && ours.height == h && ours.nComp == 3)
    val (r, g, b) = rgb(src)
    assert(r.sameElements(ours.planes(0)) && g.sameElements(ours.planes(1))
      && b.sameElements(ours.planes(2)))
  }

  test("Adam7-interlaced bitstreams from ImageIO decode exactly") {
    // ImageIO's PNG writer in progressive mode emits genuine Adam7: seven
    // reduced-image passes, each independently filtered — an independent
    // encoder driving the de-interlacing path end to end.
    for ((w, h) <- Seq((31, 17), (8, 8), (5, 3), (1, 1), (16, 2))) {
      val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        src.setRGB(x, y, ((x * 37 % 256) << 16) | ((y * 53 % 256) << 8) | ((x ^ y) * 29 % 256))
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
      writer.dispose(); ios.close()
      val bytes = baos.toByteArray
      assert((bytes(8 + 4 + 4 + 12) & 0xff) == 1, s"${w}x$h: writer did not interlace")
      val ours = Png.decode(bytes).getOrElse(fail(s"${w}x$h interlaced png rejected"))
      assert(ours.width == w && ours.height == h && ours.nComp == 3)
      val (r, g, b) = rgb(src)
      assert(r.sameElements(ours.planes(0)) && g.sameElements(ours.planes(1))
        && b.sameElements(ours.planes(2)), s"${w}x$h interlaced pixel mismatch")
    }
  }

  test("palette-indexed (type 3) ImageIO bitstreams decode exactly") {
    // opaque 256-entry palette (no alpha → no tRNS, which we dead-letter)
    val rr = Array.tabulate(256)(i => (i * 3 % 256).toByte)
    val gg = Array.tabulate(256)(i => (255 - i).toByte)
    val bb = Array.tabulate(256)(i => (i * 7 % 256).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, rr, gg, bb)
    val w = 29; val h = 13
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 11 + y * 19) % 256)
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(src, "png", baos))
    val bytes = baos.toByteArray
    // sanity: IHDR color type byte (offset 8+8+9) really is 3 (palette)
    assert((bytes(8 + 8 + 9) & 0xff) == 3, "ImageIO did not write a palette PNG")
    val ours = Png.decode(bytes).getOrElse(fail("palette png rejected"))
    assert(ours.width == w && ours.height == h && ours.nComp == 3)
    val (r, g, b) = rgb(src)
    assert(r.sameElements(ours.planes(0)) && g.sameElements(ours.planes(1))
      && b.sameElements(ours.planes(2)), "palette pixel mismatch vs ImageIO")
  }

  test("malformed payloads dead-letter: signature, CRC, truncation, unsupported") {
    val good = Png.syntheticPng(3L)
    assert(Png.decode(Array.emptyByteArray).isEmpty)
    assert(Png.decode("definitely not a png".getBytes("UTF-8")).isEmpty)
    assert(Png.decode(good.take(8)).isEmpty) // signature only
    assert(Png.decode(good.take(good.length - 5)).isEmpty) // truncated (loses IEND)
    // corrupt one IDAT byte → CRC must catch it (silent acceptance = defect)
    val bad = good.clone()
    val idat = (0 until bad.length - 4).find(i =>
      bad(i) == 'I' && bad(i + 1) == 'D' && bad(i + 2) == 'A' && bad(i + 3) == 'T').get
    bad(idat + 6) = (bad(idat + 6) ^ 0x55).toByte
    assert(Png.decode(bad).isEmpty)
    // 16-bit depth flip in IHDR → unsupported (and also a CRC break; both reject)
    val deep = good.clone()
    deep(24) = 16.toByte // IHDR bit-depth field at fixed offset 8+8+8
    assert(Png.decode(deep).isEmpty)
  }

  test("FDICT zlib header dead-letters instead of spinning the inflate loop") {
    // A payload with VALID chunk CRCs whose IDAT stream demands a preset
    // dictionary: Inflater.inflate() returns 0 with needsInput()==false and
    // finished()==false forever, so a loop keyed only on those two predicates
    // hangs the executor. The decoder must treat zero progress as malformed.
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).foreach(b => out.write(b))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = typ.getBytes("US-ASCII"); out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = 4; ihdr(7) = 4 // 4x4
    ihdr(8) = 8; ihdr(9) = 0 // 8-bit grayscale
    chunk("IHDR", ihdr)
    // zlib CMF=0x78, FLG=0x20 (FDICT set; (0x7820 % 31) == 0 so header valid),
    // then the 4-byte DICTID and some deflate-looking junk
    chunk("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8))
    chunk("IEND", Array.emptyByteArray)
    val res = Png.decode(out.toByteArray)
    assert(res.isEmpty, "FDICT stream must dead-letter, not decode or hang")
  }

  test("fuzz: random corruptions never throw") {
    val rnd = new scala.util.Random(7)
    val good = Png.syntheticPng(21L)
    for (_ <- 0 until 500) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Png.decode(mut)
    }
    for (_ <- 0 until 100) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      Png.decode(junk)
    }
  }

  test("extractPng over a payload column: mixed frame dead-letters the corrupt rows") {
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      (id, if (id % 4 == 3) Array[Byte](1, 2, 3) else Png.syntheticPng(id))
    }
    val feats = Png.extractPng(spark, rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect()
    assert(feats.length == 15)
    feats.foreach { f =>
      assert(f.width == 5 + f.doc_id % 6 && f.height == 4 + f.doc_id % 5)
      assert(f.checksum > 0)
    }
  }
}
