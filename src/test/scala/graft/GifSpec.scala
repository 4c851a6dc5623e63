package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gif

/** GIF codec certification: own-encoder roundtrips (both directions of the
  * LZW width-lag convention), ImageIO differentials BOTH ways (our wire
  * read by the JDK reader; JDK-written wire read by us), malformed-input
  * fuzz (no CRC in GIF — every gate is structural), and the synthetic
  * payload's closed-form features (the f10 oracle's engine-side mirror).
  */
class GifSpec extends AnyFunSuite with SparkTestBase {

  private def randomPalette(rng: scala.util.Random, n: Int): Array[Int] =
    Array.fill(n)(rng.nextInt(1 << 24))

  test("roundtrip: random frames, palettes, interlace, dict-growth sizes") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val nColors = Seq(3, 4, 7, 16, 64, 200, 256)(trial % 7)
      val palette = randomPalette(rng, nColors)
      val nFrames = 1 + rng.nextInt(3)
      val frames = (0 until nFrames).map { _ =>
        val w = 3 + rng.nextInt(40)
        val h = 2 + rng.nextInt(30)
        Gif.FrameSpec(rng.nextInt(4), rng.nextInt(4), w, h,
          interlaced = rng.nextBoolean(),
          Array.fill(w * h)(rng.nextInt(nColors)))
      }
      val sw = frames.map(f => f.left + f.width).max
      val sh = frames.map(f => f.top + f.height).max
      val img = Gif.decode(Gif.encode(sw, sh, palette, frames))
        .getOrElse(fail(s"trial $trial: decode returned None"))
      assert(img.width == sw && img.height == sh)
      assert(img.frames.length == nFrames)
      img.frames.zip(frames).foreach { case (got, want) =>
        assert((got.width, got.height, got.left, got.top) ==
          ((want.width, want.height, want.left, want.top)))
        assert(got.indices.sameElements(want.indices), s"trial $trial: indices differ")
        val np = want.width * want.height
        var i = 0
        while (i < np) {
          val v = palette(want.indices(i))
          assert(got.r(i) == ((v >> 16) & 0xff) && got.g(i) == ((v >> 8) & 0xff)
            && got.b(i) == (v & 0xff))
          i += 1
        }
      }
    }
  }

  test("roundtrip survives a full dictionary (mid-stream clear + deferred add)") {
    val rng = new scala.util.Random(7)
    // 256-color noise fills the 4096-entry table well before 30k pixels:
    // the encoder must emit a mid-stream clear and the decoder must track it
    val w = 200; val h = 150
    val palette = randomPalette(rng, 256)
    val idx = Array.fill(w * h)(rng.nextInt(256))
    val img = Gif.decode(Gif.encode(w, h, palette,
      Seq(Gif.FrameSpec(0, 0, w, h, interlaced = false, idx))))
      .getOrElse(fail("decode returned None"))
    assert(img.frames.head.indices.sameElements(idx))
  }

  test("roundtrip: worst-case KwKwK runs (aaaa...) decode exactly") {
    // long single-color runs hit the code-not-yet-in-dictionary case on
    // nearly every emitted code
    val palette = Array(0x102030, 0xa0b0c0, 0x415263, 0x748596)
    val idx = Array.fill(500)(2)
    val img = Gif.decode(Gif.encode(25, 20, palette,
      Seq(Gif.FrameSpec(0, 0, 25, 20, interlaced = false, idx))))
      .getOrElse(fail("decode returned None"))
    assert(img.frames.head.indices.sameElements(idx))
  }

  test("ImageIO reads our wire: per-pixel RGB equality on every frame") {
    val rng = new scala.util.Random(11)
    val palette = randomPalette(rng, 64)
    val frames = (0 until 3).map { f =>
      val w = 17 + f; val h = 13 + f
      Gif.FrameSpec(0, 0, w, h, interlaced = f % 2 == 0,
        Array.fill(w * h)(rng.nextInt(64)))
    }
    val bytes = Gif.encode(20, 16, palette, frames)
    val rd = ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
    assert(rd.getNumImages(true) == 3)
    frames.zipWithIndex.foreach { case (want, fi) =>
      val bi = rd.read(fi)
      assert(bi.getWidth == want.width && bi.getHeight == want.height)
      var y = 0
      while (y < want.height) {
        var x = 0
        while (x < want.width) {
          val exp = palette(want.indices(y * want.width + x)) & 0xffffff
          assert((bi.getRGB(x, y) & 0xffffff) == exp,
            s"frame $fi pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
    rd.dispose()
  }

  test("we read ImageIO's wire: per-pixel RGB equality") {
    // lossless path through the JDK writer: an indexed image with an
    // explicit IndexColorModel (an RGB input would be quantized)
    val rng = new scala.util.Random(13)
    val n = 16
    val rs = Array.fill(n)(rng.nextInt(256).toByte)
    val gs = Array.fill(n)(rng.nextInt(256).toByte)
    val bs = Array.fill(n)(rng.nextInt(256).toByte)
    val icm = new java.awt.image.IndexColorModel(4, n, rs, gs, bs)
    val w = 31; val h = 23
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val idx = Array.fill(w * h)(rng.nextInt(n))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        bi.getRaster.setSample(x, y, 0, idx(y * w + x)); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "gif", bos))
    val img = Gif.decode(bos.toByteArray)
      .getOrElse(fail("decode of ImageIO-written GIF returned None"))
    assert(img.frames.length == 1)
    val f = img.frames.head
    assert(f.width == w && f.height == h)
    var i = 0
    while (i < w * h) {
      assert(f.r(i) == (rs(idx(i)) & 0xff) && f.g(i) == (gs(idx(i)) & 0xff)
        && f.b(i) == (bs(idx(i)) & 0xff), s"pixel $i")
      i += 1
    }
  }

  test("malformed inputs dead-letter: fuzz never throws, never accepts junk stats") {
    val rng = new scala.util.Random(99)
    val good = Gif.syntheticGif(17L)
    assert(Gif.decode(good).isDefined)
    // truncations at every length
    var l = 0
    while (l < good.length) {
      Gif.decode(java.util.Arrays.copyOf(good, l)) // must not throw/hang
      l += 1
    }
    assert(Gif.decode(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty,
      "dropping the trailer must dead-letter")
    // random single-byte flips: either rejected or still a structurally
    // valid GIF (GIF has no CRC — a flip inside pixel data legitimately
    // decodes to different pixels; what must never happen is a throw)
    for (_ <- 0 until 500) {
      val b = good.clone()
      b(rng.nextInt(b.length)) = (rng.nextInt(256) - 128).toByte
      Gif.decode(b)
    }
    // random garbage
    for (_ <- 0 until 200) {
      val b = Array.fill(rng.nextInt(300))((rng.nextInt(256) - 128).toByte)
      assert(Gif.decode(b).isEmpty || b.length >= 13)
    }
    assert(Gif.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
  }

  test("synthetic features match their closed form (engine-side oracle mirror)") {
    for (id <- Seq(0L, 1L, 2L, 5L, 17L, 123L, 100040L)) {
      val feats = Gif.decodeGif(id, Gif.syntheticGif(id))
      assert(feats.length == (1 + id % 3).toInt)
      feats.foreach { ft =>
        val f = ft.frame_idx
        val w = (16 + (id + f) % 9).toInt
        val h = (12 + (id + f) % 7).toInt
        assert(ft.width == w && ft.height == h && ft.n_pixels == w * h)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < w * h) {
          val idx = (id * 13 + f * 7 + i.toLong * 5) % 64
          sr += (id * 3 + idx * 17) % 256
          sg += (id * 5 + idx * 23) % 256
          sb += (id * 7 + idx * 29) % 256
          i += 1
        }
        assert(ft.checksum == sr + sg + sb, s"id=$id frame=$f")
        assert(math.abs(ft.mean_r - sr.toDouble / (w * h)) < 1e-9)
        assert(math.abs(ft.mean_g - sg.toDouble / (w * h)) < 1e-9)
        assert(math.abs(ft.mean_b - sb.toDouble / (w * h)) < 1e-9)
      }
    }
  }

  test("interlaced frames below 5 rows round-trip exactly (a geometry the JDK reader garbles)") {
    // The four interlace passes degenerate when h < 5 (pass 2 is empty at
    // h <= 4, pass 3 at h <= 2) and the JDK's GIF reader mis-places rows
    // there: its OWN writer->reader roundtrip of an interlaced image comes
    // back with row maps 0,0 / 0,0,1 / 0,3,1,0 at h=2/3/4 (measured,
    // round 16), so the usual ImageIO differential is unusable at these
    // heights — the committed differentials above all use h >= 13. This
    // pin certifies the geometry through our own encoder->decoder
    // round-trip instead: the wire is written in spec pass order
    // ((0,8),(4,8),(2,4),(1,2)) and must read back as the exact identity.
    val rng = new scala.util.Random(31)
    for (h <- 1 to 6; w <- Seq(1, 3, 8, 17)) {
      val n = 16
      val palette = randomPalette(rng, n)
      val idx = Array.fill(w * h)(rng.nextInt(n))
      val bytes = Gif.encode(w, h, palette,
        Seq(Gif.FrameSpec(0, 0, w, h, interlaced = true, idx)))
      val img = Gif.decode(bytes).getOrElse(fail(s"${w}x$h interlaced rejected"))
      assert(img.frames.length == 1)
      val f = img.frames.head
      assert(f.width == w && f.height == h && f.interlaced)
      for (i <- 0 until w * h) {
        val exp = palette(idx(i))
        assert(f.r(i) == ((exp >> 16) & 0xff) && f.g(i) == ((exp >> 8) & 0xff)
          && f.b(i) == (exp & 0xff), s"${w}x$h pixel $i")
      }
    }
  }

  test("extractGif dead-letters poisoned rows, decodes the rest") {
    import spark.implicits._
    val rows = Seq(
      (1L, Gif.syntheticGif(1L)),
      (2L, Array[Byte](1, 2, 3)),
      (3L, Gif.syntheticGif(3L)))
    val out = Gif.extractGif(spark, rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect()
    assert(out.map(_.doc_id).toSet == Set(1L, 3L))
    assert(out.count(_.doc_id == 1L) == 2) // 1 + 1%3 = 2 frames
    assert(out.count(_.doc_id == 3L) == 1) // 1 + 3%3 = 1 frame
  }
}
