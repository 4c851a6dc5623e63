package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PNG decoder — pure Scala over the JDK's zlib (SURVEY.md §2 group F).
  * With JPEG ([[Jpeg]]) covering the entropy-coded lossy family, PNG covers
  * the compressed LOSSLESS family: chunked container (length/type/CRC),
  * zlib-deflated pixel stream, and per-scanline predictive filters
  * (None/Sub/Up/Average/Paeth) that must be sequentially un-applied.
  * Everything here derives from the public PNG specification (RFC 2083 /
  * ISO 15948): the 8-byte signature, IHDR/IDAT/IEND chunk layout, the CRC-32
  * over type+data, and the Paeth predictor. DEFLATE itself is
  * `java.util.zip.Inflater` — part of the JDK, not a third-party codec.
  *
  * Scope: 8-bit greyscale (color type 0), truecolor RGB (type 2), and
  * palette-indexed (type 3, PLTE lookup with out-of-range indices
  * rejected), non-interlaced AND Adam7-interlaced (each of the seven passes
  * unfiltered as an independent reduced image, then scattered — certified
  * against ImageIO-authored interlaced bitstreams). Alpha color types
  * (4, 6) and non-8-bit depths are rejected → dead-letter (same
  * poisoned-message discipline as every other decoder here). Unknown
  * ancillary chunks are skipped by walking the length fields, exactly as a
  * real reader must.
  *
  * Because PNG is lossless, the analytic oracle (f08) pins FULL per-pixel
  * variation — unlike JPEG's block-constant contract, every pixel of the
  * synthetic payloads is an independent closed-form function of
  * (doc_id, index), so a single mis-filtered byte anywhere in the chain
  * (wrong predictor, off-by-one row offset, CRC-accepted corruption)
  * shifts the checksummed stats.
  *
  * Scale shape: per-row `mapPartitions` seam, embarrassingly parallel, no
  * shuffle — identical to the other media decoders.
  */
object Png {

  private val MaxDim = 1 << 14
  private val Signature = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  // ------------------------------------------------------------- decoder

  /** Decoded image: `nComp` 1 (grey) or 3 (RGB), planes row-major w*h. */
  final case class PngImage(width: Int, height: Int, nComp: Int,
                            planes: Array[Array[Int]])

  /** Decode a PNG payload. None on ANY malformed/unsupported input. */
  def decode(b: Array[Byte]): Option[PngImage] =
    try decodeInner(b)
    catch { case _: Exception => None }

  private def decodeInner(b: Array[Byte]): Option[PngImage] = {
    if (b.length < 8) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Signature(i)) return None; i += 1 }
    var pos = 8
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var width = 0; var height = 0; var nComp = 0
    var sampPerPx = 0          // bytes per pixel in the coded stream
    var palette: Array[Byte] = null
    var interlaced = false
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= b.length && !seenIend) {
      val len = u32(pos)
      if (len > Int.MaxValue || pos + 12 + len > b.length) return None
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      // CRC-32 over chunk type + data (the spec's integrity gate; a reader
      // that skips it accepts silently-corrupt pixel data)
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32(dataOff + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          width = u32(dataOff).toInt; height = u32(dataOff + 4).toInt
          val bitDepth = b(dataOff + 8) & 0xff
          val colorType = b(dataOff + 9) & 0xff
          val compression = b(dataOff + 10) & 0xff
          val filterMethod = b(dataOff + 11) & 0xff
          val interlace = b(dataOff + 12) & 0xff
          interlaced = interlace == 1
          if (width <= 0 || height <= 0 || width > MaxDim || height > MaxDim) return None
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace > 1) return None
          nComp = colorType match {
            case 0 => 1 // greyscale
            case 2 => 3 // truecolor
            case 3 => 3 // palette-indexed: 1 coded byte/px, 3 output planes
            case _ => return None // alpha out of scope
          }
          sampPerPx = if (colorType == 3) 1 else nComp
          if (colorType == 3) palette = Array.emptyByteArray // PLTE must follow
        case "PLTE" =>
          if (!seenIhdr || palette == null) return None // only valid for type 3 here
          if (len == 0 || len % 3 != 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len.toInt)
        case "tRNS" =>
          return None // palette alpha: out of scope, dead-letter (never drop it silently)
        case "IDAT" =>
          if (!seenIhdr) return None
          if (palette != null && palette.isEmpty) return None // PLTE must precede IDAT
          idat.write(b, dataOff, len.toInt)
        case "IEND" => seenIend = true
        case _ => // ancillary (tEXt, pHYs, ...) — skip via the length field
          if (!seenIhdr) return None
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr || !seenIend) return None

    // zlib inflate of the concatenated IDAT stream; an interlaced stream
    // carries the SUM of the seven Adam7 passes' filtered scanlines
    val stride = width * sampPerPx
    val bpp = sampPerPx
    val passes: Seq[(Int, Int, Int, Int)] = // (x0, y0, dx, dy) per Adam7 pass
      if (interlaced) Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      else Seq((0, 0, 1, 1))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx), math.max(0, (height - y0 + dy - 1) / dy))
    }
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + pw.toLong * bpp)
    }.sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // Any zero-progress iteration is malformed: needsInput (truncated),
      // needsDictionary (FDICT set — unsupported, and would otherwise spin
      // forever since needsInput stays false), or premature stream end.
      if (n == 0) return None
      off += n
    }
    val complete = off == raw.length && (inf.finished() || inf.inflate(new Array[Byte](1)) == 0)
    inf.end()
    if (!complete) return None

    // un-filter each pass as an independent reduced image (sequential in y
    // by construction — each row's predictor reads the fully reconstructed
    // row above WITHIN the pass), then scatter onto the full-image grid
    val px = new Array[Int](stride * height)
    var rawOff = 0
    for (pass <- passes) {
      val (x0, y0, dx, dy) = pass
      val (pw, ph) = passDims(pass)
      if (pw > 0 && ph > 0) {
        val pStride = pw * bpp
        val sub = new Array[Int](pStride * ph)
        var y = 0
        while (y < ph) {
          val ft = raw(rawOff + y * (pStride + 1)) & 0xff
          val rowIn = rawOff + y * (pStride + 1) + 1
          val rowOut = y * pStride
          var x = 0
          while (x < pStride) {
            val cur = raw(rowIn + x) & 0xff
            val left = if (x >= bpp) sub(rowOut + x - bpp) else 0
            val up = if (y > 0) sub(rowOut - pStride + x) else 0
            val ul = if (y > 0 && x >= bpp) sub(rowOut - pStride + x - bpp) else 0
            val v = ft match {
              case 0 => cur
              case 1 => cur + left
              case 2 => cur + up
              case 3 => cur + ((left + up) >> 1)
              case 4 => // Paeth predictor (RFC 2083 §6.6)
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
              case _ => return None
            }
            sub(rowOut + x) = v & 0xff
            x += 1
          }
          y += 1
        }
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            val tx = x0 + i * dx
            val ty = y0 + j * dy
            var c = 0
            while (c < bpp) {
              px((ty * width + tx) * bpp + c) = sub((j * pw + i) * bpp + c)
              c += 1
            }
            i += 1
          }
          j += 1
        }
        rawOff += ph * (1 + pStride)
      }
    }
    if (palette == null) {
      val planes = Array.tabulate(nComp) { c =>
        Array.tabulate(width * height)(i => px(i * sampPerPx + c))
      }
      Some(PngImage(width, height, nComp, planes))
    } else {
      // palette lookup; an index past the palette is malformed, not black
      val nEntries = palette.length / 3
      val planes = Array.tabulate(3)(_ => new Array[Int](width * height))
      var i = 0
      val n = width * height
      while (i < n) {
        val idx = px(i)
        if (idx >= nEntries) return None
        planes(0)(i) = palette(idx * 3) & 0xff
        planes(1)(i) = palette(idx * 3 + 1) & 0xff
        planes(2)(i) = palette(idx * 3 + 2) & 0xff
        i += 1
      }
      Some(PngImage(width, height, 3, planes))
    }
  }

  // ------------------------------------------------------------- encoder

  /** Minimal conforming PNG writer (signature, IHDR, one IDAT, IEND, real
    * CRCs, zlib via `Deflater`) for payload synthesis and spec fixtures.
    * `filterType` applies one fixed filter to every row — the decoder must
    * reverse whichever it's handed, and the spec drives all five.
    */
  def encode(w: Int, h: Int, nComp: Int, px: Int => Int,
             filterType: Int = 4): Array[Byte] = {
    require(nComp == 1 || nComp == 3)
    require(filterType >= 0 && filterType <= 4)
    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    def put32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = ((v >> 24) & 0xff).toByte; a(o + 1) = ((v >> 16) & 0xff).toByte
      a(o + 2) = ((v >> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (nComp == 1) 0 else 2).toByte
    chunk("IHDR", ihdr)

    val stride = w * nComp
    val bpp = nComp
    val raw = new Array[Byte]((stride + 1) * h)
    val plane = Array.tabulate(stride * h)(i => px(i) & 0xff)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = plane(y * stride + x)
        val left = if (x >= bpp) plane(y * stride + x - bpp) else 0
        val up = if (y > 0) plane((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= bpp) plane((y - 1) * stride + x - bpp) else 0
        val f = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      zout.write(buf, 0, n)
    }
    def_.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------- payloads + features

  /** Deterministic synthetic RGB PNG: every channel byte is an independent
    * closed-form function of (doc_id, pixel index); the filter type cycles
    * through all five per doc so each predictor is live in the registered
    * query, not just in specs.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = (5 + docId % 6).toInt
    val h = (4 + docId % 5).toInt
    encode(w, h, 3, i => ((docId * 37 + i.toLong * 11) % 256).toInt,
      filterType = (docId % 5).toInt)
  }

  /** Per-channel means + full-plane checksum pin every byte of every pixel. */
  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
                               n_pixels: Int, mean_r: Double, mean_g: Double,
                               mean_b: Double, checksum: Long)

  def decodePng(docId: Long, b: Array[Byte]): Option[PngFeatures] =
    decode(b).collect {
      case PngImage(w, h, 3, planes) =>
        val n = w * h
        def mean(p: Array[Int]): Double = { var s = 0L; var i = 0; while (i < n) { s += p(i); i += 1 }; s.toDouble / n }
        var ck = 0L
        var i = 0
        while (i < n) { ck += planes(0)(i).toLong + planes(1)(i) + planes(2)(i); i += 1 }
        PngFeatures(docId, w, h, n, mean(planes(0)), mean(planes(1)), mean(planes(2)), ck)
    }

  /** Real decode over a payload column; malformed rows dead-letter. */
  def extractPng(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[PngFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[Multimodal.MMRecord]
      .mapPartitions(_.flatMap(r => decodePng(r.doc_id, r.payload)))
  }
}
