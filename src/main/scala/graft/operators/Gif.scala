package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** GIF decoder — pure Scala (SURVEY.md §2 group F). With JPEG covering the
  * entropy-coded lossy family and PNG the filtered-DEFLATE lossless family,
  * GIF covers the remaining classic image wire shape: a palette-indexed,
  * LZW-compressed, multi-frame (animated) container. Everything here
  * derives from the public GIF89a specification: the 6-byte signature, the
  * little-endian logical screen descriptor, global/local color tables sized
  * 2^(k+1), extension blocks walked by their length-prefixed sub-block
  * chains, the 4-pass row interlace, and GIF's LZW variant (LSB-first
  * packed codes, clear/EOI codes, dictionary capped at 4096 with deferred
  * clear).
  *
  * GIF has NO checksum, so the malformed-input gate is structural: bad
  * signature/dimensions, frame rects outside the screen, truncation
  * anywhere (header, color table, sub-block chain, bitstream ending before
  * EOI), LZW codes beyond the dictionary, roots in the clear/EOI gap, more
  * pixels than the frame rect, and palette indices past the table each
  * dead-letter (`None`), never decode to garbage. The analytic oracle
  * (f10) pins full per-pixel variation through the palette indirection —
  * a mis-grown dictionary, a mis-ordered interlace pass, or an off-by-one
  * sub-block boundary shifts the checksummed stats.
  *
  * Frame composition semantics (disposal methods, transparency compositing
  * onto the canvas) are deliberately out of scope: frames decode as
  * independent indexed images over their own rects, which is what
  * frame-level feature extraction consumes. Graphic-control extensions are
  * parsed past, not applied.
  *
  * Scale shape: per-row `mapPartitions` seam, embarrassingly parallel, no
  * shuffle — identical to the other media decoders.
  */
object Gif {

  private val MaxDim = 1 << 14

  // ------------------------------------------------------------- decoder

  /** One decoded frame: palette-resolved channels + raw indices, row-major
    * width*height within the frame's own rect.
    */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
                            interlaced: Boolean, r: Array[Int], g: Array[Int],
                            b: Array[Int], indices: Array[Int])

  final case class GifImage(width: Int, height: Int, frames: Vector[GifFrame])

  /** Decode a GIF payload. None on ANY malformed/unsupported input. */
  def decode(bytes: Array[Byte]): Option[GifImage] =
    try decodeInner(bytes)
    catch { case _: Exception => None }

  private def decodeInner(bts: Array[Byte]): Option[GifImage] = {
    val n = bts.length
    if (n < 13) return None
    val sig = new String(bts, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(o: Int): Int = bts(o) & 0xff
    def u16(o: Int): Int = u8(o) | (u8(o + 1) << 8) // GIF is little-endian
    val sw = u16(6); val sh = u16(8)
    if (sw <= 0 || sh <= 0 || sw > MaxDim || sh > MaxDim) return None
    val lsdPacked = u8(10)
    var pos = 13
    var gct: Array[Int] = null
    if ((lsdPacked & 0x80) != 0) {
      val size = 2 << (lsdPacked & 7)
      if (pos + size * 3 > n) return None
      gct = readColorTable(bts, pos, size)
      pos += size * 3
    }
    val frames = Vector.newBuilder[GifFrame]
    var nFrames = 0
    var sawTrailer = false
    while (!sawTrailer) {
      if (pos >= n) return None // truncated: trailer never arrived
      val blockType = u8(pos); pos += 1
      blockType match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension: label byte + length-prefixed sub-blocks.
          // GCE/comment/application/plain-text all walk identically; frame
          // composition is out of scope so none is interpreted.
          if (pos >= n) return None
          pos += 1
          pos = skipSubBlocks(bts, pos)
          if (pos < 0) return None
        case 0x2c => // image descriptor
          if (pos + 9 > n) return None
          val left = u16(pos); val top = u16(pos + 2)
          val w = u16(pos + 4); val h = u16(pos + 6)
          val p = u8(pos + 8); pos += 9
          if (w <= 0 || h <= 0 || left + w > sw || top + h > sh) return None
          val interlaced = (p & 0x40) != 0
          var ct = gct
          if ((p & 0x80) != 0) { // local color table overrides
            val size = 2 << (p & 7)
            if (pos + size * 3 > n) return None
            ct = readColorTable(bts, pos, size); pos += size * 3
          }
          if (ct == null) return None // no color table in scope at all
          if (pos >= n) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val dataEnd = skipSubBlocks(bts, pos)
          if (dataEnd < 0) return None
          val data = collectSubBlocks(bts, pos)
          pos = dataEnd
          val idx = lzwDecode(data, minCode, w * h) match {
            case Some(a) => a
            case None => return None
          }
          val lin =
            if (!interlaced) idx
            else { // 4-pass interlace: rows arrive 0,8.. 4,8.. 2,4.. 1,2..
              val outp = new Array[Int](w * h)
              var srcRow = 0
              Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
                var y = start
                while (y < h) {
                  System.arraycopy(idx, srcRow * w, outp, y * w, w)
                  srcRow += 1; y += step
                }
              }
              outp
            }
          val np = w * h
          val rr = new Array[Int](np); val gg = new Array[Int](np)
          val bb = new Array[Int](np)
          var i = 0
          while (i < np) {
            val c = lin(i)
            if (c >= ct.length) return None // index past the palette
            val v = ct(c)
            rr(i) = (v >> 16) & 0xff; gg(i) = (v >> 8) & 0xff; bb(i) = v & 0xff
            i += 1
          }
          frames += GifFrame(left, top, w, h, interlaced, rr, gg, bb, lin)
          nFrames += 1
        case _ => return None
      }
    }
    if (nFrames == 0) return None
    Some(GifImage(sw, sh, frames.result()))
  }

  private def readColorTable(b: Array[Byte], off: Int, entries: Int): Array[Int] =
    Array.tabulate(entries) { j =>
      ((b(off + j * 3) & 0xff) << 16) | ((b(off + j * 3 + 1) & 0xff) << 8) |
        (b(off + j * 3 + 2) & 0xff)
    }

  /** Walk a length-prefixed sub-block chain past its 0 terminator; -1 on
    * truncation.
    */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var pos = start
    while (true) {
      if (pos >= b.length) return -1
      val len = b(pos) & 0xff
      pos += 1
      if (len == 0) return pos
      if (pos + len > b.length) return -1
      pos += len
    }
    -1 // unreachable
  }

  private def collectSubBlocks(b: Array[Byte], start: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = start
    var done = false
    while (!done) {
      val len = b(pos) & 0xff
      pos += 1
      if (len == 0) done = true
      else { out.write(b, pos, len); pos += len }
    }
    out.toByteArray
  }

  /** GIF-variant LZW decode: codes packed LSB-first, initial width
    * minCode+1, clear = 2^minCode, EOI = clear+1, dictionary grows one
    * entry per code (KwKwK handled), width bumps when the dictionary
    * reaches 2^width (max 12), deferred clear honored (at 4096 entries
    * decoding continues without adding until a clear code). Exactly
    * `expected` pixels must be produced before EOI.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    val out = new Array[Int](expected)
    var outN = 0
    val totalBits = data.length.toLong * 8
    var bitPos = 0L
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0; var i = 0
      while (i < width) {
        val bp = bitPos + i
        if (((data((bp >> 3).toInt) >> (bp & 7).toInt) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    val stack = new Array[Int](4097)
    var prev = -1
    while (true) {
      val code = read()
      if (code < 0) return None // bits ran out before EOI
      if (code == clear) {
        dictSize = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == expected) Some(out) else None
      } else {
        if (code > dictSize) return None
        val kwk = code == dictSize // KwKwK: prev's string + its first char
        if (kwk && prev < 0) return None
        var cur = if (kwk) prev else code
        var sp = 0
        while (cur >= eoi + 1) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        if (cur >= clear) return None // root inside the clear/EOI gap
        val first = cur
        stack(sp) = cur; sp += 1
        while (sp > 0) {
          sp -= 1
          if (outN >= expected) return None
          out(outN) = stack(sp); outN += 1
        }
        if (kwk) {
          if (outN >= expected) return None
          out(outN) = first; outN += 1
        }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first; dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    None // unreachable
  }

  // ------------------------------------------------------------- encoder

  /** One frame to encode: indices row-major over the frame rect. */
  final case class FrameSpec(left: Int, top: Int, width: Int, height: Int,
                             interlaced: Boolean, indices: Array[Int])

  /** GIF89a writer for fixtures and differentials: global color table
    * (padded to the next 2^(k+1)), an (uninterpreted) graphic-control
    * extension per frame so the extension-walk path is always live, real
    * LZW compression with dictionary growth and a mid-stream clear when the
    * table fills, interlaced row order when asked. Written from the spec,
    * independent of the decoder, so roundtrips certify both directions.
    */
  def encode(screenW: Int, screenH: Int, palette: Array[Int],
             frames: Seq[FrameSpec], withGce: Boolean = true): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1 // table size 2^bits >= len
    if (bits < 1) bits = 1
    val tableLen = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(screenW); w16(screenH)
    out.write(0x80 | (bits - 1)) // GCT present, size field = bits-1
    out.write(0) // background color index
    out.write(0) // aspect ratio
    var j = 0
    while (j < tableLen) {
      val v = if (j < palette.length) palette(j) else 0
      out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff)
      j += 1
    }
    val minCode = math.max(2, bits)
    frames.foreach { f =>
      require(f.indices.length == f.width * f.height)
      if (withGce) { // graphic control: delay 4 cs, no transparency
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0); w16(4); out.write(0); out.write(0)
      }
      out.write(0x2c)
      w16(f.left); w16(f.top); w16(f.width); w16(f.height)
      out.write(if (f.interlaced) 0x40 else 0) // no LCT
      out.write(minCode)
      val seq =
        if (!f.interlaced) f.indices
        else {
          val s = new Array[Int](f.indices.length)
          var dst = 0
          Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
            var y = start
            while (y < f.height) {
              System.arraycopy(f.indices, y * f.width, s, dst, f.width)
              dst += f.width; y += step
            }
          }
          s
        }
      val lzw = lzwEncode(seq, minCode)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.write(len); out.write(lzw, off, len)
        off += len
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF-variant LZW compressor. The write width of every code is the width
    * the DECODER will read it with — and the decoder learns each dictionary
    * entry one code later than the encoder assigns it (it can only infer
    * entry k after reading the code that follows), so the encoder simulates
    * the decoder's (dict, width, has-prev) state verbatim inside `emit`
    * rather than deriving widths from its own table. Getting this one-step
    * lag wrong is the classic LZW interop bug and it only bites exactly at
    * the 2^w boundaries; the roundtrip + ImageIO differentials pin it.
    */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val base = eoi + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var width = minCode + 1 // decoder-visible state, updated by emit()
    var decDict = base
    var decHasPrev = false
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8 }
      if (code == clear) { width = minCode + 1; decDict = base; decHasPrev = false }
      else if (code != eoi) {
        if (decHasPrev && decDict < 4096) {
          decDict += 1
          if (decDict == (1 << width) && width < 12) width += 1
        }
        decHasPrev = true
      }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var nextCode = base
    emit(clear)
    if (indices.isEmpty) {
      emit(eoi)
      if (accBits > 0) out.write((acc & 0xff).toInt)
      return out.toByteArray
    }
    var prev = indices(0)
    var i = 1
    while (i < indices.length) {
      val c = indices(i)
      val key = (prev.toLong << 12) | c
      val hit = table.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        if (nextCode < 4096) { table.put(key, nextCode); nextCode += 1 }
        else { // table full: restart (the decoder resets on the clear)
          emit(clear)
          table.clear(); nextCode = base
        }
        prev = c
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------- payloads + features

  /** Deterministic synthetic animated GIF: 1–3 frames, per-frame dims and
    * every palette index closed-form in (doc_id, frame, pixel), a 64-entry
    * palette closed-form in (doc_id, entry), interlace alternating per
    * frame so both row orders are live in the registered query. Frames are
    * large enough (up to 24×18) that the LZW dictionary crosses two width
    * bumps.
    */
  def syntheticGif(docId: Long): Array[Byte] = {
    val nFrames = (1 + docId % 3).toInt
    val palette = Array.tabulate(64) { j =>
      ((((docId * 3 + j * 17) % 256).toInt) << 16) |
        ((((docId * 5 + j * 23) % 256).toInt) << 8) |
        (((docId * 7 + j * 29) % 256).toInt)
    }
    val frames = (0 until nFrames).map { f =>
      val w = (16 + (docId + f) % 9).toInt
      val h = (12 + (docId + f) % 7).toInt
      FrameSpec(0, 0, w, h, interlaced = (docId + f) % 2 == 0,
        Array.tabulate(w * h)(i => ((docId * 13 + f * 7 + i.toLong * 5) % 64).toInt))
    }
    encode(24, 18, palette, frames)
  }

  /** Per-frame channel means + full checksum pin every palette lookup of
    * every pixel (same convention as [[Png.PngFeatures]]).
    */
  final case class GifFeatures(doc_id: Long, frame_idx: Int, width: Int,
                               height: Int, n_pixels: Int, mean_r: Double,
                               mean_g: Double, mean_b: Double, checksum: Long)

  def decodeGif(docId: Long, b: Array[Byte]): Seq[GifFeatures] =
    decode(b).toSeq.flatMap { img =>
      img.frames.zipWithIndex.map { case (f, fi) =>
        val np = f.width * f.height
        def mean(p: Array[Int]): Double = {
          var s = 0L; var i = 0
          while (i < np) { s += p(i); i += 1 }
          s.toDouble / np
        }
        var ck = 0L; var i = 0
        while (i < np) { ck += f.r(i).toLong + f.g(i) + f.b(i); i += 1 }
        GifFeatures(docId, fi, f.width, f.height, np,
          mean(f.r), mean(f.g), mean(f.b), ck)
      }
    }

  /** Real decode over a payload column; malformed rows dead-letter. */
  def extractGif(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[GifFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[Multimodal.MMRecord]
      .mapPartitions(_.flatMap(r => decodeGif(r.doc_id, r.payload)))
  }
}
