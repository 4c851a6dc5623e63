package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** FLAC decoder/encoder — pure Scala, no codec library (SURVEY.md §2
  * group F). Completes the audio wire-discipline set: f04's RIFF/WAV is
  * raw PCM in a chunked container; FLAC is the compressed LOSSLESS family
  * every speech corpus actually ships (LibriSpeech et al.) — bit-packed
  * headers, CRC-8/CRC-16 integrity gates, UTF-8-coded frame indices,
  * linear predictors (fixed and arbitrary-coefficient LPC), and
  * partitioned Rice-coded residuals. Everything derives from the public
  * FLAC format specification (RFC 9639 / xiph.org): the fLaC marker +
  * STREAMINFO layout, frame-header codes, the four FIXED predictor
  * polynomials, the Rice escape/fold rules, and both CRC polynomials
  * (CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0).
  *
  * Decoder scope: 16-bit mono AND stereo (independent, left/side,
  * right/side, mid/side channel decorrelation — the side channel's extra
  * sample bit included), fixed-blocksize streams; subframe types
  * CONSTANT, VERBATIM, FIXED orders 0-4, and LPC with arbitrary order /
  * precision / shift; Rice partition orders 0-15 with both 4- and 5-bit
  * parameter methods and the verbatim-escape partition. >2 channels,
  * non-16-bit, and variable-blocksize streams are rejected → dead-letter
  * (the PNG/JPEG scope discipline: the supported shapes are REAL, the
  * rest fail loudly, never silently). Both CRCs are verified — a
  * bit-flipped frame must reject, not decode to garbage.
  *
  * Encoder scope (payload synthesis + spec fixtures): CONSTANT for flat
  * blocks, FIXED order 0-2 chosen by residual cost, VERBATIM, and an
  * order-2 LPC mode with explicit quantized coefficients — so synthetic
  * streams exercise every decoder subframe path, exactly like the JPEG
  * encoder's full AC path. FLAC is lossless ⇒ the analytic oracle (f09)
  * pins every decoded sample; roundtrip is exact by construction.
  *
  * Scale shape: per-row `mapPartitions` seam, embarrassingly parallel,
  * no shuffle — identical to the other media decoders.
  */
object Flac {

  private val MaxSamples = 1 << 24

  // ------------------------------------------------------------- bit io

  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // bit position
    def atByte: Boolean = (pos & 7) == 0
    def bytePos: Int = pos >> 3
    def remaining: Int = b.length * 8 - pos
    def bit(): Int = {
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = { // n ≤ 31
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Signed two's-complement n-bit value. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (remaining > 0 && bit() == 0) q += 1
      q
    }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1); n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
    }
    def bits(v: Int, len: Int): Unit = { var i = len - 1; while (i >= 0) { bit((v >> i) & 1); i -= 1 } }
    def bitsLong(v: Long, len: Int): Unit = { var i = len - 1; while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 } }
    def align(): Unit = while (n != 0) bit(0)
    def toBytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  // --------------------------------------------------------------- crcs

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; k += 1 }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; k += 1 }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- decoder

  /** Decoded 16-bit audio; `chans` holds one full-length plane per channel
    * (mono: 1; stereo: L, R after un-decorrelation).
    */
  final case class FlacAudio(sampleRate: Int, nSamples: Int, channels: Int,
                             chans: Array[Array[Int]]) {
    /** Channel 0 (the mono plane / left). */
    def samples: Array[Int] = chans(0)
  }

  def decode(b: Array[Byte]): Option[FlacAudio] =
    try decodeInner(b)
    catch { case _: Exception => None }

  private def decodeInner(b: Array[Byte]): Option[FlacAudio] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    var pos = 4
    // metadata blocks; STREAMINFO must be first
    var sampleRate = 0; var totalSamples = 0L
    var nChannels = 1
    var first = true
    var last = false
    while (!last) {
      if (pos + 4 > b.length) return None
      val hdr = b(pos) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if (pos + 4 + len > b.length) return None
      if (first) {
        if (typ != 0 || len != 34) return None // STREAMINFO
        val o = pos + 4
        sampleRate = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) | ((b(o + 12) & 0xff) >> 4)
        nChannels = ((b(o + 12) >> 1) & 0x07) + 1
        val bps = (((b(o + 12) & 0x01) << 4) | ((b(o + 13) & 0xff) >> 4)) + 1
        if (nChannels < 1 || nChannels > 2 || bps != 16) return None // 16-bit mono/stereo
        totalSamples = ((b(o + 13) & 0x0fL) << 32) | ((b(o + 14) & 0xffL) << 24) |
          ((b(o + 15) & 0xffL) << 16) | ((b(o + 16) & 0xffL) << 8) | (b(o + 17) & 0xffL)
        if (sampleRate <= 0 || totalSamples < 0 || totalSamples > MaxSamples) return None
        first = false
      }
      pos += 4 + len
    }
    if (first) return None
    val n = totalSamples.toInt
    val outs = Array.fill(nChannels)(new Array[Int](n))
    var got = 0
    var frameIdx = 0L
    while (got < n) {
      decodeFrame(b, pos, frameIdx, outs, got, nChannels) match {
        case None => return None
        case Some((nextPos, bs)) =>
          pos = nextPos
          got += bs
          frameIdx += 1
      }
    }
    if (got != n) return None
    Some(FlacAudio(sampleRate, n, nChannels, outs))
  }

  /** Decode one frame starting at byte `pos`; fills outs(ch)[from...);
    * returns (position after the frame, block size), or None on any
    * malformation. Stereo channel assignments (T§frame header): 1 =
    * independent L/R, 8 = left/side, 9 = right/side, 10 = mid/side — the
    * side channel carries one extra sample bit.
    */
  private def decodeFrame(b: Array[Byte], pos: Int, expectFrame: Long,
                          outs: Array[Array[Int]], from: Int,
                          nChannels: Int): Option[(Int, Int)] = {
    val start = pos
    if (pos + 5 >= b.length) return None
    if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xfe) != 0xf8) return None
    if ((b(pos + 1) & 0x01) != 0) return None // variable blocksize: out of scope
    val br = new BitReader(b)
    br.pos = (pos + 2) * 8
    val bsCode = br.bits(4)
    val srCode = br.bits(4)
    val chCode = br.bits(4)
    val ssCode = br.bits(3)
    if (br.bit() != 0) return None // reserved
    // chCode → (frame channels, per-channel bps adjustment, decorrelation)
    val frameChannels = chCode match {
      case 0 => 1
      case 1 => 2           // independent
      case 8 | 9 | 10 => 2  // left/side, right/side, mid/side
      case _ => return None
    }
    if (frameChannels != nChannels) return None
    if (ssCode != 4) return None  // 16-bit
    // UTF-8-coded frame number
    val fn = readUtf8Coded(br)
    if (fn != expectFrame) return None
    val blockSize = bsCode match {
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.bits(8) + 1
      case 7 => br.bits(16) + 1
      case n if n >= 8 && n <= 15 => 256 << (n - 8)
      case _ => return None
    }
    srCode match {
      case 12 => br.bits(8)
      case 13 | 14 => br.bits(16)
      case 15 => return None
      case _ => ()
    }
    // CRC-8 over the header bytes up to (not including) the crc byte
    if (!br.atByte) return None
    val crcPos = br.bytePos
    if (crc8(b, start, crcPos) != (b(crcPos) & 0xff)) return None
    br.pos = (crcPos + 1) * 8
    if (from + blockSize > outs(0).length) return None
    // decode each channel's subframe; the SIDE channel carries bps+1 bits
    val raw = Array.fill(frameChannels)(new Array[Int](blockSize))
    var ch = 0
    while (ch < frameChannels) {
      val extra = chCode match {
        case 8 if ch == 1 => 1  // left/side: side second
        case 9 if ch == 0 => 1  // right/side: side first
        case 10 if ch == 1 => 1 // mid/side: side second
        case _ => 0
      }
      if (!decodeSubframe(br, raw(ch), 0, blockSize, 16 + extra)) return None
      ch += 1
    }
    // un-decorrelate into the output planes
    var i = 0
    while (i < blockSize) {
      chCode match {
        case 0 =>
          outs(0)(from + i) = raw(0)(i)
        case 1 =>
          outs(0)(from + i) = raw(0)(i); outs(1)(from + i) = raw(1)(i)
        case 8 => // (left, side): R = L − S
          outs(0)(from + i) = raw(0)(i)
          outs(1)(from + i) = raw(0)(i) - raw(1)(i)
        case 9 => // (side, right): L = R + S
          outs(0)(from + i) = raw(1)(i) + raw(0)(i)
          outs(1)(from + i) = raw(1)(i)
        case 10 => // (mid, side): restore the bit mid dropped from side's parity
          val mid2 = (raw(0)(i) << 1) | (raw(1)(i) & 1)
          outs(0)(from + i) = (mid2 + raw(1)(i)) >> 1
          outs(1)(from + i) = (mid2 - raw(1)(i)) >> 1
      }
      i += 1
    }
    br.align()
    // CRC-16 over everything from the sync byte to the end of subframe padding
    val dataEnd = br.bytePos
    if (dataEnd + 2 > b.length) return None
    val want = ((b(dataEnd) & 0xff) << 8) | (b(dataEnd + 1) & 0xff)
    if (crc16(b, start, dataEnd) != want) return None
    Some((dataEnd + 2, blockSize))
  }

  private def readUtf8Coded(br: BitReader): Long = {
    val b0 = br.bits(8)
    if ((b0 & 0x80) == 0) return b0
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) return -1
    var v: Long = b0 & (mask - 1)
    var i = 0
    while (i < n) {
      val c = br.bits(8)
      if ((c & 0xc0) != 0x80) return -1
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  private def decodeSubframe(br: BitReader, out: Array[Int], from: Int,
                             blockSize: Int, bps: Int = 16): Boolean = {
    if (br.bit() != 0) return false // padding bit
    val typ = br.bits(6)
    if (br.bit() != 0) return false // wasted bits: out of scope (encoder never emits)
    typ match {
      case 0 => // CONSTANT
        val v = br.sbits(bps)
        java.util.Arrays.fill(out, from, from + blockSize, v)
        true
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(from + i) = br.sbits(bps); i += 1 }
        true
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // FIXED order 0-4
        val order = t & 0x07
        var i = 0
        while (i < order) { out(from + i) = br.sbits(bps); i += 1 }
        if (!decodeResiduals(br, out, from, blockSize, order)) return false
        var k = order
        while (k < blockSize) {
          val p = order match {
            case 0 => 0L
            case 1 => out(from + k - 1).toLong
            case 2 => 2L * out(from + k - 1) - out(from + k - 2)
            case 3 => 3L * out(from + k - 1) - 3L * out(from + k - 2) + out(from + k - 3)
            case 4 => 4L * out(from + k - 1) - 6L * out(from + k - 2) +
              4L * out(from + k - 3) - out(from + k - 4)
          }
          val v = p + out(from + k) // residual was parked in out
          if (v < Int.MinValue || v > Int.MaxValue) return false
          out(from + k) = v.toInt
          k += 1
        }
        true
      case t if (t & 0x20) == 0x20 => // LPC, order = (t & 0x1f) + 1
        val order = (t & 0x1f) + 1
        if (order > blockSize) return false
        var i = 0
        while (i < order) { out(from + i) = br.sbits(bps); i += 1 }
        val precision = br.bits(4) + 1
        if (precision == 16) return false // 1111 is invalid per spec
        val shift = br.sbits(5)
        if (shift < 0) return false
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = br.sbits(precision); i += 1 }
        if (!decodeResiduals(br, out, from, blockSize, order)) return false
        var k = order
        while (k < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(from + k - 1 - j); j += 1 }
          val v = (acc >> shift) + out(from + k)
          if (v < Int.MinValue || v > Int.MaxValue) return false
          out(from + k) = v.toInt
          k += 1
        }
        true
      case _ => false
    }
  }

  /** Rice-coded residual section: parks raw residuals in out[from+order …). */
  private def decodeResiduals(br: BitReader, out: Array[Int], from: Int,
                              blockSize: Int, order: Int): Boolean = {
    val method = br.bits(2)
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0x0f else 0x1f
    val partOrder = br.bits(4)
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) return false
    var part = 0
    var idx = order
    while (part < nParts) {
      val count = (blockSize >> partOrder) - (if (part == 0) order else 0)
      if (count < 0) return false
      val param = br.bits(pBits)
      if (param == escape) {
        val raw = br.bits(5)
        var i = 0
        while (i < count) { out(from + idx) = br.sbits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary()
          if (br.remaining < param) return false
          val lowRaw = br.bitsLong(param)
          val u = (q.toLong << param) | lowRaw
          val e = if ((u & 1L) == 0L) (u >> 1) else -(u >> 1) - 1
          if (e < Int.MinValue || e > Int.MaxValue) return false
          out(from + idx) = e.toInt
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    idx == blockSize
  }

  // ------------------------------------------------------------- encoder

  /** Per-frame subframe strategy for [[encode]]. */
  sealed trait Mode
  case object Auto extends Mode      // CONSTANT if flat, else best FIXED 0-2
  case object Verbatim extends Mode
  /** Order-2 LPC with explicit quantized coefficients (c1·s[i-1]+c2·s[i-2]) >> shift. */
  final case class Lpc2(c1: Int, c2: Int, shift: Int, precision: Int = 12) extends Mode

  /** Encode 16-bit mono samples as a fixed-blocksize FLAC stream. `mode`
    * picks the subframe type per frame index — the spec drives every
    * decoder path through this.
    */
  def encode(samples: Array[Int], sampleRate: Int, blockSize: Int = 256,
             mode: Int => Mode = _ => Auto): Array[Byte] = {
    require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    encodeFrames(Array(samples), samples.length, 1, sampleRate, blockSize,
      _ => 0, mode)
  }

  /** Stereo encode; `chModeFor(frame)` picks the per-frame channel
    * assignment — 1 = independent, 8 = left/side, 9 = right/side,
    * 10 = mid/side — so one stream can (and the spec does) exercise every
    * decorrelation decoder.
    */
  def encodeStereo(left: Array[Int], right: Array[Int], sampleRate: Int,
                   blockSize: Int = 256, chModeFor: Int => Int = _ => 10,
                   mode: Int => Mode = _ => Auto): Array[Byte] = {
    require(left.length == right.length)
    require(left.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    require(right.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    encodeFrames(Array(left, right), left.length, 2, sampleRate, blockSize,
      chModeFor, mode)
  }

  private def encodeFrames(chans: Array[Array[Int]], nSamples: Int,
                           nChannels: Int, sampleRate: Int, blockSize: Int,
                           chModeFor: Int => Int, mode: Int => Mode): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.bits(blockSize, 16); si.bits(blockSize, 16) // min/max block size
    si.bits(0, 24); si.bits(0, 24)                 // min/max frame size: unknown
    si.bits(sampleRate, 20)
    si.bits(nChannels - 1, 3)
    si.bits(15, 5) // bps - 1
    si.bitsLong(nSamples.toLong, 36)
    var i = 0
    while (i < 16) { si.bits(0, 8); i += 1 } // md5 unknown
    val siB = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length) // last, STREAMINFO, len 34
    out.write(siB)

    var frameIdx = 0L
    var off = 0
    while (off < nSamples) {
      val bs = math.min(blockSize, nSamples - off)
      val chCode = if (nChannels == 1) 0 else {
        val c = chModeFor(frameIdx.toInt)
        require(c == 1 || c == 8 || c == 9 || c == 10, s"bad stereo chMode $c")
        c
      }
      // derive the frame's channel signals from L/R per the assignment
      val sig: Array[Array[Int]] =
        if (nChannels == 1) chans
        else chCode match {
          case 1 => chans
          case 8 => Array(chans(0),
            Array.tabulate(nSamples)(i => chans(0)(i) - chans(1)(i)))
          case 9 => Array(
            Array.tabulate(nSamples)(i => chans(0)(i) - chans(1)(i)), chans(1))
          case 10 => Array(
            Array.tabulate(nSamples)(i => (chans(0)(i) + chans(1)(i)) >> 1),
            Array.tabulate(nSamples)(i => chans(0)(i) - chans(1)(i)))
        }
      out.write(encodeFrame(sig, off, bs, frameIdx, chCode, mode(frameIdx.toInt)))
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(chans: Array[Array[Int]], off: Int, bs: Int,
                          frameIdx: Long, chCode: Int, mode: Mode): Array[Byte] = {
    val w = new BitWriter
    w.bits(0xff, 8); w.bits(0xf8, 8) // sync + fixed blocksize
    w.bits(7, 4)  // block size: 16-bit at end
    w.bits(0, 4)  // sample rate: from STREAMINFO
    w.bits(chCode, 4)
    w.bits(4, 3)  // 16 bps
    w.bit(0)
    writeUtf8Coded(w, frameIdx)
    w.bits(bs - 1, 16)
    w.align()
    val headerNoCrc = w.toBytes // BitWriter is consumed; rebuild below
    val body = new BitWriter
    headerNoCrc.foreach(b0 => body.bits(b0 & 0xff, 8))
    body.bits(crc8(headerNoCrc, 0, headerNoCrc.length), 8)
    chans.indices.foreach { ch =>
      val extra = chCode match {
        case 8 if ch == 1 => 1
        case 9 if ch == 0 => 1
        case 10 if ch == 1 => 1
        case _ => 0
      }
      writeSubframe(body, chans(ch), off, bs, mode, 16 + extra)
    }
    body.align()
    val noCrc16 = body.toBytes
    val whole = new java.io.ByteArrayOutputStream()
    whole.write(noCrc16)
    val c16 = crc16(noCrc16, 0, noCrc16.length)
    whole.write((c16 >> 8) & 0xff); whole.write(c16 & 0xff)
    whole.toByteArray
  }

  private def writeUtf8Coded(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.bits(v.toInt, 8); return }
    // k total bytes encode 5k+1 value bits (k=2 -> 11, ..., k=6 -> 31)
    var k = 2
    while (k < 6 && v >= (1L << (5 * k + 1))) k += 1
    val lead = ((0xff << (8 - k)) & 0xff) |
      ((v >> (6 * (k - 1))) & ((1 << (7 - k)) - 1)).toInt
    w.bits(lead, 8)
    var i = k - 2
    while (i >= 0) { w.bits((0x80 | ((v >> (6 * i)) & 0x3f)).toInt, 8); i -= 1 }
  }

  private def writeSubframe(w: BitWriter, s: Array[Int], off: Int, bs: Int,
                            mode: Mode, bps: Int = 16): Unit = {
    val mask = (1 << bps) - 1
    def residualsFixed(order: Int): Array[Int] = {
      val r = new Array[Int](bs - order)
      var k = order
      while (k < bs) {
        val p = order match {
          case 0 => 0L
          case 1 => s(off + k - 1).toLong
          case 2 => 2L * s(off + k - 1) - s(off + k - 2)
        }
        r(k - order) = (s(off + k) - p).toInt
        k += 1
      }
      r
    }
    val flat = (1 until bs).forall(i => s(off + i) == s(off))
    mode match {
      case _ if flat =>
        w.bit(0); w.bits(0, 6); w.bit(0)
        w.bits(s(off) & mask, bps)
      case Verbatim =>
        w.bit(0); w.bits(1, 6); w.bit(0)
        var i = 0
        while (i < bs) { w.bits(s(off + i) & mask, bps); i += 1 }
      case Lpc2(c1, c2, shift, precision) if bs > 2 =>
        w.bit(0); w.bits(0x20 | (2 - 1), 6); w.bit(0)
        w.bits(s(off) & mask, bps); w.bits(s(off + 1) & mask, bps)
        w.bits(precision - 1, 4)
        w.bits(shift & 0x1f, 5)
        w.bits(c1 & ((1 << precision) - 1), precision)
        w.bits(c2 & ((1 << precision) - 1), precision)
        val r = new Array[Int](bs - 2)
        var k = 2
        while (k < bs) {
          val p = (c1.toLong * s(off + k - 1) + c2.toLong * s(off + k - 2)) >> shift
          r(k - 2) = (s(off + k) - p).toInt
          k += 1
        }
        writeResiduals(w, r, bs, 2)
      case _ =>
        // pick the FIXED order (0-2) with the smallest |residual| sum
        val cands = (0 to math.min(2, bs - 1)).map(o => o -> residualsFixed(o))
        val (order, r) = cands.minBy { case (_, rr) => rr.map(v => math.abs(v.toLong)).sum }
        w.bit(0); w.bits(0x08 | order, 6); w.bit(0)
        var i = 0
        while (i < order) { w.bits(s(off + i) & mask, bps); i += 1 }
        writeResiduals(w, r, bs, order)
    }
  }

  private def writeResiduals(w: BitWriter, r: Array[Int], bs: Int, order: Int): Unit = {
    // single partition, 4-bit rice parameter chosen from the mean magnitude
    w.bits(0, 2) // method: 4-bit rice
    w.bits(0, 4) // partition order 0
    val mean = if (r.isEmpty) 0.0 else r.map(v => math.abs(v.toDouble)).sum / r.length
    var param = 0
    while (param < 14 && (1L << param) < mean * 2) param += 1
    w.bits(param, 4)
    r.foreach { e =>
      val u = if (e >= 0) e.toLong << 1 else (-e.toLong << 1) - 1
      val q = (u >> param).toInt
      var i = 0
      while (i < q) { w.bit(0); i += 1 }
      w.bit(1)
      w.bitsLong(u & ((1L << param) - 1), param)
    }
  }

  // ------------------------------------------------- payloads + features

  /** Deterministic synthetic FLAC: closed-form 16-bit samples; the frame
    * strategy cycles CONSTANT-favoring flats, FIXED, VERBATIM, and LPC so
    * all four subframe decoders are live in the registered query.
    */
  def syntheticFlac(docId: Long): Array[Byte] = {
    val n = (600 + (docId % 4) * 200).toInt
    val samples = Array.tabulate(n) { i =>
      if ((i / 128 + docId) % 4 == 0) ((docId * 31) % 1024).toInt - 512 // flat stretch
      else (((docId * 7 + i.toLong * 13) % 2048) - 1024).toInt
    }
    encode(samples, sampleRate = 16000, blockSize = 128, mode = {
      case f if f % 4 == 1 => Verbatim
      case f if f % 4 == 2 => Lpc2(c1 = 3 << 8, c2 = -(1 << 9), shift = 10) // (1.5, -0.5)
      case _ => Auto
    })
  }

  /** Decoded features; mean/extrema/checksum pin every sample. */
  final case class FlacFeatures(doc_id: Long, sample_rate: Int, n_samples: Int,
                                mean_amp: Double, min_s: Int, max_s: Int,
                                checksum: Long)

  def decodeFlac(docId: Long, b: Array[Byte]): Option[FlacFeatures] =
    decode(b).filter(_.channels == 1).map { a =>
      var sum = 0L; var ck = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < a.samples.length) {
        val s = a.samples(i)
        sum += s; ck += s.toLong * (i + 1)
        if (s < mn) mn = s
        if (s > mx) mx = s
        i += 1
      }
      FlacFeatures(docId, a.sampleRate, a.nSamples,
        sum.toDouble / math.max(1, a.nSamples), mn, mx, ck)
    }

  /** Real decode over a payload column; malformed rows dead-letter. */
  def extractFlac(spark: SparkSession, df: DataFrame,
                  idCol: String, payloadCol: String): Dataset[FlacFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[Multimodal.MMRecord]
      .mapPartitions(_.flatMap(r => decodeFlac(r.doc_id, r.payload)))
  }
}
