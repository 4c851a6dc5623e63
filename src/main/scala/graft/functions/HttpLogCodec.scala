package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-Scala Cap'n Proto codec for the fixed `HttpLogRecord` schema
  * (`/root/reference/http_log.capnp`), implementing the public Cap'n Proto
  * wire format (framing + struct/list pointers) for exactly this struct:
  *
  * {{{
  * struct HttpLogRecord {            // data section: 5 words
  *   timestampEpochMilli @0 :UInt64; //   word 0
  *   resourceId         @1 :UInt64;  //   word 1
  *   bytesSent          @2 :UInt64;  //   word 2
  *   requestTimeMilli   @3 :UInt64;  //   word 3
  *   responseStatus     @4 :UInt16;  //   word 4, bytes 0-1
  *   cacheStatus @5 :Text;           // pointer section: slots 0-3
  *   method      @6 :Text;
  *   remoteAddr  @7 :Text;
  *   url         @8 :Text;
  * }
  * }}}
  *
  * [[decode]] returns null for malformed input — the dead-letter semantics of
  * the reference (`/root/reference/anonymizer/src/lib.rs:112`: unparsable
  * messages are discarded idempotently, never block progress).
  */
object HttpLogCodec {

  val schema: StructType = StructType(Seq(
    StructField("ts_milli", LongType, nullable = false),
    StructField("resource_id", LongType, nullable = false),
    StructField("bytes_sent", LongType, nullable = false),
    StructField("request_time_milli", LongType, nullable = false),
    StructField("response_status", IntegerType, nullable = false),
    StructField("cache_status", StringType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("remote_addr", StringType, nullable = false),
    StructField("url", StringType, nullable = false)))

  private val DataWords = 5
  private val PtrWords  = 4

  private def textWords(s: Array[Byte]): Int = (s.length + 1 + 7) / 8

  /** Encode one record as a complete framed capnp message (single segment). */
  def encode(tsMilli: Long, resourceId: Long, bytesSent: Long, requestTimeMilli: Long,
             responseStatus: Int, cacheStatus: UTF8String, method: UTF8String,
             remoteAddr: UTF8String, url: UTF8String): Array[Byte] = {
    val texts = Array(cacheStatus.getBytes, method.getBytes, remoteAddr.getBytes, url.getBytes)
    val bodyWords = 1 + DataWords + PtrWords + texts.map(textWords).sum
    // framing: u32 segment-count-1 (=0), u32 segment size, then the segment
    val buf = ByteBuffer.allocate(8 + bodyWords * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0)
    buf.putInt(bodyWords)
    // root struct pointer: kind=0, offset=0, data words, pointer words
    buf.putLong((DataWords.toLong << 32) | (PtrWords.toLong << 48))
    buf.putLong(tsMilli)
    buf.putLong(resourceId)
    buf.putLong(bytesSent)
    buf.putLong(requestTimeMilli)
    buf.putLong(responseStatus.toLong & 0xffffL)
    // list pointers: kind=1, element size code 2 (bytes), count = len+1 (NUL)
    var dataOff = 0 // words between end of pointer section and this text blob
    var i = 0
    while (i < 4) {
      val remainingPtrs = PtrWords - 1 - i
      val offsetWords = remainingPtrs + dataOff
      val count = texts(i).length + 1
      buf.putLong(1L | (offsetWords.toLong << 2) | (2L << 32) | (count.toLong << 35))
      dataOff += textWords(texts(i))
      i += 1
    }
    i = 0
    while (i < 4) {
      val t = texts(i)
      buf.put(t)
      var pad = textWords(t) * 8 - t.length
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      i += 1
    }
    buf.array()
  }

  /** Decode a framed message; null on any malformation (dead-letter).
    * Wrapped like the media decoders: the body is throw-free by
    * construction (bounds in Long, see below), and the catch keeps the
    * dead-letter contract even against a future missed check — a poison
    * frame must never crash an ingest task. NonFatal (not Exception) so
    * task cancellation (InterruptedException) is never masked. Known
    * trade-off vs `catch Exception`: NonFatal also swallows non-fatal
    * Errors (AssertionError, NotImplementedError), so a future assert/???
    * inside decodeInner would dead-letter instead of crashing — acceptable
    * here because decodeInner is pure bounds-checked arithmetic with no
    * asserts, and the contract prioritizes never-crash over fail-fast.
    */
  def decode(bytes: Array[Byte]): InternalRow =
    try decodeInner(bytes)
    catch { case scala.util.control.NonFatal(_) => null }

  private def decodeInner(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 16 || bytes.length % 4 != 0) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val segCountM1 = buf.getInt(0)
    if (segCountM1 < 0 || segCountM1 > 511) return null
    val segCount  = segCountM1 + 1
    // segment table: (segCount+1) u32s, padded to 8-byte boundary
    val headerBytes = ((segCount + 1) * 4 + 7) / 8 * 8
    if (bytes.length < headerBytes + 8) return null
    val seg0Words = buf.getInt(4)
    val seg0Start = headerBytes
    // Long arithmetic: a crafted u32 segment size near 2^28 overflows
    // `seg0Words * 8` in Int, turning seg0End negative and sneaking past
    // this check into out-of-bounds word() reads (found by the r17
    // byte-flip fuzzer; same class text() below always guarded against)
    val seg0End   = seg0Start.toLong + seg0Words.toLong * 8L
    if (seg0Words <= 0 || seg0End > bytes.length) return null

    def word(i: Int): Long = buf.getLong(seg0Start + i * 8)

    // root pointer (far pointers unsupported → dead-letter)
    val root = word(0)
    if ((root & 3) != 0) return null
    val structOff = (root >> 2).toInt & 0x3fffffff // signed 30-bit
    val off = (structOff << 2) >> 2
    val dataStart = 1 + off
    val dataWords = ((root >>> 32) & 0xffff).toInt
    val ptrWords  = ((root >>> 48) & 0xffff).toInt
    val ptrStart  = dataStart + dataWords
    if (dataStart < 0 || ptrStart + ptrWords > seg0Words) return null

    def dataLong(w: Int): Long = if (w < dataWords) word(dataStart + w) else 0L
    val status =
      if (dataWords > 4) (word(dataStart + 4) & 0xffffL).toInt else 0

    def text(slot: Int): UTF8String = {
      if (slot >= ptrWords) return UTF8String.EMPTY_UTF8
      val pw = ptrStart + slot
      val p = word(pw)
      if (p == 0L) return UTF8String.EMPTY_UTF8 // null pointer → default
      if ((p & 3) != 1) return null
      val rawOff = ((p >> 2).toInt & 0x3fffffff)
      val o = (rawOff << 2) >> 2
      val elemSize = ((p >>> 32) & 7).toInt
      val count = (p >>> 35) // element count incl. NUL; up to 2^29
      if (elemSize != 2 || count < 1) return null
      // all bounds arithmetic in Long: crafted offsets/counts near 2^29
      // overflow Int and would sneak past the checks into unsafe reads
      val start = (pw.toLong + 1L + o.toLong) * 8L
      if (start < 0L || seg0Start.toLong + start + count > seg0End.toLong) return null
      // count includes the NUL terminator
      UTF8String.fromBytes(bytes, (seg0Start + start).toInt, (count - 1).toInt)
    }

    val cache = text(0); val method = text(1); val addr = text(2); val url = text(3)
    if (cache == null || method == null || addr == null || url == null) return null
    new GenericInternalRow(Array[Any](
      dataLong(0), dataLong(1), dataLong(2), dataLong(3), status,
      cache, method, addr, url))
  }
}
