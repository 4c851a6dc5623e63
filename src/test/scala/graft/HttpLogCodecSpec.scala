package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HttpLogCodec

class HttpLogCodecSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  private def roundTrip(ts: Long, rid: Long, bs: Long, rtm: Long, st: Int,
                        cache: String, method: String, addr: String, url: String) = {
    val bytes = HttpLogCodec.encode(ts, rid, bs, rtm, st, u(cache), u(method), u(addr), u(url))
    val row = HttpLogCodec.decode(bytes)
    assert(row != null, "decode returned null for valid message")
    assert(row.getLong(0) == ts)
    assert(row.getLong(1) == rid)
    assert(row.getLong(2) == bs)
    assert(row.getLong(3) == rtm)
    assert(row.getInt(4) == st)
    assert(row.getUTF8String(5).toString == cache)
    assert(row.getUTF8String(6).toString == method)
    assert(row.getUTF8String(7).toString == addr)
    assert(row.getUTF8String(8).toString == url)
    bytes
  }

  test("round-trips a typical record") {
    roundTrip(1704067798778L, 42L, 1234L, 56L, 200, "HIT", "GET", "1.2.3.4", "/r/42/u/7")
  }

  test("round-trips empty strings and extremes") {
    roundTrip(0L, 0L, 0L, 0L, 0, "", "", "", "")
    roundTrip(-1L, Long.MaxValue, Long.MinValue, 1L, 65535, "MISS", "POST",
      "2001:db8::1", "/" + "x" * 1000)
  }

  test("round-trips multi-byte UTF-8") {
    roundTrip(1L, 2L, 3L, 4L, 404, "HIT", "GET", "1.2.3.4", "/päth/ünïcödé/日本語")
  }

  test("malformed inputs dead-letter as null") {
    assert(HttpLogCodec.decode(null) == null)
    assert(HttpLogCodec.decode(Array.emptyByteArray) == null)
    assert(HttpLogCodec.decode(Array.fill[Byte](7)(1)) == null)
    assert(HttpLogCodec.decode(Array.fill[Byte](16)(-1)) == null)
    val good = HttpLogCodec.encode(1L, 2L, 3L, 4L, 5, u("a"), u("b"), u("c"), u("d"))
    assert(HttpLogCodec.decode(good.take(good.length - 8)) == null) // truncated body
    val corrupt = good.clone(); corrupt(8) = (corrupt(8) | 3).toByte // root kind → far ptr
    assert(HttpLogCodec.decode(corrupt) == null)
  }

  test("crafted near-Int.MaxValue text pointer dead-letters instead of unsafe read") {
    // list pointer with offset ≈ 2^28 and count ≈ 2^28: start*8 ≈ 2^31 and
    // start+count overflows Int — must be caught by Long-domain bounds checks
    val msg = java.nio.ByteBuffer.allocate(8 + 3 * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    msg.putInt(0); msg.putInt(3)
    msg.putLong(1L << 48) // root struct: 0 data words, 1 pointer word
    val o = (1 << 28) - 1
    val count = 1L << 28
    msg.putLong(1L | ((o.toLong & 0x3fffffffL) << 2) | (2L << 32) | (count << 35))
    msg.putLong(0L)
    assert(HttpLogCodec.decode(msg.array()) == null)
  }

  test("Int-overflowing segment size dead-letters instead of crashing the task (r17 fuzz find)") {
    // Found by the r17 byte-flip fuzzer: a u32 segment size ≈ 2^29 made
    // `seg0Words * 8` wrap Int, so the pre-fix `seg0End > bytes.length`
    // check passed and word() reads ran off the buffer —
    // IndexOutOfBoundsException from inside the codegen'd expression (no
    // catch on that path), i.e. one poison frame could crash an ingest
    // task instead of dead-lettering. Bounds are now computed in Long and
    // decode() is wrapped like the media decoders.
    val good = HttpLogCodec.encode(1L, 2L, 3L, 4L, 5, u("HIT"), u("GET"),
      u("1.2.3.x"), u("/r"))
    val poison = good.clone()
    poison(7) = 0x20.toByte // segment-size MSB: seg0Words = 0x2000000E
    // root struct offset 1000 words: inside the bogus segment, far outside
    // the real 120-byte buffer — the pre-fix data-word read threw here
    val bb = java.nio.ByteBuffer.wrap(poison).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(8, 1000 << 2)
    assert(HttpLogCodec.decode(poison) == null)
    // seeded flip fuzz over the same frame: never throw, null-or-row only
    // (pre-fix this loop throws with near-certainty: ~1 frame per 1k flips
    // lands the segment-size MSB + an out-of-buffer pointer together)
    val rng = new scala.util.Random(171717)
    for (_ <- 0 until 20000) {
      val b = good.clone()
      for (_ <- 0 to rng.nextInt(8)) b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      HttpLogCodec.decode(b)
    }
    assert(HttpLogCodec.decode(good) != null, "valid frame must still decode")
  }

  test("short data section yields defaults (older-schema message)") {
    // struct with 0 data words / 0 pointers: header + root pointer only
    val msg = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    msg.putInt(0); msg.putInt(1); msg.putLong(0L)
    val row = HttpLogCodec.decode(msg.array())
    assert(row != null)
    assert(row.getLong(0) == 0L && row.getInt(4) == 0)
    assert(row.getUTF8String(5).toString == "")
  }

  // ------------------------------------------------------- golden vectors
  //
  // Fixed known-byte messages, hand-derived from the PUBLIC Cap'n Proto wire
  // spec (capnproto.org/encoding.html) for http_log.capnp's HttpLogRecord —
  // NOT produced by our own encoder. Self-roundtrip tests cannot catch a
  // shared encode/decode divergence from the real framing; these can: if
  // the codec's segment table, struct pointer, list pointers, or text
  // padding ever drift from what a real capnp producer emits, the
  // byte-exact comparisons below fail.
  //
  // Layout per the schema (canonical single-segment message):
  //   u32 segmentCount-1 = 0, u32 segment0 size (words)
  //   word 0: root STRUCT pointer: kind=0 (bits 0-1), offset=0 (bits 2-31),
  //           dataWords=5 (bits 32-47), ptrWords=4 (bits 48-63)
  //           → LE bytes 00 00 00 00 05 00 04 00
  //   words 1-4: ts, resourceId, bytesSent, requestTimeMilli (u64 LE)
  //   word 5: responseStatus in bytes 0-1 (u16 LE), rest zero
  //   words 6-9: LIST pointers, one per Text field in declaration order:
  //           kind=1, offset (bits 2-31) = words from END of this pointer
  //           word to first element, elemSize=2 (1-byte, bits 32-34),
  //           count (bits 35-63) = byte length INCLUDING the NUL
  //   then the text blobs, each NUL-terminated and zero-padded to a word.

  private def hexBytes(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  /** (HIT, GET, 1.2.3.4, /) with ts=1 rid=2 bytes=3 rtm=4 status=200.
    * Every text is ≤7 bytes → 1 word each; all four list-pointer offsets
    * are 3 (3 remaining pointer words + 0..3 blobs ahead cancel out).
    */
  private val golden1 = hexBytes("""
    00 00 00 00 0E 00 00 00
    00 00 00 00 05 00 04 00
    01 00 00 00 00 00 00 00
    02 00 00 00 00 00 00 00
    03 00 00 00 00 00 00 00
    04 00 00 00 00 00 00 00
    C8 00 00 00 00 00 00 00
    0D 00 00 00 22 00 00 00
    0D 00 00 00 22 00 00 00
    0D 00 00 00 42 00 00 00
    0D 00 00 00 12 00 00 00
    48 49 54 00 00 00 00 00
    47 45 54 00 00 00 00 00
    31 2E 32 2E 33 2E 34 00
    2F 00 00 00 00 00 00 00""")

  /** Empty texts, u64-max ts, u16-max status, and a 2-word url blob:
    * ts=2^64-1 rid=0 bytes=123456789 rtm=0 status=65535,
    * ("", POST, "", /a/b?q=1). Empty Text still encodes count=1 (the NUL).
    */
  private val golden2 = hexBytes("""
    00 00 00 00 0F 00 00 00
    00 00 00 00 05 00 04 00
    FF FF FF FF FF FF FF FF
    00 00 00 00 00 00 00 00
    15 CD 5B 07 00 00 00 00
    00 00 00 00 00 00 00 00
    FF FF 00 00 00 00 00 00
    0D 00 00 00 0A 00 00 00
    0D 00 00 00 2A 00 00 00
    0D 00 00 00 0A 00 00 00
    0D 00 00 00 4A 00 00 00
    00 00 00 00 00 00 00 00
    50 4F 53 54 00 00 00 00
    00 00 00 00 00 00 00 00
    2F 61 2F 62 3F 71 3D 31
    00 00 00 00 00 00 00 00""")

  /** Multi-byte UTF-8 in a Text field (é = C3 A9): Text carries UTF-8
    * BYTES, so the count is 4 (2F C3 A9 + NUL), not the char count.
    * ts=0x0123456789ABCDEF rid=42 bytes=0 rtm=7 status=404.
    */
  private val golden3 = hexBytes("""
    00 00 00 00 0E 00 00 00
    00 00 00 00 05 00 04 00
    EF CD AB 89 67 45 23 01
    2A 00 00 00 00 00 00 00
    00 00 00 00 00 00 00 00
    07 00 00 00 00 00 00 00
    94 01 00 00 00 00 00 00
    0D 00 00 00 2A 00 00 00
    0D 00 00 00 22 00 00 00
    0D 00 00 00 22 00 00 00
    0D 00 00 00 22 00 00 00
    4D 49 53 53 00 00 00 00
    47 45 54 00 00 00 00 00
    3A 3A 31 00 00 00 00 00
    2F C3 A9 00 00 00 00 00""")

  private def assertDecodes(bytes: Array[Byte], ts: Long, rid: Long, bs: Long,
                            rtm: Long, st: Int, cache: String, method: String,
                            addr: String, url: String): Unit = {
    val row = HttpLogCodec.decode(bytes)
    assert(row != null, "golden vector failed to decode")
    assert(row.getLong(0) == ts && row.getLong(1) == rid &&
      row.getLong(2) == bs && row.getLong(3) == rtm && row.getInt(4) == st)
    assert(row.getUTF8String(5).toString == cache)
    assert(row.getUTF8String(6).toString == method)
    assert(row.getUTF8String(7).toString == addr)
    assert(row.getUTF8String(8).toString == url)
  }

  test("golden wire vector 1: typical record decodes and encodes byte-exactly") {
    assertDecodes(golden1, 1L, 2L, 3L, 4L, 200, "HIT", "GET", "1.2.3.4", "/")
    val enc = HttpLogCodec.encode(1L, 2L, 3L, 4L, 200,
      u("HIT"), u("GET"), u("1.2.3.4"), u("/"))
    assert(enc.toSeq == golden1.toSeq, "encoder diverged from capnp framing")
  }

  test("golden wire vector 2: empty texts, u64/u16 extremes, 2-word blob") {
    assertDecodes(golden2, -1L, 0L, 123456789L, 0L, 65535, "", "POST", "", "/a/b?q=1")
    val enc = HttpLogCodec.encode(-1L, 0L, 123456789L, 0L, 65535,
      u(""), u("POST"), u(""), u("/a/b?q=1"))
    assert(enc.toSeq == golden2.toSeq, "encoder diverged from capnp framing")
  }

  test("golden wire vector 3: multi-byte UTF-8 counts bytes, not chars") {
    assertDecodes(golden3, 0x0123456789ABCDEFL, 42L, 0L, 7L, 404,
      "MISS", "GET", "::1", "/é")
    val enc = HttpLogCodec.encode(0x0123456789ABCDEFL, 42L, 0L, 7L, 404,
      u("MISS"), u("GET"), u("::1"), u("/é"))
    assert(enc.toSeq == golden3.toSeq, "encoder diverged from capnp framing")
  }
}
