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

  test("short data section yields defaults (older-schema message)") {
    // struct with 0 data words / 0 pointers: header + root pointer only
    val msg = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    msg.putInt(0); msg.putInt(1); msg.putLong(0L)
    val row = HttpLogCodec.decode(msg.array())
    assert(row != null)
    assert(row.getLong(0) == 0L && row.getInt(4) == 0)
    assert(row.getUTF8String(5).toString == "")
  }
}
