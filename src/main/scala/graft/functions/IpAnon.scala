package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** GDPR IP anonymization with the exact semantics of the reference's
  * `anonymize_ip` (`/root/reference/anonymizer/src/lib.rs:253-271`):
  *
  *  - IPv4 `a.b.c.d` → `a.b.c.x`
  *  - IPv6 → canonical (RFC 5952 / Rust `Ipv6Addr::to_string`) form, first 8
  *    `:`-separated tokens, with `:xxxx` appended
  *    (`2001:0db8:85a3:0000:0000:8a2e:0370:7334` → `2001:db8:85a3::8a2e:370:7334:xxxx`)
  *  - anything that parses as neither is returned unchanged
  *
  * Parsing mirrors Rust's `IpAddr::from_str`: strict dotted-quad without
  * leading zeros for v4; for v6 one optional `::`, 1-4 hex digit groups, an
  * optional embedded v4 tail, and no zone ids.
  */
object IpAnon {

  /** UTF8String entry point used by codegen ([[AnonymizeIp]]). */
  def anonymize(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(anonymize(s.toString))

  def anonymize(s: String): String =
    parseV4(s) match {
      case Some(o) => s"${o(0)}.${o(1)}.${o(2)}.x"
      case None =>
        parseV6(s) match {
          case Some(g) => display(g).split(":", -1).take(8).mkString(":") + ":xxxx"
          case None    => s
        }
    }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Strict dotted-quad parse (no leading zeros, 0-255). */
  private[functions] def parseV4(s: String): Option[Array[Int]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val out = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(isDigit)) return None
      if (p.length > 1 && p.charAt(0) == '0') return None
      val v = p.toInt
      if (v > 255) return None
      out(i) = v
      i += 1
    }
    Some(out)
  }

  /** Groups of an address side; embedded v4 allowed only as the final token. */
  private def parseGroups(part: String, allowV4: Boolean): Option[Array[Int]] = {
    if (part.isEmpty) return Some(Array.empty[Int])
    val toks = part.split(":", -1)
    if (toks.exists(_.isEmpty)) return None
    val buf = new scala.collection.mutable.ArrayBuffer[Int](8)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (i == toks.length - 1 && allowV4 && t.contains('.')) {
        parseV4(t) match {
          case Some(o) =>
            buf += ((o(0) << 8) | o(1))
            buf += ((o(2) << 8) | o(3))
          case None => return None
        }
      } else {
        if (t.length > 4 || !t.forall(isHex)) return None
        buf += Integer.parseInt(t, 16)
      }
      i += 1
    }
    Some(buf.toArray)
  }

  /** Parse to 8 16-bit groups, or None. */
  private[functions] def parseV6(s: String): Option[Array[Int]] = {
    if (!s.contains(':') || s.contains('%')) return None
    val i = s.indexOf("::")
    if (i < 0) {
      parseGroups(s, allowV4 = true).filter(_.length == 8)
    } else if (s.indexOf("::", i + 1) >= 0) {
      None // at most one "::" (also rejects ":::")
    } else {
      for {
        h <- parseGroups(s.substring(0, i), allowV4 = false)
        t <- parseGroups(s.substring(i + 2), allowV4 = true)
        if h.length + t.length <= 7
      } yield {
        val res = new Array[Int](8)
        System.arraycopy(h, 0, res, 0, h.length)
        System.arraycopy(t, 0, res, 8 - t.length, t.length)
        res
      }
    }
  }

  /** Canonical text form, matching Rust's `Ipv6Addr` Display: special cases
    * for `::`, `::1` and v4-mapped addresses, then first-longest zero run
    * (length ≥ 2) compressed, lowercase hex without leading zeros.
    */
  private[functions] def display(g: Array[Int]): String = {
    if (g.forall(_ == 0)) return "::"
    if (g.take(7).forall(_ == 0) && g(7) == 1) return "::1"
    if (g.take(5).forall(_ == 0) && g(5) == 0xffff)
      return s"::ffff:${g(6) >> 8}.${g(6) & 0xff}.${g(7) >> 8}.${g(7) & 0xff}"
    var bestStart = -1; var bestLen = 0
    var curStart = -1; var curLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        if (curStart < 0) curStart = i
        curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else { curStart = -1; curLen = 0 }
      i += 1
    }
    if (bestLen < 2) {
      g.map(Integer.toHexString).mkString(":")
    } else {
      val head = g.slice(0, bestStart).map(Integer.toHexString).mkString(":")
      val tail = g.slice(bestStart + bestLen, 8).map(Integer.toHexString).mkString(":")
      head + "::" + tail
    }
  }
}
