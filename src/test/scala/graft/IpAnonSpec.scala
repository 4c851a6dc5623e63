package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IpAnon

class IpAnonSpec extends AnyFunSuite {

  // Reference test vectors (/root/reference/anonymizer/src/lib.rs:278-284)
  test("valid v4 anonymizes last octet") {
    assert(IpAnon.anonymize("1.2.3.4") == "1.2.3.x")
  }
  test("valid v6 canonicalizes then masks") {
    assert(IpAnon.anonymize("2001:0db8:85a3:0000:0000:8a2e:0370:7334")
      == "2001:db8:85a3::8a2e:370:7334:xxxx")
  }
  test("invalid input passes through unchanged") {
    assert(IpAnon.anonymize("a.b.c.d") == "a.b.c.d")
    assert(IpAnon.anonymize("") == "")
    assert(IpAnon.anonymize("/r/1/u/2") == "/r/1/u/2")
    assert(IpAnon.anonymize("1.2.3") == "1.2.3")
    assert(IpAnon.anonymize("1.2.3.256") == "1.2.3.256")
    assert(IpAnon.anonymize("01.2.3.4") == "01.2.3.4") // leading zero → not an IP (Rust parse)
    assert(IpAnon.anonymize("1:::2") == "1:::2")
    assert(IpAnon.anonymize("fe80::1%eth0") == "fe80::1%eth0") // zone ids unsupported
  }
  test("v4 boundary values") {
    assert(IpAnon.anonymize("0.0.0.0") == "0.0.0.x")
    assert(IpAnon.anonymize("255.255.255.255") == "255.255.255.x")
  }
  test("v6 special forms") {
    assert(IpAnon.anonymize("::") == "::" + ":xxxx")
    assert(IpAnon.anonymize("::1") == "::1:xxxx")
    assert(IpAnon.anonymize("::ffff:192.0.2.1") == "::ffff:192.0.2.1:xxxx")
    assert(IpAnon.anonymize("1:2:3:4:5:6:7:8") == "1:2:3:4:5:6:7:8:xxxx")
    // leftmost-longest zero run wins
    assert(IpAnon.anonymize("1:0:0:2:0:0:0:3") == "1:0:0:2::3:xxxx")
    // single zero group is not compressed
    assert(IpAnon.anonymize("1:0:2:3:4:5:6:7") == "1:0:2:3:4:5:6:7:xxxx")
    // uppercase + leading zeros normalize away
    assert(IpAnon.anonymize("2001:DB8::00AB") == "2001:db8::ab:xxxx")
  }
}
