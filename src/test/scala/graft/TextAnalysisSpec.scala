package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHash

class TextAnalysisSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("nfc composes decomposed marks, is idempotent, and is identity on ASCII") {
    val decomposed = u("cafe\u0301 n\u0303")
    val composed = TextHash.nfc(decomposed)
    assert(composed.toString == "caf\u00e9 \u00f1")
    assert(composed.numChars() == decomposed.numChars() - 2)
    assert(TextHash.nfc(composed) eq composed) // fixed point, no realloc
    val ascii = u("plain ascii text")
    assert(TextHash.nfc(ascii) eq ascii) // fast path returns the same object
  }

  test("langId identifies stopword profiles and CJK") {
    assert(TextHash.langId(u("the cat sat on the mat and it is warm")).toString == "en")
    assert(TextHash.langId(u("der hund ist nicht mit der katze und den andern")).toString == "de")
    assert(TextHash.langId(u("le chat est dans la maison et les chiens pour que")).toString == "fr")
    assert(TextHash.langId(u("el perro y los gatos no es como las casas por lo")).toString == "es")
    assert(TextHash.langId(u("今天天气很好我们去公园散步吧")).toString == "zh")
    assert(TextHash.langId(u("")).toString == "und")
    assert(TextHash.langId(u("qwzx vbnm ghjk")).toString == "und")
  }

  test("winnow is deterministic and content-sensitive") {
    val a = TextHash.winnow(u("the quick brown fox jumps over the lazy dog"), 8, 4)
    val b = TextHash.winnow(u("the quick brown fox jumps over the lazy dog"), 8, 4)
    val c = TextHash.winnow(u("a completely different document body here"), 8, 4)
    assert(a.toLongArray().sameElements(b.toLongArray()))
    assert(!a.toLongArray().sameElements(c.toLongArray()))
    assert(a.numElements() > 0)
    // whitespace/case normalization folds in
    val d = TextHash.winnow(u("THE   quick\tbrown fox JUMPS over the lazy dog"), 8, 4)
    assert(a.toLongArray().sameElements(d.toLongArray()))
  }

  test("winnow guarantees a match inside every window (coverage property)") {
    val s = "some reasonably long text used to check the winnowing window coverage property"
    val fps = TextHash.winnow(u(s), 8, 4).toLongArray().toSet
    // any fingerprint of a (k+w-1)-char substring set must intersect — here
    // simply: fingerprints are a subset of all k-gram hashes
    val n = TextHash.normalize(s)
    val all = (0 to n.length - 8).map(i => TextHash.hashString(n, i, i + 8, 43L)).toSet
    assert(fps.subsetOf(all))
    assert(fps.size < all.size, "winnowing should sample, not keep everything")
  }

  test("shingles and minhash respond to similarity") {
    val t1 = u("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val t2 = u("alpha beta gamma delta epsilon zeta eta theta iota kappa extra")
    val t3 = u("one two three four five six seven eight nine ten")
    def jac(a: UTF8String, b: UTF8String): Double = {
      val sa = TextHash.wordShingles(a, 3).toLongArray().toSet
      val sb = TextHash.wordShingles(b, 3).toLongArray().toSet
      (sa & sb).size.toDouble / (sa | sb).size
    }
    assert(jac(t1, t1) == 1.0)
    assert(jac(t1, t2) > 0.7)
    assert(jac(t1, t3) == 0.0)
    // minhash signature agreement tracks jaccard
    val s1 = TextHash.minhashSig(t1, 3, 128).toLongArray()
    val s2 = TextHash.minhashSig(t2, 3, 128).toLongArray()
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 128.0
    assert(math.abs(agree - jac(t1, t2)) < 0.25)
  }

  test("simhash of similar docs has low hamming distance") {
    val h1 = TextHash.simhash64(u("the quick brown fox jumps over the lazy dog again and again"))
    val h2 = TextHash.simhash64(u("the quick brown fox jumps over the lazy dog again and again more"))
    val h3 = TextHash.simhash64(u("entirely unrelated content about database query optimization"))
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 8)
    assert(java.lang.Long.bitCount(h1 ^ h3) > 10)
  }
}
