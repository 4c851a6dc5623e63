package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixing

class MixingSpec extends AnyFunSuite with SparkTestBase {

  // 100 docs per domain, exactly 10 whitespace tokens each → 1000 tokens of
  // domain mass, so rates are easy to reason about
  private lazy val docs = {
    import spark.implicits._
    (for {
      d <- Seq("a", "b", "c")
      i <- 0 until 100
    } yield (d match {
      case "a" => i.toLong
      case "b" => 1000L + i
      case "c" => 2000L + i
    }, Seq.fill(10)("tok").mkString(" "), d)).toDF("doc_id", "text", "domain")
  }

  test("unlisted domains are excluded, saturated domains keep everything") {
    val out = Mixing.domainMix(docs, "doc_id", "text", "domain",
      Map("a" -> 0.5, "b" -> 5.0), budgetTokens = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!out.exists(_._2 == "c"), "domain without a share must be excluded")
    // b's quota (5.0 × 1000) far exceeds its 1000-token mass → rate 1, all kept
    assert(out.count(_._2 == "b") == 100)
    assert(out.forall(_._3 == 10L))
  }

  test("keep-rate tracks the requested token share deterministically") {
    def run() = Mixing.domainMix(docs, "doc_id", "text", "domain",
      Map("a" -> 0.5), budgetTokens = 1000L)
      .collect().map(_.getLong(0)).toSet
    val kept = run()
    // rate = 0.5·1000/1000 = 0.5: the multiplicative-hash coin keeps roughly
    // half of a's 100 docs (exact set is fixed by the hash, not random)
    assert(kept.size > 30 && kept.size < 70, s"kept ${kept.size}/100 at rate 0.5")
    assert(run() == kept, "sampling must be a pure function of ids")
  }
}
