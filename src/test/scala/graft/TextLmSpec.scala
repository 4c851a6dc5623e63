package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextLm

/** Semantic properties of the CCNet-style LM quality gate (e18): the DuckDB
  * hash-compare proves the arithmetic; these prove the scores MEAN what the
  * filter needs them to mean.
  */
class TextLmSpec extends AnyFunSuite with SparkTestBase {

  test("word salad scores higher cross-entropy than formulaic text") {
    import spark.implicits._
    // 8 docs of repeated common phrasing + 1 doc of hapax salad: under the
    // corpus-trained unigram LM the salad's tokens are all rare, so its
    // cross-entropy must dominate every fluent doc's
    val fluent = (1L to 8L).map(i => (i, "the cat sat on the mat and the dog sat too"))
    val salad = Seq((9L, "zyx quv plorth wibble snark grumph"))
    val scored = operators.TextLm.lmScore(
      (fluent ++ salad).toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    val worstFluent = (1L to 8L).map(scored).max
    assert(scored(9L) > worstFluent + 1.0,
      s"salad ce=${scored(9L)} should clear fluent max=$worstFluent by >1 nat")
  }

  test("bigram backoff fires only on unseen bigrams and penalizes them") {
    import spark.implicits._
    // train docs (id != 0 mod 10) repeat "the cat sat"; held-out doc 10
    // contains a bigram never seen in training ("cat flew") — it MUST back
    // off; doc 20 is pure training phrasing — it must NOT
    val docs = ((1L to 9L).map(i => (i, "the cat sat")) ++
      Seq((10L, "the cat flew"), (20L, "the cat sat"))).toDF("doc_id", "text")
    val scored = operators.TextLm.bigramScore(docs, "doc_id", "text",
      col("doc_id") % 10 =!= 0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("backoff_rate"), r.getAs[Double]("ce_bigram"))).toMap
    assert(scored(20L)._1 == 0.0)
    assert(scored(10L)._1 > 0.0, "unseen bigram must back off")
    // the OOV+backoff doc must score strictly worse than the fluent one
    assert(scored(10L)._2 > scored(20L)._2 + 1.0)
  }

  test("cross-entropy is bounded by ln(total tokens) and ppl is exp(ce)") {
    val rows = operators.TextLm.lmScore(
      Tables.documents(spark, sfDir), "doc_id", "text").collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val bound = math.log(totalTokens.toDouble)
    rows.foreach { r =>
      val ce = r.getAs[Double]("cross_entropy")
      // MLE unigram probability is ≥ 1/total, so ce ≤ ln(total); > 0 since
      // no term can cover the whole corpus from one doc at these sizes
      assert(ce > 0 && ce <= bound + 1e-9, s"ce=$ce outside (0, $bound]")
      assert(math.abs(r.getAs[Double]("ppl") - math.exp(ce)) < 0.5 + math.exp(ce) * 1e-3)
    }
  }

  test("NB quality classifier separates the reference class held-out") {
    val docs = Tables.documents(spark, sfDir)
    // the e23 label: stopword density ≥ 0.06 — a label with genuine token
    // evidence (this corpus's lang tag has none; its texts are i.i.d. soup)
    val sw = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id")
      .agg(avg(when(col("term").isin("the", "a"), 1.0).otherwise(0.0)).as("sw"))
    val labeled = docs.join(sw, "doc_id")
    val scored = TextLm.nbQualityScore(labeled, "doc_id", "text",
        col("sw") >= 0.06, col("doc_id") % 10 =!= 0)
      .join(labeled.select(col("doc_id"), (col("sw") >= 0.06).as("truth")), "doc_id")
    // accuracy on the HELD-OUT docs must beat both constant classifiers —
    // the model is learning token evidence, not the prior
    val held = scored.filter(col("doc_id") % 10 === 0)
      .select(avg((col("pred_pos") === col("truth")).cast("double")).as("acc"),
        avg(col("truth").cast("double")).as("base"))
      .first()
    val acc = held.getAs[Double]("acc")
    val base = held.getAs[Double]("base")
    assert(acc > math.max(base, 1 - base),
      s"held-out accuracy $acc does not beat the majority baseline ${math.max(base, 1 - base)}")
    // every scored doc carries a finite score and the threshold semantics hold
    val bad = scored.filter(col("nb_score").isNull ||
      (col("pred_pos") =!= (col("nb_score") > 0))).count()
    // pred uses the UNROUNDED score; only a doc whose score rounds across 0
    // could disagree with the 4-dp column — none in this corpus
    assert(bad == 0)
  }

  test("NB quality survives a single-class training split (finite scores)") {
    // An all-positive (or all-negative) train split used to make the raw
    // prior log(npos/(n-npos)) yield ±Inf and NaN-poison every score; the
    // Laplace-smoothed prior keeps everything finite.
    val docs = Tables.documents(spark, sfDir).limit(50)
    for (allPos <- Seq(true, false)) {
      val scored = TextLm.nbQualityScore(docs, "doc_id", "text",
        lit(allPos), col("doc_id") % 10 =!= 0)
      val rows = scored.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val s = r.getAs[Double]("nb_score")
        assert(!s.isNaN && !s.isInfinite, s"allPos=$allPos produced $s")
      }
    }
  }
}
