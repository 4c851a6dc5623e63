package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-trained language-model quality scoring (SURVEY.md §2 e18).
  *
  * The CCNet recipe (Wenzek et al. 2020, arXiv:1911.00359) — also LLaMA's
  * data pipeline — gates web text on the perplexity of a language model:
  * fluent prose scores low, OCR noise and word salad score high, and the
  * corpus keeps the head (or middle) of the score distribution. The
  * reference implementation uses a pretrained KenLM; with no model artifacts
  * in this environment the LM is trained on the corpus itself (a standard
  * self-perplexity variant — boilerplate and salad still separate cleanly
  * because they sit in the tails of the corpus's own token distribution).
  *
  * Scale shape (100 TB): per-(doc, term) counts aggregate map-side BEFORE
  * the LM join, so the join input is distinct terms per doc, not every
  * occurrence. The LM table is |vocab| rows — Zipf-bounded ≪ corpus — so
  * AQE converts the term join to broadcast at runtime when it fits and
  * skew-splits the hot-term tail otherwise. The 1-row token total rides a
  * broadcast cross join, never a collect.
  *
  * Cache contract (all three gates — [[lmScore]], [[nbQualityScore]],
  * [[bigramScore]]): the RETURNED frame is persisted — it was materialized
  * once so the internal tf/model caches could be released before return —
  * and the caller owns its release (`result.unpersist()`, or the
  * harness-level `clearCache()` Verify/Bench run between queries). Every
  * internal persist is released before return; CacheHygieneSpec asserts the
  * cache manager holds nothing but the returned frame.
  */
object TextLm {

  /** Per-document unigram cross-entropy and perplexity.
    *
    * Output: (idCol, n_tokens, cross_entropy, ppl) — cross_entropy =
    * −Σ tf·ln p(term) / Σ tf with p = corpus unigram MLE (every scored term
    * is in-vocabulary by construction, so no smoothing term is needed),
    * rounded to 4 dp; ppl = exp(cross_entropy) rounded to 2 dp. Token-less
    * documents have no tokens to score and are absent from the output.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    // tf feeds three consumers (the score join, the LM table, the token
    // total) and Catalyst does not CSE across them — unpersisted, the plan
    // re-runs the corpus explode+aggregation per consumer (3 corpus passes,
    // observed in .explain). Persist tf/lm, materialize the doc-sized
    // output, release — the materializedPairs cache-lifecycle discipline.
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lm = tf.groupBy("term").agg(sum("tf").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = lm.agg(sum("cnt").cast("double").as("tot"))
    val ce = -sum(col("tf") * log(col("cnt").cast("double") / col("tot"))) /
      sum(col("tf"))
    val out = tf.join(lm, "term").crossJoin(broadcast(tot))
      .groupBy(idCol)
      .agg(sum("tf").cast("long").as("n_tokens"),
        round(ce, 4).as("cross_entropy"),
        round(exp(ce), 2).as("ppl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    tf.unpersist(blocking = false)
    lm.unpersist(blocking = false)
    out
  }

  /** Model-based quality filter: Multinomial Naive Bayes with Laplace
    * smoothing, the classic fastText-style "reference vs crawl" classifier
    * (GPT-3/LLaMA data pipelines gate crawl text on such a model's score;
    * with no pretrained artifacts in this environment the reference class
    * is `posPred`, trained on the `trainPred` split and scored HELD-OUT on
    * every document, the e21 setup).
    *
    * score(d) = ln(N⁺/N⁻) + Σ_t tf_d(t)·[ln((c⁺(t)+1)/(T⁺+V)) −
    * ln((c⁻(t)+1)/(T⁻+V))] over the train vocabulary V; terms unseen in
    * training smooth to the 1/(T+V) floor on both sides. Output:
    * (idCol, n_tokens, nb_score 4 dp, pred = score > 0).
    *
    * Scale shape: per-(doc, term) counts aggregate map-side before the
    * weight join (distinct terms per doc, not occurrences); the class-count
    * table is |vocab| rows — Zipf-bounded, AQE-broadcast when it fits; the
    * scalar totals (T⁺, T⁻, V, priors) ride one broadcast cross join.
    * Token-less docs are absent from the output, as [[lmScore]].
    */
  def nbQualityScore(docs: DataFrame, idCol: String, textCol: String,
                     posPred: org.apache.spark.sql.Column,
                     trainPred: org.apache.spark.sql.Column): DataFrame = {
    val tf = docs.select(col(idCol), posPred.as("is_pos"), trainPred.as("is_train"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("is_pos"), col("is_train"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cls = tf.filter(col("is_train"))
      .groupBy("term")
      .agg(sum(when(col("is_pos"), col("tf")).otherwise(0L)).as("cpos"),
        sum(when(!col("is_pos"), col("tf")).otherwise(0L)).as("cneg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = cls.agg(sum("cpos").cast("double").as("tpos"),
      sum("cneg").cast("double").as("tneg"),
      count(lit(1)).cast("double").as("v"))
    val pri = docs.filter(trainPred).agg(
      sum(when(posPred, 1L).otherwise(0L)).cast("double").as("npos"),
      count(lit(1)).cast("double").as("n"))
    val w = log((coalesce(col("cpos"), lit(0L)).cast("double") + 1.0) / (col("tpos") + col("v"))) -
      log((coalesce(col("cneg"), lit(0L)).cast("double") + 1.0) / (col("tneg") + col("v")))
    // Laplace-smoothed prior: a single-class training split (npos == 0 or
    // npos == n) would make the raw odds log(npos/(n-npos)) yield ±Inf/NaN
    // and silently poison every score; +1 on both sides keeps it finite.
    val score = log((first(col("npos")) + 1.0) / (first(col("n")) - first(col("npos")) + 1.0)) +
      sum(col("tf") * w)
    val out = tf.join(cls, Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(pri))
      .groupBy(idCol)
      .agg(sum("tf").cast("long").as("n_tokens"),
        round(score, 4).as("nb_score"),
        (score > 0).as("pred_pos"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    tf.unpersist(blocking = false)
    cls.unpersist(blocking = false)
    out
  }

  /** Bigram LM scoring with Stupid Backoff (Brants et al. 2007, the
    * web-scale LM that dropped normalization because at corpus scale a
    * penalized unigram fallback ranks just as well): each document's tokens
    * are scored with p(w|prev) = cnt2(prev,w)/cnt1(prev) when the bigram
    * was seen in TRAINING, else 0.4 · p_uni(w); the first token and OOV
    * words score p_uni = (cnt1 | 0.5)/total (0.5 = deterministic OOV
    * pseudo-count). The LM trains on `trainPred` docs and scores ALL docs —
    * held-out scoring, the CCNet setup (score with an external model), and
    * what makes backoff genuinely fire on unseen bigrams.
    *
    * Output: (idCol, n_tokens, ce_bigram = −mean ln p rounded 4 dp,
    * backoff_rate = share of in-context tokens that backed off, 4 dp).
    *
    * Scale: token positions are one corpus explode; prev-token attaches via
    * a per-doc window (partitioned by doc — no global sort); bigram/unigram
    * tables are vocab²-bounded aggregations joined back by key. The token
    * frame feeds three consumers → persist-materialize-release, as
    * [[lmScore]].
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  trainPred: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val toks = docs.select(col(idCol), trainPred.as("is_train"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .withColumn("prev", lag("term", 1).over(w))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val train = toks.filter(col("is_train"))
    val cnt1 = train.groupBy("term").agg(count(lit(1)).as("cnt1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cnt2 = train.filter(col("prev").isNotNull)
      .groupBy("prev", "term").agg(count(lit(1)).as("cnt2"))
    val tot = cnt1.agg(sum("cnt1").cast("double").as("tot"))
    val ctx = cnt1.select(col("term").as("prev"), col("cnt1").as("ctx_cnt"))
    val pUni = coalesce(col("cnt1").cast("double"), lit(0.5)) / col("tot")
    val p = when(col("prev").isNull, pUni)
      .when(col("cnt2").isNotNull,
        col("cnt2").cast("double") / col("ctx_cnt"))
      .otherwise(lit(0.4) * pUni)
    val backedOff = col("prev").isNotNull && col("cnt2").isNull
    val out = toks
      .join(cnt1, Seq("term"), "left")
      .join(cnt2, Seq("prev", "term"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(-avg(log(p)), 4).as("ce_bigram"),
        round(avg(backedOff.cast("double")), 4).as("backoff_rate"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    toks.unpersist(blocking = false)
    cnt1.unpersist(blocking = false)
    out
  }
}
