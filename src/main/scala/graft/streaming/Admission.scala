package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end streaming ADMISSION pipeline a crawl ingest runs per
  * arriving document — the composition of the two admission-control
  * siblings: a rule-based quality gate (the e14 Gopher family, reduced to
  * its cheapest always-on members) followed by the LSH near-dup screen
  * against the indexed corpus ([[NearDupScreen]]). "Is this prose, and
  * have we seen it?" as ONE verdict row per arrival.
  *
  * Streaming legality: every stage is STATELESS — the rule gate is a
  * codegen'd projection, the screen is a banded stream-static equi-join —
  * so per-doc verdicts are independent of micro-batch boundaries and the
  * production deployment is `foreachBatch(admit(batch, corpus, ...))` into
  * an idempotent sink (the AnnServe posture; exactly-once via replay).
  * StreamingSpec proves the per-batch union equals the whole-input batch
  * run, chunking included.
  *
  * Scale: the rule gate never shuffles (and runs FIRST, so junk never
  * reaches the shingle/banding stage); the screen is the c02 candidate
  * discipline — banded equi-join with hot-bucket guards, never all-pairs.
  * `near_dup` is only evaluated for quality survivors; rejected-by-rules
  * docs report `near_dup = false` by definition (documented, mirrored in
  * the g09 oracle).
  *
  * Returns a PERSISTED frame (the Bm25.search hand-back contract): the
  * screen's internal flag cache is released before return.
  */
object Admission {

  /** Quality-rule columns over raw text: token count and an integer-ratio
    * alpha-word floor (alpha_words·10 ≥ n_words·7 — no float threshold, so
    * the SQL mirror is exact). Rules chosen as the cheapest Gopher members
    * that catch machine junk: ≥5 words, ≥70% purely-alphabetic words.
    */
  def ruleGate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_t", expr(s"filter(split(trim($textCol), '\\\\s+'), x -> length(x) > 0)"))
      // a NULL text must be a deterministic REJECTION, not a null verdict
      // that three-values its way through near_dup/admit: 0 words, fail
      .withColumn("n_words", coalesce(size(col("_t")), lit(0)))
      .withColumn("_alpha", expr("size(filter(_t, x -> x rlike '^[a-z]+$'))"))
      .withColumn("quality_pass",
        coalesce(col("n_words") >= 5 && col("_alpha") * 10 >= col("n_words") * 7,
          lit(false)))
      .drop("_t", "_alpha")

  /** Batch / per-micro-batch kernel: verdict per incoming doc.
    * Output: (idCol, n_words, quality_pass, near_dup, admit).
    */
  def admit(incoming: DataFrame, corpus: DataFrame, idCol: String,
            textCol: String, threshold: Double = 0.5): DataFrame = {
    val screenOut = (survivors: DataFrame) =>
      NearDupScreen.screen(survivors, corpus, idCol, textCol, threshold)
    verdicts(incoming, idCol, textCol, screenOut)
  }

  /** [[admit]] against a PREBUILT disk band index
    * ([[NearDupScreen.writeIndex]]) — the production admission posture:
    * the archive is indexed ONCE; each arriving batch pays rules + a
    * banded probe of only the partitions its own band keys hash into
    * (`probeIndex` — PartitionFilters-pruned, NearDupIndexSpec), so
    * per-batch admission cost tracks the BATCH, never the archive.
    * Verdict semantics identical to [[admit]] (probeIndex == screen is
    * NearDupIndexSpec's equivalence assertion).
    *
    * `nBuckets` must match the value the index was WRITTEN with, and it is
    * the flatness knob: a probe reads ≈ (per-band batch keys / nBuckets)
    * of the index per band, floored at one bucket-width per key — so
    * partition pruning only bites while per-band batch keys ≪ nBuckets,
    * and bucket WIDTH (corpus/nBuckets) is what each matched key pays.
    * Size nBuckets to the corpus (the d15/c12 cells-grow-with-corpus
    * rule) and keep admission batches small relative to it — but bucket
    * width must ALSO clear the small-file floor: the §6 `serve` probe
    * measured a 256-bucket index at a 50k-doc corpus (8192 partitions,
    * ~200 rows/file) reading 2.5× SLOWER for a 50-doc batch than the
    * 64-bucket index did for a 1.5k-doc batch — tiny-file open overhead
    * swamped the prune. Both constraints together: nBuckets ≈ corpus
    * band-rows / (a few MB of rows), probed batches ≪ nBuckets keys per
    * band. At the default 64 buckets a 1.5k-doc batch touches every
    * bucket and cost grows with bucket width (1.8× across 10× corpus,
    * §6) — that is the expected large-batch regime, not a defect.
    */
  def admitIndexed(spark: org.apache.spark.sql.SparkSession, incoming: DataFrame,
                   indexPath: String, idCol: String, textCol: String,
                   threshold: Double = 0.5, nBuckets: Int = 64): DataFrame = {
    val screenOut = (survivors: DataFrame) =>
      NearDupScreen.probeIndex(spark, indexPath, survivors, idCol, textCol,
        nBuckets = nBuckets, threshold = threshold)
    verdicts(incoming, idCol, textCol, screenOut)
  }

  /** Shared verdict tail: rules, screen the survivors, one non-null
    * verdict row per arrival.
    */
  private def verdicts(incoming: DataFrame, idCol: String, textCol: String,
                       screen: DataFrame => DataFrame): DataFrame = {
    val gated = ruleGate(incoming, idCol, textCol)
    val survivors = gated.filter(col("quality_pass")).select(col(idCol), col(textCol))
    val screenOut = screen(survivors)
    val flags = screenOut.select(col("doc_id").as(idCol)).distinct()
      .withColumn("_flagged", lit(true))
    val flagged = coalesce(col("_flagged"), lit(false))
    val out = gated
      .join(flags, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("quality_pass"),
        (col("quality_pass") && flagged).as("near_dup"),
        (col("quality_pass") && !flagged).as("admit"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize before the screen's flag cache is released
    screenOut.unpersist(blocking = false)
    out
  }
}
