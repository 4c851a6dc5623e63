package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Stream-vs-static near-duplicate screen: incoming documents are checked
  * against an indexed static corpus — the admission-control step of a
  * training-data pipeline (reject a crawled page that near-duplicates what
  * the corpus already holds) run continuously instead of as a batch job.
  *
  * The screen plan is fully STATELESS — signature + band explode on the
  * incoming side, an equi-join against the static banded index, and an exact
  * sorted-merge Jaccard verify — so it is legal in a Structured Streaming
  * micro-batch with zero state store (same posture as
  * [[graft.operators.Similarity.assignStateless]]): at 100 TB of stream
  * history there is nothing to checkpoint but the source offsets. The same
  * function IS the batch path; `screen` (batch) merely dedupes band-collision
  * repeats with `distinct()` — a streaming caller dedupes downstream (e.g.
  * `dropDuplicatesWithinWatermark`, proven in StreamingSpec) or tolerates
  * at-least-once flags.
  */
object NearDupScreen {

  /** Banded index + shingle sets of the static corpus; build once, reuse for
    * every micro-batch. (corpus_id, band, key, csh).
    */
  def corpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, n: Int = 128, bands: Int = 32): DataFrame =
    corpus.select(
      col(idCol).as("corpus_id"),
      word_shingles(col(textCol), k).as("csh"),
      lsh_band_keys(minhash_sig(col(textCol), k, n), bands).as("keys"))
      .select(col("corpus_id"), col("csh"),
        posexplode(col("keys")).as(Seq("band", "key")))

  /** Stateless screen of `incoming` (streaming or batch) against a
    * [[corpusIndex]]: one row per (doc, corpus doc, band) collision that
    * verifies at `threshold` exact Jaccard. Self-matches (same id) are kept —
    * an incoming exact re-crawl of corpus doc X flags against X.
    */
  def screenRaw(incoming: DataFrame, index: DataFrame, idCol: String,
                textCol: String, k: Int = 3, n: Int = 128, bands: Int = 32,
                threshold: Double = 0.5): DataFrame = {
    val banded = incoming.select(
      col(idCol).as("doc_id"),
      word_shingles(col(textCol), k).as("sh"),
      lsh_band_keys(minhash_sig(col(textCol), k, n), bands).as("keys"))
      .select(col("doc_id"), col("sh"),
        posexplode(col("keys")).as(Seq("band", "key")))
    banded.join(index, Seq("band", "key"))
      .withColumn("inter",
        opt_fence(sorted_intersect_count(col("sh"), col("csh"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh")) + size(col("csh")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("corpus_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Batch form: distinct verified (doc, corpus) flags. */
  def screen(incoming: DataFrame, corpus: DataFrame, idCol: String,
             textCol: String, threshold: Double = 0.5): DataFrame =
    screenRaw(incoming, corpusIndex(corpus, idCol, textCol),
      idCol, textCol, threshold = threshold).distinct()
}
