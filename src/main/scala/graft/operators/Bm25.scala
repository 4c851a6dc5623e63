package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BM25 ranked retrieval (SURVEY.md §2 group E) — the lexical-search
  * complement to the group-D vector ANN family: score documents for a
  * batch of keyword queries with Okapi BM25 (Robertson & Walker, the
  * formula every Lucene-lineage engine ships):
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
  *                 (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5) /
  * (df + 0.5)). Duplicate terms in a query accumulate once per
  * occurrence, standard bag-of-words semantics.
  *
  * Scale shape (100 TB corpus, q queries): per-(doc, term) counts
  * aggregate map-side; the postings join hits ONLY the query terms — a
  * `q·terms`-row broadcast — so the corpus is never shuffled by term for
  * scoring, only the matched postings move; doc-length and idf side
  * tables are |docs| and |query terms| rows. Top-k per query is a window
  * over candidates that matched ≥1 term (candidates, not corpus).
  * Deterministic: ties break (score via its double bits, then doc_id).
  */
object Bm25 {

  /** Score `queries` (query_id, text) against `docs`; top `k` per query.
    * Output: (query_id, doc_id, round(score, 4), rank).
    *
    * Cache contract: the RETURNED frame is persisted (it was materialized
    * once so the internal postings cache could be released before return);
    * the caller owns its release — `result.unpersist()` when done, or the
    * harness-level `clearCache()` between queries (Verify/Bench both do).
    * Every internal persist is released before this method returns —
    * CacheHygieneSpec asserts the cache manager holds NOTHING but the
    * returned frame.
    */
  def search(docs: DataFrame, queries: DataFrame, idCol: String,
             textCol: String, qIdCol: String, qTextCol: String,
             k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    // one row per (query, term occurrence) — bag-of-words, duplicates count
    val qterms = queries.select(col(qIdCol).as("query_id"),
        explode(split(trim(col(qTextCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    // postings restricted to query terms FIRST — df per term is invariant
    // under a by-term prune, so document frequency aggregates from the
    // pruned postings only. Aggregating df over the full vocabulary and
    // then joining to the pruned side would be a corpus-scale shuffle
    // (every distinct (doc, term) re-keyed by term) spent to obtain df for
    // a few dozen query terms.
    val pruned = tf.join(broadcast(qterms.select("term").distinct()), "term")
    val dfreq = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    val matched = pruned.join(broadcast(dfreq), "term")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = qterms
      .join(matched, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(sum(idf * tfNorm).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val out = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 4).as("score"), col("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    tf.unpersist(blocking = false)
    out
  }
}
