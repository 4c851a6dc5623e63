package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data selection under a token budget — the "keep the best N tokens" step
  * of a training-data pipeline: rank documents by a quality score, admit
  * greedily in rank order until the cumulative token count exceeds the
  * budget.
  *
  * The global rank-order prefix sum is the scale hazard: a bare
  * `Window.orderBy(quality)` moves the whole corpus to ONE partition. Same
  * cure as `Chunking.pack`'s two-level cumsum, but the grouping key must
  * follow the ORDER (quality), not the id: documents are bucketed by a
  * deterministic value-range function of the score (`floor(q · buckets)` —
  * no sampling, no `approxQuantile`, so the bucketing is a pure per-row
  * function and the output is reproducible under any partitioning), the
  * within-bucket cumsum runs partitioned per bucket, and the ≤`buckets`
  * bucket totals prefix-sum on a single tiny partition before being
  * broadcast back.
  */
object Selection {

  /** Greedy budget selection: rows of `df` whose cumulative `tokCol` in
    * (`qualityCol` DESC, `idCol` ASC) order stays within `budget`.
    * Emits (id, quality, tok_count, cum_tokens) for the admitted prefix.
    * `qualityCol` must be in [0, 1]; ties break on the id, so the admitted
    * set is exact and deterministic, never sample-dependent.
    */
  def budgetSelect(df: DataFrame, idCol: String, qualityCol: String,
                   tokCol: String, budget: Long, buckets: Int = 64): DataFrame = {
    val base = df.select(
      col(idCol).as("doc_id"),
      col(qualityCol).cast("double").as("quality"),
      col(tokCol).cast("long").as("tok_count"))
      .filter(col("tok_count") > 0)
      // bucket 0 holds the BEST docs so bucket order == admission order
      .withColumn("bkt",
        least(lit(buckets - 1), floor((lit(1.0) - col("quality")) * buckets))
          .cast("int"))
    val inBkt = Window.partitionBy("bkt")
      .orderBy(col("quality").desc, col("doc_id"))
    val perBkt = base.withColumn("cum_in_bkt",
      sum("tok_count").over(inBkt))
    // ≤ `buckets` rows: the single-partition window here is over the bucket
    // TOTALS, not the corpus
    val offsets = base.groupBy("bkt").agg(sum("tok_count").as("bkt_tot"))
      .withColumn("bkt_off",
        coalesce(
          sum("bkt_tot").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "bkt_off")
    perBkt.join(broadcast(offsets), "bkt")
      .withColumn("cum_tokens", col("bkt_off") + col("cum_in_bkt"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "quality", "tok_count", "cum_tokens")
  }

  /** Deterministic epoch shuffle — the reproducible global training-order
    * permutation every epoch of a data loader needs: position = rank of
    * md5("epoch<e>:" + id), so the permutation is a pure function of
    * (epoch, id) — reproducible across reruns/retries, different per epoch,
    * and samplable at any worker without coordination.
    *
    * Same scale cure as [[budgetSelect]]: a bare `Window.orderBy(hash)`
    * would move the corpus to ONE partition, so rows bucket by the hash's
    * first byte (a prefix of the sort key — bucket order IS hash order),
    * rank within buckets partition-parallel, and only the ≤256 bucket
    * counts prefix-sum on a single tiny partition before broadcasting back.
    * The hash is md5 (not xxhash64) for the b24 reason: the oracle must
    * rank by the SAME permutation, and md5 is the permutation both engines
    * spell identically.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    val keyed = df.select(col(idCol).as("doc_id"))
      .withColumn("h", md5(concat(lit(s"epoch$epoch:"),
        col("doc_id").cast("string")).cast("binary")))
      .withColumn("bkt", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val inBkt = Window.partitionBy("bkt").orderBy(col("h"), col("doc_id"))
    val perBkt = keyed.withColumn("pos_in_bkt",
      row_number().over(inBkt).cast("long"))
    val offsets = keyed.groupBy("bkt").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(
          sum("n").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "off")
    perBkt.join(broadcast(offsets), "bkt")
      .select(col("doc_id"), (col("off") + col("pos_in_bkt")).as("shuffle_pos"))
  }
}
