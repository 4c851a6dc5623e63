package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stream-vs-static LM quality gate: incoming documents are scored against
  * a unigram LM trained on the existing corpus and admitted/rejected by
  * cross-entropy threshold — the continuous version of the e18 CCNet gate,
  * the admission-control sibling of [[NearDupScreen]] (that one asks "have
  * we seen this?", this one asks "is this prose?").
  *
  * Streaming legality: the LM is a STATIC (term, logp) table — train once,
  * joined by every micro-batch (stream-static equi-joins are stateless).
  * The only state is the per-(window, doc) aggregation, bounded by the
  * WATERMARK horizon, not stream history — the g01 windowed-totals
  * discipline. Append mode emits each doc's verdict when its window closes.
  *
  * The batch path is the SAME function (watermark is a no-op on batch
  * frames), so stream==batch parity is a property, not a porting exercise —
  * proven in StreamingSpec.
  */
object QualityGate {

  /** Unigram LM trained on a static corpus: (term, logp) persisted (build
    * once, reuse per micro-batch; long-lived callers unpersist on stop),
    * plus the OOV log-prob (0.5 pseudo-count — same smoothing as
    * `TextLm.bigramScore`). The token total is a 1-row scalar collect —
    * model metadata, same discipline as a corpus `count()`.
    */
  def trainLm(corpus: DataFrame, textCol: String): (DataFrame, Double) = {
    val cnt1 = corpus
      .select(explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = cnt1.agg(sum("cnt")).head().getLong(0).toDouble
    val lm = cnt1.select(col("term"),
        log(col("cnt").cast("double") / tot).as("logp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (lm, math.log(0.5 / tot))
  }

  /** Score + gate a (possibly streaming) document frame: explode tokens,
    * left-join the static LM, aggregate per (window, doc) under the
    * watermark, admit iff cross-entropy ≤ `maxCe`. Token-less docs have
    * nothing to score and are absent (same convention as `TextLm`).
    * Output: (idCol, n_tokens, ce, admit).
    */
  def gate(docs: DataFrame, tsCol: String, idCol: String, textCol: String,
           lm: DataFrame, oovLogp: Double, maxCe: Double,
           watermark: String = "10 minutes",
           windowDur: String = "1 minute"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .join(lm, Seq("term"), "left")
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(-avg(coalesce(col("logp"), lit(oovLogp))), 4).as("ce"))
      .select(col(idCol), col("n_tokens"), col("ce"),
        (col("ce") <= maxCe).as("admit"))
}
