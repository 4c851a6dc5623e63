package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (SURVEY.md §4). AQE's skew-join splitting
  * covers joins; for aggregations over pathologically hot keys (one resource
  * taking 30% of 100 TB of traffic lands on one reducer) the classic fix is
  * two-phase salted aggregation: spread each key over `salts` sub-keys,
  * partially aggregate, then merge. Both phases keep map-side combine, so
  * total shuffled bytes stay the same — only the per-reducer max shrinks by
  * ~`salts`×.
  */
object Skew {

  /** sum/count aggregation by `keys` computed through a salt stage.
    * Output: keys..., `<col>_sum` per sum column, `row_cnt`.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                     salts: Int = 16): DataFrame = {
    // salt must be a deterministic function of row CONTENT: an ordinal salt
    // (monotonically_increasing_id / partition id) changes across task
    // retries of shuffled inputs and can double-count or drop partials
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        sumCols.map(c => sum(col(c)).as(s"_s_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum("_cnt").as("row_cnt"),
        sumCols.map(c => sum(col(s"_s_$c")).as(s"${c}_sum")): _*)
  }
}
