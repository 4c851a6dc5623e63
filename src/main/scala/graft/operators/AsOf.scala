package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to every row the most recent *prior* state
  * for its key. Spark has no native as-of join; per the preference order in
  * SURVEY.md §3 this is expressed by composition — union the two inputs,
  * one ordered window per key, `last(..., ignoreNulls)` carries state
  * forward — rather than a custom `SparkPlan`:
  * the composed plan is exactly one shuffle + one per-key sort (the same
  * cost class any dedicated as-of-join implementation needs), Catalyst can
  * still push filters below it, and AQE still re-plans it. A custom
  * physical operator would buy nothing and opt out of all of that.
  */
object AsOf {

  /** For each left row, the latest `stateCols` from `state` with
    * `state.tsCol` strictly earlier, matched on `keys`. State columns come
    * back null until the first state row for that key.
    */
  def joinPrior(left: DataFrame, state: DataFrame, keys: Seq[String], tsCol: String,
                stateCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_is_state", lit(0))
    val s = state.withColumn("_is_state", lit(1))
    // align schemas: state rows carry nulls for left-only columns and v.v.
    val allCols = (l.columns ++ s.columns).distinct
    def conform(df: DataFrame): DataFrame =
      df.select(allCols.toIndexedSeq.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    val unioned = conform(l).unionByName(conform(s))
    // left rows sort before same-timestamp state rows, so state at exactly
    // the left row's timestamp is NOT visible — strictly-prior semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_is_state").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = stateCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_is_state") === 1, col(c)), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_is_state") === 0)
      .drop("_is_state")
      .drop(stateCols: _*)
  }

  /** Convenience: as-of self-enrichment — latest prior value of `valueCol`
    * from rows matching `predicate`, over the same input.
    */
  def priorValue(df: DataFrame, keys: Seq[String], tsCol: String,
                 predicate: Column, valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(as, last(when(predicate, col(valueCol)), ignoreNulls = true).over(w))
  }
}
