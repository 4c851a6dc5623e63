package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — ClickHouse's `windowFunnel` re-expressed
  * Spark-first (the reference sits in the ClickHouse ecosystem; this is the
  * signature dashboard question "how far down view→click→purchase do users
  * get within the window?").
  *
  * Semantics (windowFunnel's strict-order mode): the window anchors at the
  * user's EARLIEST step-1 event; each later level needs an event strictly
  * after the previous level's match and within (anchor, anchor+window].
  * Matching each level to its earliest eligible event is optimal for a
  * fixed anchor, so the greedy fold equals the cascading-min definition the
  * oracle states in SQL.
  *
  * Scale shape: ONE shuffle (groupBy user), per-user events collected and
  * sorted in the aggregation buffer — exactly ClickHouse's memory model for
  * this function (state ∝ events per user, not corpus), then a codegen'd
  * higher-order fold computes the level. No joins, no per-level passes.
  */
object Funnel {

  /** Per-user funnel level: 0 (never entered) … steps.length. */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val st = (lv: Column, anchor: Column, last: Column) =>
      struct(lv.as("lv"), anchor.as("anchor"), last.as("last"))
    val fold = (s: Column, e: Column) => {
      val t = e.getField("t")
      val y = e.getField("y")
      val within = t > s.getField("last") &&
        t <= s.getField("anchor") + lit(windowMicros)
      val entered = when(s.getField("lv") === 0 && y === lit(steps.head),
        st(lit(1), t, t))
      steps.indices.drop(1).foldLeft(entered) { (acc, i) =>
        acc.when(s.getField("lv") === i && y === lit(steps(i)) && within,
          st(lit(i + 1), s.getField("anchor"), t))
      }.otherwise(s)
    }
    events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("y")))).as("evs"))
      .select(col(userCol),
        aggregate(col("evs"), st(lit(0), lit(0L), lit(0L)), fold,
          s => s.getField("lv")).as("level"))
  }
}
