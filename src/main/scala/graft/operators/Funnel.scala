package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the signature dashboard question "how far down
  * view→click→purchase do users get within the window?", in two variants:
  *
  *  - [[windowFunnel]]: deliberately EARLIEST-ANCHOR semantics — the window
  *    is fixed at the user's first step-1 event and each level must match
  *    strictly after the previous level, inside (anchor, anchor+window].
  *    This is NOT ClickHouse `windowFunnel` parity: CH re-anchors on every
  *    later step-1 event and reports the best chain (view@t0, view@t90,
  *    click@t100, window 50 → CH level 2, here level 1). Earliest-anchor is
  *    the stricter "did the FIRST exposure convert" reading, and is what the
  *    b38 oracle states in cascading-min SQL.
  *  - [[windowFunnelReanchor]]: ClickHouse default-mode parity (re-anchoring,
  *    no strict_increase) — level k is reached iff there EXISTS a chain
  *    e1 < e2 < … < ek in processing order, each within window of e1. The
  *    greedy ts-array algorithm CH uses equals that EXISTS definition
  *    because the best (latest) chain start per level is monotone in time,
  *    which is how the b40 oracle can state it as a join.
  *
  * Scale shape, [[windowFunnel]]: ONE shuffle (groupBy user) into a
  * k-BOUNDED typed aggregate — per-user state is capped at ~2·`cap` step
  * events regardless of how hot the user is, and non-step events are
  * consumed during map-side partial aggregation (they register the user for
  * level 0 but never enter the buffer, so a bot spamming foreign event
  * types costs a hash probe, not buffer growth, and never crosses the
  * wire). An unbounded `collect_list` here was the one OOM hazard at 100×
  * skew; the cap trades exactness beyond `cap` step events per user
  * (default 65 536 — far past any real funnel horizon) for a hard buffer
  * bound.
  *
  * Scale shape, [[windowFunnelReanchor]]: no per-user buffer at all — the
  * chain recurrence is n−1 running-max window functions over ONE
  * user-partitioned time sort, and a Spark sort spills to disk, so a 10⁷-
  * event user degrades to I/O instead of OOM. Same single-Exchange
  * discipline; the level-0 users come back via a user-keyed left join that
  * reuses the partitioning.
  */
object Funnel {

  /** One funnel event; `y == null` marks a non-step event that registers
    * the user (for level 0) but must not enter the buffer.
    */
  case class FEv(t: Long, y: String)

  /** Counted aggregation buffer: `n` makes the size check O(1) and the
    * List prepend keeps inserts O(1) — a `Seq :+` append here copies the
    * whole buffer per event, which the 100× probe measured as a quadratic
    * (95 s vs 2 s for the window variant at 10M events). Insertion order is
    * irrelevant: trim/finish sort.
    */
  case class FBuf(n: Int, evs: List[FEv])

  /** K-bounded "earliest events" aggregate: keeps the `k` smallest (t, y)
    * pairs, trimming lazily at 2k so inserts stay O(1) amortized (each trim
    * sorts 2k elements and halves the buffer, so sorts amortize to
    * O(log k) per event). Map-side combine trims before the shuffle — the
    * same bounded-state discipline as [[TopK]], which is what makes the
    * funnel skew-safe.
    */
  class EarliestK(k: Int) extends Aggregator[FEv, FBuf, Seq[FEv]] {
    private def trim(b: FBuf): FBuf = {
      val t = b.evs.sortBy(e => (e.t, e.y)).take(k)
      FBuf(t.length, t)
    }
    override def zero: FBuf = FBuf(0, Nil)
    override def reduce(b: FBuf, e: FEv): FBuf =
      if (e.y == null) b
      else {
        val nb = FBuf(b.n + 1, e :: b.evs)
        if (nb.n >= 2 * k) trim(nb) else nb
      }
    override def merge(x: FBuf, y: FBuf): FBuf = {
      val m = FBuf(x.n + y.n, x.evs ::: y.evs)
      if (m.n > k) trim(m) else m
    }
    override def finish(b: FBuf): Seq[FEv] = trim(b).evs
    override def bufferEncoder: Encoder[FBuf] = ExpressionEncoder[FBuf]()
    override def outputEncoder: Encoder[Seq[FEv]] = ExpressionEncoder[Seq[FEv]]()
  }

  /** Per-user funnel level, earliest-anchor semantics: 0 (never entered) …
    * steps.length. `cap` bounds per-user aggregation state; results are
    * exact for users with ≤ cap step-type events (beyond that, the earliest
    * cap events decide — a documented approximation, not a crash).
    */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long, cap: Int = 1 << 16): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
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
    val bounded = udaf(new EarliestK(cap), ExpressionEncoder[FEv]())
    events
      .groupBy(col(userCol))
      // step types keep their label; foreign types aggregate as null and are
      // dropped inside the bounded buffer (user survives with level 0)
      .agg(bounded(unix_micros(col(tsCol)),
        when(col(typeCol).isin(steps: _*), col(typeCol))).as("evs"))
      // EarliestK.finish returns the events already (t, y)-sorted
      .select(col(userCol),
        aggregate(col("evs"), st(lit(0), lit(0L), lit(0L)), fold,
          s => s.getField("lv")).as("level"))
  }

  /** Per-user funnel level, ClickHouse default-mode parity (re-anchoring,
    * non-strict): level k iff some chain e1 < … < ek exists in (t, type)
    * processing order with every e_i ≤ e1 + window. The CH ts-array greedy
    * is expressed as a window-function recurrence: `c_k` = chain-start of a
    * k-chain ending at this row = the running max of `c_(k-1)` over
    * strictly-earlier rows, when this row matches step k inside the window.
    * Running max is exact here because a later chain start only widens the
    * window for later levels (monotone), which is also why greedy = EXISTS.
    */
  def windowFunnelReanchor(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, steps: Seq[String],
                           windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
    // Internal columns carry a `_wf_` prefix so a caller whose input already
    // has a column named e.g. `t` or `lv` never hits ambiguity/shadowing
    // (same convention as the `_h`/`_hx` helper columns elsewhere in graft).
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_wf_t"), col("_wf_y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    var df = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), unix_micros(col(tsCol)).as("_wf_t"),
        col(typeCol).as("_wf_y"))
      .withColumn("_wf_c1", when(col("_wf_y") === steps.head, col("_wf_t")))
    for (k <- 2 to steps.length) {
      df = df
        .withColumn(s"_wf_b${k - 1}", max(col(s"_wf_c${k - 1}")).over(w))
        .withColumn(s"_wf_c$k",
          when(col("_wf_y") === steps(k - 1) &&
            col(s"_wf_b${k - 1}").isNotNull &&
            col("_wf_t") <= col(s"_wf_b${k - 1}") + lit(windowMicros),
            col(s"_wf_b${k - 1}")))
    }
    val lvlExpr = (1 to steps.length).foldLeft(lit(0)) { (acc, k) =>
      when(col(s"_wf_c$k").isNotNull, lit(k)).otherwise(acc)
    }
    val perUser = df.withColumn("_wf_lv", lvlExpr)
      .groupBy(col(userCol)).agg(max(col("_wf_lv")).as("_wf_lv"))
    // users whose every event was filtered out are level 0; the join keys
    // match the window partitioning, so no extra exchange on the big side
    events.select(col(userCol)).distinct()
      .join(perUser, Seq(userCol), "left")
      .select(col(userCol), coalesce(col("_wf_lv"), lit(0)).as("level"))
  }
}
