package graft.streaming

import java.sql.Timestamp
import java.time.{DayOfWeek, Instant, LocalDate, ZoneOffset}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weekly-cohort retention increments — the stateful sibling of
  * the batch b39 matrix, continuous instead of recomputed.
  *
  * Emits one `(user, cohort, week_offset)` row per distinct active
  * (user, week), exactly once, when that week CLOSES under the watermark.
  * Downstream, `groupBy(cohort, week_offset).count()` (or an idempotent
  * sink keyed on the triple) is the live retention matrix.
  *
  * Why this is EXACT under any within-watermark arrival order, unlike the
  * funnel's documented cap edge: a week only emits once the watermark has
  * passed its end, and every later event must carry ts ≥ watermark — so
  * after the user's EARLIEST seen week closes, no event can ever reveal an
  * earlier first-active week. The cohort is therefore final before the
  * first increment for the user is emitted, and offsets against it never
  * need correction.
  *
  * State per user is O(open weeks), NOT O(history): a closed, emitted week
  * cannot recur (same watermark argument), so only weeks still inside the
  * watermark horizon are held — with the cohort, a handful of longs. The
  * one semantic floor: the cohort itself must be remembered for as long as
  * the user can return, so state lives until `horizonWeeks` past the
  * cohort (the matrix's reporting horizon — dashboards truncate there
  * anyway). A user returning after the horizon starts a new cohort, the
  * same per-eviction contract as [[StatefulFunnel]].
  */
object StatefulRetention {

  case class Visit(user_id: Long, ts: Timestamp)
  case class RetState(cohortMs: Long, openWeeks: List[Long])
  case class Increment(user_id: Long, cohort: Timestamp, week_offset: Int)

  val WeekMs: Long = 7L * 24 * 3600 * 1000

  /** Monday-00:00-UTC week start — the JVM mirror of Spark's
    * `date_trunc("week", ts)` under the engine's UTC session (no DST in
    * UTC, so week arithmetic in plain ms is exact).
    */
  def weekStartMs(ms: Long): Long =
    LocalDate.ofInstant(Instant.ofEpochMilli(ms), ZoneOffset.UTC)
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli

  /** Batch emission fold over a user's complete event-time history: the
    * increments the stream emits once every week has closed. Shared by the
    * g07 oracle twin and the spec's stream==batch comparison.
    */
  def incrementsOf(tsMs: Seq[Long]): Seq[(Long, Int)] = {
    val weeks = tsMs.map(weekStartMs).distinct.sorted
    weeks.headOption.toSeq.flatMap { cohort =>
      weeks.map(w => (cohort, ((w - cohort) / WeekMs).toInt))
    }
  }

  def retentionFn(horizonWeeks: Int)(
      user: Long, events: Iterator[Visit], state: GroupState[RetState])
      : Iterator[Increment] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption
    var open = prev.map(_.openWeeks.toSet).getOrElse(Set.empty) ++
      events.map(v => weekStartMs(v.ts.getTime))
    val cohort = math.min(
      prev.map(_.cohortMs).getOrElse(Long.MaxValue),
      if (open.isEmpty) Long.MaxValue else open.min)
    // cohort = min over everything ever seen: open still contains the
    // earliest week until IT closes, and after that no earlier event can
    // arrive (wm has passed that week's end) — so this min never moves
    // after first emission
    val closed = open.filter(_ + WeekMs <= wm)
    open = open -- closed
    val out = closed.toSeq.sorted.map(w =>
      Increment(user, new Timestamp(cohort), ((w - cohort) / WeekMs).toInt))
    if (open.isEmpty && cohort != Long.MaxValue &&
        wm > cohort + horizonWeeks.toLong * WeekMs) {
      state.remove() // past the reporting horizon; a comeback re-cohorts
    } else {
      state.update(RetState(cohort, open.toList))
      // wake when the earliest open week closes; with nothing open, wake at
      // the horizon to reclaim the state (clamped past the watermark, which
      // setTimeoutTimestamp requires)
      val target =
        if (open.nonEmpty) open.min + WeekMs
        else cohort + horizonWeeks.toLong * WeekMs + 1
      state.setTimeoutTimestamp(math.max(target, wm + 1))
    }
    out.iterator
  }

  /** events(user_id, ts) → exactly-once per-(user, active week) increments,
    * emitted as each week closes under the watermark (append mode).
    */
  def increments(spark: SparkSession, events: Dataset[Row],
                 watermark: String = "10 minutes",
                 horizonWeeks: Int = 520): Dataset[Increment] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Visit]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        retentionFn(horizonWeeks))
  }
}
