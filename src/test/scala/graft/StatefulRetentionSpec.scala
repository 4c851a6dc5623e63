package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulRetention
import graft.streaming.StatefulRetention.{Increment, Visit}

/** Streaming retention increments must equal the batch fold over the same
  * events — including out-of-order delivery within the watermark, where the
  * week-closure argument (no event can precede a closed week) makes the
  * cohort final before anything emits — arrive exactly once per
  * (user, week), and reclaim state past the horizon.
  */
class StatefulRetentionSpec extends AnyFunSuite with SparkTestBase {

  // Mondays 2024-01-01, -08, -15 … at an hour offset so week-floor matters
  private def day(d: Int, h: Int = 9) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("increments equal the batch fold; out-of-order within watermark is exact") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Visit]
    // 15-day lag: wide enough that an event from two weeks back is still
    // WITHIN the watermark (a 3-day lag would silently drop it — and close
    // week 0 before the late data arrived, which is the watermark contract,
    // not a bug)
    val q = StatefulRetention.increments(spark, ms.toDF(), watermark = "15 days")
      .writeStream.format("memory").queryName("ret_inc")
      .outputMode("append").start()
    try {
      // u1 active weeks 0 and 2; u2 week 0 only. u1's week-2 event arrives
      // BEFORE its week-0 event (cross-batch, within the watermark): a
      // cohort-on-first-arrival design would call week 2 the cohort.
      ms.addData(Visit(1L, day(15)), Visit(2L, day(3)))
      q.processAllAvailable()
      ms.addData(Visit(1L, day(2)), Visit(1L, day(4))) // late week-0 activity
      q.processAllAvailable()
      assert(spark.table("ret_inc").count() == 0,
        "nothing may emit while the earliest week is still open")
      // sentinel advances the watermark past every week's end + lag
      ms.addData(Visit(99L, Timestamp.valueOf("2024-02-10 09:00:00")))
      q.processAllAvailable()
      ms.addData(Visit(99L, Timestamp.valueOf("2024-02-10 10:00:00")))
      q.processAllAvailable()
      val got = spark.table("ret_inc").as[Increment].collect()
        .map(i => (i.user_id, i.cohort, i.week_offset)).toSet
      val mon1 = Timestamp.valueOf("2024-01-01 00:00:00")
      assert(got == Set((1L, mon1, 0), (1L, mon1, 2), (2L, mon1, 0)), s"got $got")

      // parity with the shared batch fold
      val batch = Seq(1L -> Seq(day(2), day(4), day(15)), 2L -> Seq(day(3)))
        .flatMap { case (u, ts) =>
          StatefulRetention.incrementsOf(ts.map(_.getTime))
            .map { case (c, off) => (u, new Timestamp(c), off) }
        }.toSet
      assert(got == batch, "stream must equal the batch emission fold")
    } finally q.stop()
  }

  test("state envelope: exactly one state row per live user at two " +
      "inflation levels, reclaimed past the horizon") {
    // the r7 scale probe showed retention state bytes flat 10×→100× because
    // rows track USERS, not events/weeks; this pins the row invariant in CI
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    for ((n, qn) <- Seq((20, "ret_env_20"), (200, "ret_env_200"))) {
      val ms = MemoryStream[Visit]
      // 2-week horizon so the sentinel can also reclaim every user
      val q = StatefulRetention.increments(spark, ms.toDF(),
          watermark = "1 day", horizonWeeks = 2)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        def stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        // each user: three visits across two weeks → still ONE state row
        ms.addData((1 to n).flatMap(u => Seq(
          Visit(u.toLong, day(2)), Visit(u.toLong, day(4)),
          Visit(u.toLong, day(9)))): _*)
        q.processAllAvailable()
        assert(stateRows == n,
          s"$n live users must hold exactly $n state rows, got $stateRows")
        // sentinel far past cohort + horizon: weeks close, horizon passes,
        // every user reclaimed — only the sentinel's state remains
        ms.addData(Visit(100000L, Timestamp.valueOf("2024-03-01 09:00:00")))
        q.processAllAvailable()
        ms.addData(Visit(100000L, Timestamp.valueOf("2024-03-01 10:00:00")))
        q.processAllAvailable()
        assert(stateRows == 1,
          s"post-horizon state must hold only the sentinel, got $stateRows")
        // exactly one increment per (user, active week): weeks 0 and 1
        assert(spark.table(qn).count() == 2L * n)
      } finally q.stop()
    }
  }

  test("closed weeks emit once and leave state; horizon reclaims the user") {
    val state = new TestGroupState(null)
    // week 0 and week 1 activity, watermark already past both week ends
    state.watermark = day(16).getTime
    val out = StatefulRetention.retentionFn(horizonWeeks = 4)(
      7L, Iterator(Visit(7L, day(2)), Visit(7L, day(9))), state).toSeq
    assert(out.map(_.week_offset).sorted == Seq(0, 1))
    assert(state.value != null && state.value.openWeeks.isEmpty,
      "emitted weeks must leave state; cohort stays for the horizon")
    val cohort = state.value.cohortMs

    // same weeks again CANNOT arrive (watermark), but state must survive a
    // timeout inside the horizon…
    val again = StatefulRetention.retentionFn(horizonWeeks = 4)(
      7L, Iterator.empty, state).toSeq
    assert(again.isEmpty && state.value != null)

    // …and be reclaimed once the watermark passes cohort + horizon
    state.watermark = cohort + 6L * StatefulRetention.WeekMs
    val done = StatefulRetention.retentionFn(horizonWeeks = 4)(
      7L, Iterator.empty, state).toSeq
    assert(done.isEmpty && state.value == null, "state must be reclaimed past the horizon")
  }

  /** Minimal GroupState driver for unit-testing the update function. */
  private class TestGroupState(var value: StatefulRetention.RetState)
      extends org.apache.spark.sql.streaming.GroupState[StatefulRetention.RetState] {
    var watermark = 0L
    private var timeout = 0L
    override def exists: Boolean = value != null
    override def get: StatefulRetention.RetState = value
    override def getOption: Option[StatefulRetention.RetState] = Option(value)
    override def update(s: StatefulRetention.RetState): Unit = value = s
    override def remove(): Unit = value = null
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = timeout = ms
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = timeout = ms
    override def setTimeoutTimestamp(ms: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = watermark
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
