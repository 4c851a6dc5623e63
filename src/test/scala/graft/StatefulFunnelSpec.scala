package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulFunnel

/** The streaming funnel must equal the batch fold once windows close, keep
  * per-user state bounded, and emit each user exactly once per eviction
  * (= once per user in this bounded replay; a user resuming AFTER eviction
  * on an unbounded stream starts a new episode — see the operator doc) —
  * driven through MemoryStream with watermark-advancing sentinel events.
  */
class StatefulFunnelSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${1 + min / 60}%02d:${min % 60}%02d:00")
  private val steps = Seq("view", "click", "purchase")

  test("levels equal the batch fold; out-of-order within watermark is exact") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[StatefulFunnel.Event]
    // 30-minute funnel window, 10-minute watermark lag
    val q = StatefulFunnel.levels(spark, ms.toDF(), steps, windowMinutes = 30)
      .writeStream.format("memory").queryName("funnel_levels")
      .outputMode("append").start()
    try {
      // u1 full funnel; u2 click-before-view (level 1); u4 foreign only
      ms.addData(
        StatefulFunnel.Event(1L, ts(0), "view"),
        StatefulFunnel.Event(1L, ts(2), "click"),
        StatefulFunnel.Event(1L, ts(4), "purchase"),
        StatefulFunnel.Event(2L, ts(0), "click"),
        StatefulFunnel.Event(2L, ts(2), "view"),
        StatefulFunnel.Event(4L, ts(1), "error"),
        // u3 out of order across BATCHES: click first...
        StatefulFunnel.Event(3L, ts(5), "click"))
      q.processAllAvailable()
      // ...then the earlier view arrives late (still within the watermark);
      // a fold-on-arrival design would have discarded the click
      ms.addData(StatefulFunnel.Event(3L, ts(3), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_levels").count() == 0,
        "no level may be emitted while windows are still open")
      // sentinel user far in event-time future: watermark passes every
      // anchor+window, timing out and emitting all four users
      ms.addData(StatefulFunnel.Event(99L, ts(600), "error"))
      q.processAllAvailable()
      ms.addData(StatefulFunnel.Event(99L, ts(601), "error"))
      q.processAllAvailable()
      val got = spark.table("funnel_levels")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0),
        s"got $got")
      // exactly-once emission per user
      assert(spark.table("funnel_levels").count() == 4)

      // parity with the batch operator on the same events
      val batch = Seq(
        (1L, ts(0), "view"), (1L, ts(2), "click"), (1L, ts(4), "purchase"),
        (2L, ts(0), "click"), (2L, ts(2), "view"),
        (3L, ts(3), "view"), (3L, ts(5), "click"),
        (4L, ts(1), "error")).toDF("user_id", "ts", "event_type")
      val expected = operators.Funnel.windowFunnel(
        batch, "user_id", "ts", "event_type", steps, 30L * 60 * 1000000)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, "stream must equal batch windowFunnel")
    } finally q.stop()
  }

  test("state envelope: exactly one state row per live user at two " +
      "inflation levels, drained on eviction") {
    // the r7 scale probe measured state rows == active users at every
    // inflation; this pins that envelope in CI so a state-shape regression
    // (per-event rows, an eviction that stops firing) fails the suite
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    for ((n, qn) <- Seq((20, "funnel_env_20"), (200, "funnel_env_200"))) {
      val ms = MemoryStream[StatefulFunnel.Event]
      val q = StatefulFunnel.levels(spark, ms.toDF(), steps, windowMinutes = 30)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        def stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        // every user contributes several EVENTS but must hold ONE state row
        ms.addData((1 to n).flatMap(u => Seq(
          StatefulFunnel.Event(u.toLong, ts(0), "view"),
          StatefulFunnel.Event(u.toLong, ts(2), "click"),
          StatefulFunnel.Event(u.toLong, ts(3), "error"))): _*)
        q.processAllAvailable()
        assert(stateRows == n,
          s"$n live users must hold exactly $n state rows, got $stateRows")
        // watermark sentinel closes every user's window → all evicted, only
        // the sentinel's own state survives
        ms.addData(StatefulFunnel.Event(100000L, ts(600), "error"))
        q.processAllAvailable()
        ms.addData(StatefulFunnel.Event(100000L, ts(601), "error"))
        q.processAllAvailable()
        assert(stateRows == 1,
          s"post-eviction state must hold only the sentinel, got $stateRows")
        assert(spark.table(qn).count() == n,
          "each evicted user emits exactly one level row")
      } finally q.stop()
    }
  }

  test("state is bounded: foreign types never buffer, step events cap") {
    val st = StatefulFunnel.FunnelBuf(Array.emptyLongArray, 0L)
    // drive the state-update fn directly with a 10k-event bot
    val bot = (0 until 10000).map(i =>
      StatefulFunnel.Event(9L, ts(i % 50), if (i % 2 == 0) "error" else "view"))
    val state = new TestGroupState(st)
    StatefulFunnel.funnelFn(steps, 30L * 60 * 1000, cap = 64)(
      9L, bot.iterator, state)
    val buf = state.value
    assert(buf.evs.length == 64, "step events must cap at `cap`")
    // packed low nibble is the step index; "view" is steps(0)
    assert(buf.evs.forall(p => (p & 15L) == 0L), "foreign types must never buffer")
  }

  test("packed fold equals the string fold on adversarial same-ts ties") {
    // two DIFFERENT steps sharing a timestamp exercise the alphabetical
    // tie-break the packed ordering must reproduce bit-for-bit
    val w = 30L * 60 * 1000
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val evs = Seq.fill(rnd.nextInt(8) + 1)(
        (ts(rnd.nextInt(4)).getTime, steps(rnd.nextInt(3))))
      val sortedSteps = steps.sorted
      val packed = evs.map { case (t, y) =>
        val idx = steps.indexOf(y)
        (t << 8) | (sortedSteps.indexOf(y).toLong << 4) | idx.toLong
      }.toArray
      assert(StatefulFunnel.foldLevelPacked(packed, steps.length, w) ==
        StatefulFunnel.foldLevel(evs, steps, w),
        s"packed fold diverged on $evs")
    }
  }

  /** Minimal GroupState driver for unit-testing the update function. */
  private class TestGroupState(var value: StatefulFunnel.FunnelBuf)
      extends org.apache.spark.sql.streaming.GroupState[StatefulFunnel.FunnelBuf] {
    private var timeout = 0L
    override def exists: Boolean = value != null
    override def get: StatefulFunnel.FunnelBuf = value
    override def getOption: Option[StatefulFunnel.FunnelBuf] = Option(value)
    override def update(s: StatefulFunnel.FunnelBuf): Unit = value = s
    override def remove(): Unit = value = null
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = timeout = ms
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = timeout = ms
    override def setTimeoutTimestamp(ms: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
