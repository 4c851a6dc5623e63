package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-crafted sequences pinning windowFunnel's edge semantics — the
  * DuckDB cascading-min oracle proves the aggregate distribution; these
  * prove the per-user rules a distribution can hide.
  */
class FunnelSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 01:$min%02d:00")

  private def levels(rows: Seq[(Long, Timestamp, String)],
                     windowMicros: Long = 600L * 1000000): Map[Long, Int] = {
    import spark.implicits._
    operators.Funnel.windowFunnel(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMicros)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("strict order, window anchoring, and cutoffs") {
    val m = levels(Seq(
      // u1: full funnel inside the 10-minute window
      (1L, ts(0), "view"), (1L, ts(2), "click"), (1L, ts(4), "purchase"),
      // u2: click BEFORE the first view never counts (strict order)
      (2L, ts(0), "click"), (2L, ts(2), "view"), (2L, ts(4), "purchase"),
      // u3: purchase outside the window anchored at the FIRST view
      (3L, ts(0), "view"), (3L, ts(2), "click"), (3L, ts(20), "purchase"),
      // u4: no step-1 event at all
      (4L, ts(0), "error"),
      // u5: steps out of order after entry (purchase before click)
      (5L, ts(0), "view"), (5L, ts(2), "purchase"), (5L, ts(4), "click")))
    assert(m(1L) == 3)
    assert(m(2L) == 1, "pre-view click must not advance the funnel")
    assert(m(3L) == 2, "window anchors at the first view")
    assert(m(4L) == 0)
    assert(m(5L) == 2, "purchase before click cannot skip a level")
  }

  test("same-timestamp events do not satisfy the STRICTLY-after rule") {
    val m = levels(Seq(
      (1L, ts(0), "view"), (1L, ts(0), "click"), (1L, ts(5), "purchase")))
    // the click shares the view's timestamp → not strictly after → level 1
    // (and the purchase can't fire without a click)
    assert(m(1L) == 1)
  }

  test("a later view never re-anchors the window") {
    val m = levels(Seq(
      (1L, ts(0), "view"), (1L, ts(15), "view"), (1L, ts(16), "click")))
    // anchor stays at the FIRST view; the click at minute 16 is outside
    // its 10-minute window even though it's 1 minute after the second view
    assert(m(1L) == 1)
  }

  private def reanchorLevels(rows: Seq[(Long, Timestamp, String)],
                             windowMicros: Long = 600L * 1000000): Map[Long, Int] = {
    import spark.implicits._
    operators.Funnel.windowFunnelReanchor(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMicros)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("re-anchor variant: a later view restarts the window (CH parity)") {
    val m = reanchorLevels(Seq(
      // same shape the earliest-anchor test pins to level 1: the second
      // view re-anchors, so the click 1 minute later now counts
      (1L, ts(0), "view"), (1L, ts(15), "view"), (1L, ts(16), "click"),
      // chain carries the ANCHOR's window: purchase at minute 40 is within
      // 10 min of nothing — level stays 2
      (2L, ts(0), "view"), (2L, ts(15), "view"), (2L, ts(16), "click"),
      (2L, ts(40), "purchase"),
      // full chain off the re-anchored window
      (3L, ts(0), "view"), (3L, ts(15), "view"), (3L, ts(16), "click"),
      (3L, ts(20), "purchase"),
      // no step events at all → level 0, user still reported
      (4L, ts(0), "error")))
    assert(m(1L) == 2, "second view must re-anchor")
    assert(m(2L) == 2, "purchase outside every anchor's window")
    assert(m(3L) == 3)
    assert(m(4L) == 0, "foreign-only user is level 0, not dropped")
  }

  test("bounded buffer: a 100k-event bot user cannot grow funnel state") {
    import spark.implicits._
    // one bot with 100k foreign-type events plus a real 3-step user; the
    // EarliestK aggregate must keep the bot's buffer EMPTY (foreign types
    // are absorbed map-side) and still report it at level 0
    val bot = (0 until 100000).map(i => (9L, ts(i % 50), "error"))
    val real = Seq(
      (1L, ts(0), "view"), (1L, ts(2), "click"), (1L, ts(4), "purchase"))
    val m = levels(real ++ bot)
    assert(m(9L) == 0)
    assert(m(1L) == 3)
    // step-type spam is capped, not collected: 100k views stay within the
    // cap'd buffer bound and the funnel still completes off the earliest
    val spam = (0 until 100000).map(i => (8L, ts(1 + i % 50), "view"))
    val agg = new operators.Funnel.EarliestK(64)
    val buf = spam.take(1000).foldLeft(agg.zero) { (b, r) =>
      val nb = agg.reduce(b, operators.Funnel.FEv(r._2.getTime * 1000, r._3))
      assert(nb.n < 2 * 64, "buffer must stay under 2·cap during reduce")
      nb
    }
    assert(agg.finish(buf).length == 64)
  }
}
