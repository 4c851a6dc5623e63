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
}
