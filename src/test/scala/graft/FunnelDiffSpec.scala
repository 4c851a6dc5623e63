package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel
import graft.streaming.StatefulFunnel

/** Differential tests for both funnel semantics on random event streams —
  * the CC-vs-union-find discipline applied here: each operator is compared
  * against an INDEPENDENT reference formulation (the cascading-min
  * definition for earliest-anchor; brute-force chain enumeration for
  * re-anchoring), on sequences dense enough to hit window boundaries,
  * same-timestamp ties, pre-anchor steps, and foreign types.
  */
class FunnelDiffSpec extends AnyFunSuite with SparkTestBase {

  private val steps = Seq("view", "click", "purchase")
  private val types = Seq("view", "click", "purchase", "error", "scroll")

  /** Cascading-min reference (the DuckDB oracle's definition, in Scala):
    * t1 = min step-1 time; t_k = min step-k time strictly after t_(k-1)
    * and ≤ t1 + w.
    */
  private def refEarliest(evs: Seq[(Long, String)], w: Long): Int = {
    val s0 = evs.collect { case (t, y) if y == steps.head => t }
    if (s0.isEmpty) return 0
    val t1 = s0.min
    var prev = t1
    var lv = 1
    for (k <- 1 until steps.length if lv == k) {
      val cand = evs.collect {
        case (t, y) if y == steps(k) && t > prev && t <= t1 + w => t
      }
      if (cand.nonEmpty) { prev = cand.min; lv += 1 }
    }
    lv
  }

  /** Brute-force EXISTS-chain reference for ClickHouse default-mode
    * re-anchoring: any chain i1 < i2 < … in (t, y) processing order, types
    * matching the step prefix, every event within window of the chain's
    * first. Depth ≤ |steps| so enumeration is polynomial.
    */
  private def refReanchor(evs: Seq[(Long, String)], w: Long): Int = {
    val es = evs.filter(e => steps.contains(e._2)).sorted
    var best = 0
    def ext(len: Int, lastIdx: Int, anchor: Long): Unit = {
      best = math.max(best, len)
      if (len == steps.length) return
      var j = lastIdx + 1
      while (j < es.length) {
        if (es(j)._2 == steps(len) && es(j)._1 <= anchor + w)
          ext(len + 1, j, anchor)
        j += 1
      }
    }
    for (i <- es.indices if es(i)._2 == steps.head) ext(1, i, es(i)._1)
    best
  }

  /** 40 users × up to 14 events in a tight time range (many boundary and
    * same-timestamp collisions), per seed.
    */
  private def randomEvents(seed: Long): Map[Long, Seq[(Long, String)]] = {
    val rnd = new scala.util.Random(seed)
    (1L to 40L).map { u =>
      val n = 1 + rnd.nextInt(14)
      u -> Seq.fill(n)((rnd.nextInt(20).toLong, types(rnd.nextInt(types.length))))
    }.toMap
  }

  test("earliest-anchor funnel equals the cascading-min reference on random streams") {
    import spark.implicits._
    val w = 8L // ms — tight enough that boundaries matter
    for (seed <- 1 to 12) {
      val data = randomEvents(seed)
      val df = data.toSeq.flatMap { case (u, evs) =>
        evs.map { case (t, y) => (u, new Timestamp(t), y) }
      }.toDF("user_id", "ts", "event_type")
      val got = Funnel.windowFunnel(df, "user_id", "ts", "event_type",
        steps, w * 1000, cap = 16)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      data.foreach { case (u, evs) =>
        assert(got(u) == refEarliest(evs, w),
          s"seed=$seed user=$u evs=${evs.sorted} got=${got(u)} want=${refEarliest(evs, w)}")
      }
      // the streaming emission fold is the same semantics
      data.foreach { case (u, evs) =>
        val stepEvs = evs.filter(e => steps.contains(e._2)).toList
        assert(StatefulFunnel.foldLevel(stepEvs, steps, w) == refEarliest(evs, w),
          s"foldLevel diverged: seed=$seed user=$u")
      }
    }
  }

  test("re-anchoring funnel equals brute-force chain enumeration on random streams") {
    import spark.implicits._
    val w = 8L
    for (seed <- 1 to 12) {
      val data = randomEvents(seed)
      val df = data.toSeq.flatMap { case (u, evs) =>
        evs.map { case (t, y) => (u, new Timestamp(t), y) }
      }.toDF("user_id", "ts", "event_type")
      val got = Funnel.windowFunnelReanchor(df, "user_id", "ts", "event_type",
        steps, w * 1000)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      data.foreach { case (u, evs) =>
        assert(got(u) == refReanchor(evs, w),
          s"seed=$seed user=$u evs=${evs.sorted} got=${got(u)} want=${refReanchor(evs, w)}")
      }
    }
  }
}
