package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom state — the
  * `flatMapGroupsWithState` counterpart of the batch window version
  * (Queries a09). One state record per user: a session closes either when a
  * new event arrives more than `gap` after the last one, or when the
  * event-time watermark passes last+gap (timeout) with no new events.
  *
  * State is O(users), not O(events) — the watermark timeout is what keeps
  * this bounded on an unbounded 100 TB/day stream.
  */
object StatefulSessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start_ms: Long, last_ms: Long, n_events: Int)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int,
                     dur_sec: Long)

  private def close(user: Long, s: SessionState): Session =
    Session(user, s.start_ms, s.last_ms, s.n_events, (s.last_ms - s.start_ms) / 1000)

  def sessionizeFn(gapMs: Long)(
      user: Long, events: Iterator[Event], state: GroupState[SessionState])
      : Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      out
    } else {
      val sorted = events.toArray.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last_ms > gapMs =>
            closed += close(user, s)
            cur = Some(SessionState(t, t, 1))
          case Some(s) =>
            // late-but-within-watermark events may extend the session backwards
            cur = Some(SessionState(math.min(s.start_ms, t), math.max(s.last_ms, t),
              s.n_events + 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_ms + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Batch twin of the stream for the correctness gate (Queries g08): drives
    * [[sessionizeFn]] ITSELF — not a re-implementation — over all of one
    * user's events in a single invocation via `TestGroupState`, then closes
    * the trailing open session through the same `hasTimedOut` branch the
    * event-time timeout takes in production. Whatever the stream would emit
    * once the watermark passes every event, this returns; StreamingSpec
    * additionally proves the MemoryStream path (incremental batches,
    * watermark timeouts) agrees.
    */
  def sessionsOfBatch(user: Long, tsMs: Seq[Long], gapMs: Long): Seq[Session] = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    val st = TestGroupState.create[SessionState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(0L), hasTimedOut = false)
    val closed = sessionizeFn(gapMs)(
      user, tsMs.iterator.map(t => Event(user, new Timestamp(t))), st).toSeq
    val residual =
      if (st.exists) {
        val timedOut = TestGroupState.create[SessionState](
          Optional.of(st.get), GroupStateTimeout.EventTimeTimeout,
          0L, Optional.of(Long.MaxValue), hasTimedOut = true)
        sessionizeFn(gapMs)(user, Iterator.empty, timedOut).toSeq
      } else Seq.empty
    closed ++ residual
  }

  /** events(user_id, ts) → closed sessions (append-mode stream). */
  def sessions(spark: SparkSession, events: Dataset[Row],
               gapMinutes: Int = 30, watermark: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeFn(gapMs))
  }
}
