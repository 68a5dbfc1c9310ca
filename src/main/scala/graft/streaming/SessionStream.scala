package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
final case class SessionState(sessionStart: Long, lastTs: Long, n: Long)
final case class SessionOut(user_id: Long,
    session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
    n_events: Long)

/** Streaming gap-based sessionization with CUSTOM STATE — the
  * `flatMapGroupsWithState` path for semantics windowed aggregation
  * can't express: a session closes `gap` after its LAST event, not on
  * a fixed grid. State per user is one open session; a closed session
  * is emitted either when a later event reveals the gap (in-stream)
  * or when the event-time watermark passes `last + gap` (timeout).
  *
  * Same session definition as the batch `GenericQueries.sessionize`
  * (a silence STRICTLY longer than the gap splits sessions): batch
  * and stream agree exactly on in-order streams; late-but-in-watermark
  * arrivals are folded best-effort (merged into the open session with
  * its start extended backwards, or emitted as their own final
  * session when older than the open session by more than the gap).
  */
object SessionStream {

  def sessions(events: DataFrame, gapMinutes: Int,
      watermark: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .selectExpr("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(gapMs))
  }

  private def update(gapMs: Long)(userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    def closed(s: SessionState) = SessionOut(userId,
      new java.sql.Timestamp(s.sessionStart),
      new java.sql.Timestamp(s.lastTs), s.n)
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]

    if (state.hasTimedOut) {
      // watermark passed last + gap: the open session is final
      state.getOption.foreach(s => out += closed(s))
      state.remove()
    } else {
      // within a batch events arrive unordered — sort, then fold with
      // the same strictly-greater gap rule as the batch sessionizer.
      // Cross-batch LATE arrivals (still inside the watermark):
      //  - older than the open session by more than the gap → their
      //    own immediately-final session (what batch would produce,
      //    assuming no further late neighbors — best effort);
      //  - inside the open session's span → merge, EXTENDING
      //    session_start backwards so the emitted span covers them.
      var cur = state.getOption
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out += closed(s)
            Some(SessionState(t, t, 1))
          case Some(s) if s.sessionStart - t > gapMs =>
            out += closed(SessionState(t, t, 1))
            Some(s)
          case Some(s) =>
            Some(SessionState(math.min(s.sessionStart, t),
              math.max(s.lastTs, t), s.n + 1))
          case None => Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // fire once the watermark passes the session's gap horizon;
        // must stay strictly above the current watermark
        state.setTimeoutTimestamp(math.max(s.lastTs + gapMs,
          state.getCurrentWatermarkMs() + 1))
      }
    }
    out.iterator
  }
}
