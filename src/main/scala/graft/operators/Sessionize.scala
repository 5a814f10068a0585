package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical stateful event-pipeline
  * operator, in both execution modes:
  *
  *  - [[batch]]: declarative window form — a session break is
  *    `t - lag(t) > gap`; the session index is the running sum of breaks
  *    per key. One hash exchange on the key, codegen'd, DuckDB-checkable
  *    (same SQL shape in any window-capable engine).
  *  - [[streamingSessions]]: the true incremental form via
  *    `flatMapGroupsWithState` with event-time timeout — bounded state
  *    (one open session per key), emits a session when the gap closes it.
  *    This is the shape that runs forever on a cluster; the batch form is
  *    its backfill. StreamingSpec asserts the two agree on totals.
  */
object Sessionize {

  /** Batch gap sessionization. Appends `session_id` (0-based per key). */
  def batch(
      df: DataFrame,
      key: Column,
      time: Column,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time)
    val break_ =
      when(time - lag(time, 1).over(w) > gap, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(break_).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  case class SessionEvent(user_id: Long, t: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(
      user_id: Long,
      session_start: Long,
      session_end: Long,
      n_events: Long,
      sum_value: Double)

  /** Streaming gap sessionization over a keyed event stream. Emits each
    * session when a new event arrives more than `gap` after the
    * session's last event. Still-open sessions never emit until closed —
    * an idle key holds its last session forever; use
    * [[streamingSessionsTimeout]] for the production form whose
    * watermark flushes idle sessions. The state is O(1) per key either
    * way.
    */
  def streamingSessions(
      events: Dataset[SessionEvent],
      gap: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // within a micro-batch, events for a key arrive unordered
          val sorted = rows.toSeq.sortBy(_.t)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.t - s.last <= gap =>
                // min/max, not overwrite: a CROSS-batch late event
                // (t < s.last, still above the watermark) must not move
                // `last` backward — that would falsely split the
                // session on the next in-order event and emit inverted
                // start/end bounds
                cur = Some(SessionState(
                  math.min(s.start, e.t), math.max(s.last, e.t),
                  s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += SessionOut(user, s.start, s.last, s.n, s.sum)
                cur = Some(SessionState(e.t, e.t, 1L, e.value))
              case None =>
                cur = Some(SessionState(e.t, e.t, 1L, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Timestamped event for the watermark-driven variant (watermarks
    * require a real TimestampType event-time column).
    */
  case class TsEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** PRODUCTION streaming sessionization: gap close PLUS watermark-driven
    * timeout flush. A session also emits when the event-time watermark
    * passes `last + gap` — an idle key's open session flushes instead of
    * lingering forever (the gap in [[streamingSessions]]).
    *
    * Caller contract: `events` must carry a watermark on `ts`
    * (`withWatermark`) — EventTimeTimeout requires one. Times in
    * [[SessionOut]] are epoch millis here (GroupState timeouts are
    * millisecond-granular). State stays O(1) per key; expired state is
    * removed on flush, so total state is bounded by the live-key count —
    * the property that lets this run forever on a cluster.
    */
  def streamingSessionsTimeout(
      events: Dataset[TsEvent],
      gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[TsEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min/max: see streamingSessions — late events must
                  // not move the session bounds backward
                  cur = Some(SessionState(
                    math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark (late data
              // can put last+gap behind it; flush at the next boundary)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
