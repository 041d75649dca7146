package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `mapGroupsWithState` — the shape the reference's
  * per-business-class extraction bookkeeping would take if tracked live
  * (running totals, last-seen watermarks) instead of via history files.
  * State is one small record per key (bounded by key cardinality, not
  * event volume), checkpointed by the engine.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long,
                              total_value: Double, n_errors: Long)

  /** Per-user running totals, updated each micro-batch. Works identically
    * over a streaming or batch Dataset (batch = one "micro-batch"). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    implicit val totalsEnc = Encoders.product[UserTotals]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserTotals, UserTotals](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, 0L))
          val next = batch.foldLeft(prev) { (acc, e) =>
            acc.copy(
              n_events = acc.n_events + 1,
              total_value = acc.total_value + e.value,
              n_errors = acc.n_errors + (if (e.event_type == "error") 1 else 0))
          }
          state.update(next)
          next
      }
  }

  /** Streaming driver for the totals: Update-mode output each trigger. */
  def startRunningTotals(events: Dataset[UserEvent], queryName: String) =
    runningUserTotals(events).writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(queryName)
      .start()

  // ------------------------------------------------- emit-on-close sessions

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp,
                              value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp,
                                 n_events: Long, total_value: Double)

  /** Sessions that emit ONLY when closed by inactivity, via
    * `flatMapGroupsWithState` + event-time timeout — the custom-state shape
    * `session_window` can't express (it re-emits updated windows; this
    * yields each session exactly once, on close). The watermark drives the
    * timeout clock, so output lags by the configured gap — the price of
    * emit-once semantics. State is one small record per open session. */
  def sessionizeOnTimeout(events: Dataset[TimedEvent], gapSeconds: Long)
      : Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
              s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val gapMs = gapSeconds * 1000L
            // fold events into sessions; every gap-crossing closes one
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += ClosedSession(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, s.total)
                  open = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming driver: watermarked append-mode emit-on-close sessions. */
  def startClosedSessions(events: Dataset[TimedEvent], gapSeconds: Long,
                          queryName: String) = {
    implicit val enc = Encoders.product[TimedEvent]
    sessionizeOnTimeout(
        events.withWatermark("ts", s"$gapSeconds seconds").as[TimedEvent],
        gapSeconds)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .start()
  }
}
