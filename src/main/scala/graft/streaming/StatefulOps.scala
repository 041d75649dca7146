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
}
