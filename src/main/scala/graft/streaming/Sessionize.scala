package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: events for a user belong to one session while
  * consecutive gaps stay under `gapSeconds`.
  *
  * Batch formulation is two window passes over one shuffle on the user key
  * (lag → new-session flag → running sum = session ordinal); in streaming
  * the same semantics come from `session_window(ts, gap)` aggregation with
  * a watermark. Both are declarative — no custom state handling needed for
  * this shape.
  */
object Sessionize {

  /** Tag each event with its session ordinal (1-based per user). */
  def tagSessions(events: DataFrame, userCol: String, tsCol: String,
                  gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    // full-precision gap (epoch seconds incl. fractional part) so batch and
    // session_window streaming split sessions identically on sub-second
    // timestamps — unix_timestamp would truncate to whole seconds
    val gap = col(tsCol).cast("double") -
      lag(col(tsCol), 1).over(byUser).cast("double")
    val isNew = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session aggregate: bounds, event count, value total. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapSeconds: Long, valueCol: Column): DataFrame =
    tagSessions(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(valueCol).as("total_value"))

  /** Streaming-native variant: session_window aggregation (attach
    * a watermark upstream). Session bounds match the batch formulation;
    * ordinal ids are a batch-only concept. */
  def sessionsStream(events: DataFrame, userCol: String, tsCol: String,
                     gap: String, valueCol: Column): DataFrame =
    events.groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(valueCol).as("total_value"))
      .select(col(s"session_window.start").as("session_start"),
        col(s"session_window.end").as("session_end"),
        col(userCol), col("n_events"), col("total_value"))
}
