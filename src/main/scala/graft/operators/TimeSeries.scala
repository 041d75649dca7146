package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer time-series aggregates over event streams — the
  * utilization/engagement metrics an event warehouse reports daily:
  * time-weighted value sums (billing: "value held × seconds held"),
  * merged interval coverage (SLA: "seconds with ≥ 1 active session"),
  * and consecutive-day streaks (engagement). All arithmetic rides
  * exact microsecond/day longs (`unix_micros`, day numbers), so every
  * report restates verbatim in SQL — no float durations anywhere.
  *
  * Scale shape: each metric is one key-partitioned window pass (the
  * per-key ORDER the semantics demand) plus map-side-combinable
  * aggregates; nothing global, nothing row-scale on the driver. Ties
  * in the order column are broken by the caller-supplied id column so
  * the gap attribution is deterministic in any engine.
  */
object TimeSeries {

  /** Per-key time-weighted value sum: `Σ value_i · (t_{i+1} − t_i)` in
    * value·microseconds, each gap attributed to the EARLIER row (the
    * step-function/TWAP convention; the key's last row holds no gap).
    * Output `(keyCol, n, span_us, twsum)`. */
  def timeWeightedSum(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("id"))
    df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("t"),
        col(idCol).as("id"), col(valueCol).cast("long").as("v"))
      .withColumn("nt", lead(col("t"), 1).over(w))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), (max(col("t")) - min(col("t"))).as("span_us"),
        coalesce(sum(col("v") * (col("nt") - col("t"))), lit(0L))
          .as("twsum"))
      .select(col("k").as(keyCol), col("n"), col("span_us"), col("twsum"))
  }

  /** Per-key union length of (possibly overlapping) intervals
    * `[startCol, endCol)` in microseconds: merged islands via the
    * running-max-of-ends sweep. Output `(keyCol, n_islands,
    * covered_us)`. Adjacent intervals (start == running max) merge —
    * half-open semantics. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String, idCol: String): DataFrame = {
    val order = Seq(col("s"), col("e"), col("id"))
    val wPrev = Window.partitionBy(col("k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"), col(idCol).as("id"))
      .withColumn("rm", max(col("e")).over(wPrev))
      .withColumn("brk",
        when(col("rm").isNull || col("s") > col("rm"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("k"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("cov"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"), sum(col("cov")).as("covered_us"))
      .select(col("k").as(keyCol), col("n_islands"), col("covered_us"))
  }

  /** Per-key consecutive-day streaks over `(keyCol, dayCol)` activity
    * (duplicates collapse): `(keyCol, n_streaks, longest, n_days)` via
    * the day − row_number island trick. */
  def dayStreaks(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    df.select(col(keyCol).as("k"), col(dayCol).cast("long").as("day"))
      .distinct()
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("k"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
        sum(col("len")).as("n_days"))
      .select(col("k").as(keyCol), col("n_streaks"), col("longest"),
        col("n_days"))
  }
}
