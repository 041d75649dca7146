package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification + fill-forward — the resample step every
  * metrics/feature pipeline runs before a model sees per-entity series:
  * an entity with no events on a day must appear as an explicit zero/
  * carried row, or downstream aggregates silently treat absence as
  * missing-at-random. The reference's incremental loads leave gaps by
  * construction (only changed keys arrive); this operator rebuilds the
  * dense per-key grid.
  *
  * Buckets are LONGS (the caller buckets timestamps — days since epoch,
  * hours, window ids), so densification is integer `sequence` generation
  * with no calendar semantics to drift between engines.
  *
  * Scale shape: the per-key span comes from one map-side-combinable
  * `groupBy(key).agg(min, max)` (key-cardinality result); the grid is its
  * `sequence`-explode — each key fans out to (span/step + 1) narrow rows,
  * bounded by the retention window, never by the event count (a bot key
  * with 10⁸ events densifies to the same ≤ span rows as a quiet one).
  * The grid left-joins the observed buckets on (key, bucket) — an
  * equi-join, shuffle-partitioned on the same key both sides. Fill-forward
  * is a `last(ignoreNulls)` running window PER KEY over the DENSIFIED
  * frame, so its partition size is the bounded grid span, not the raw
  * row count — the only window discipline under which per-key windows
  * survive 100 TB.
  */
object GapFill {

  /** One row per key per `step` between that key's min and max observed
    * bucket; unobserved buckets carry the observed frame's columns as
    * null. Keys never observed don't appear (there is no span to fill);
    * null keys are keys like any other (null-safe join — their observed
    * payloads survive onto the grid). With `step > 1` the OUTPUT IS THE
    * GRID: observed buckets off the stride (including possibly the
    * key's max) do not appear — stride semantics are a resample, not a
    * superset; pre-bucket to the stride if every observation must
    * survive. */
  def densify(df: DataFrame, keyCols: Seq[String], bucketCol: String,
              step: Long = 1L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(step > 0, "step must be positive")
    // A null bucket has no place on a min/max grid: min/max would skip
    // it and the === grid join would drop its payload SILENTLY. Fail
    // loudly instead — the check rides the row path (no extra action),
    // codegen'd, and can't be pruned because the bucket feeds both the
    // span agg and the grid join.
    val src = df.withColumn(bucketCol,
      when(col(bucketCol).isNotNull, col(bucketCol))
        .otherwise(raise_error(lit(
          s"densify: null $bucketCol — null buckets cannot be gridded; " +
            "filter or default them before densify"))))
    val keys = keyCols.map(col)
    val spans = src.groupBy(keys: _*)
      .agg(min(col(bucketCol)).as("_lo"), max(col(bucketCol)).as("_hi"))
    val grid = spans.select(keys :+
      explode(sequence(col("_lo"), col("_hi"), lit(step))).as(bucketCol): _*)
    // null-safe on the keys (a null cohort's payloads must not be
    // silently nulled off the grid); the bucket itself is never null
    // (checked above, and the grid carries only min/max spans).
    // Aliased explicitly: the grid derives from the same frame, so
    // bare column refs would be ambiguous.
    val g = grid.alias("_gf_grid")
    val o = src.alias("_gf_obs")
    val cond = (keyCols.map(c =>
      col(s"_gf_grid.$c") <=> col(s"_gf_obs.$c")) :+
      (col(s"_gf_grid.$bucketCol") === col(s"_gf_obs.$bucketCol")))
      .reduce(_ && _)
    g.join(o, cond, "left")
      .select((keyCols :+ bucketCol).map(c => col(s"_gf_grid.$c")) ++
        df.columns.filterNot((keyCols :+ bucketCol).contains)
          .map(c => col(s"_gf_obs.$c")): _*)
  }

  /** Carry the last non-null value of each `fillCols` forward along
    * `orderCol` within each key — run AFTER [[densify]] so gap rows
    * inherit the most recent observation. Leading nulls (no prior
    * observation) stay null. */
  def fillForward(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
