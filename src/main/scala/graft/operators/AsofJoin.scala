package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join: for every left row, attach the LATEST right row
  * with the same key and `ts' <= ts` (inclusive) — quotes-to-trades,
  * rate-to-transaction, config-version-to-event alignment.
  *
  * Spark has no native ASOF JOIN; the naive formulation
  * (`l.join(r, key && r.ts <= l.ts)` + keep-latest) explodes to every
  * historical pair per left row before pruning — quadratic per key.
  * This operator is the scale-correct restatement: union both sides
  * tagged, sort once per key by (ts, side), and fill the right-side
  * payload forward with `last(_, ignoreNulls)` over rows-unbounded-
  * preceding. ONE shuffle on the key and linear work per key. Note that a
  * window exchange is NOT covered by AQE skew splitting (that applies to
  * join/rebalance partitions only): a pathologically hot key's whole
  * history sorts and fills in one task — pre-bucket the inputs by key, or
  * salt the key and seed each salt partition with the latest right row
  * before its first left row. Right rows must be unique per (key, ts) —
  * pre-aggregate ambiguous duplicates (the same contract DuckDB's ASOF
  * JOIN assumes).
  */
object AsofJoin {

  /** Left rows + `payload` columns carried from the latest right row at or
    * before the left timestamp (null when no such row exists).
    *
    * @param left     probe side (kept verbatim)
    * @param right    reference side: key, ts, payload columns
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    event-time column name (present on both sides)
    * @param payload  right-side columns to carry (must not clash with left)
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            tsCol: String, payload: Seq[String]): DataFrame = {
    val sideCol = "_graft_asof_side"
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE left rows at the same ts, so `<=` is inclusive
    val taggedRight = right.select(
      (keys :+ tsCol).map(col) ++ payload.map(col) :+ lit(0).as(sideCol): _*)
    val taggedLeft = left.select(
      (keys :+ tsCol).map(col) ++
        leftCols.filterNot((keys :+ tsCol).contains).map(col) :+
        lit(1).as(sideCol): _*)
    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
