package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew audit — the measurement step BEFORE the mitigation steps this
  * library already ships (salting in q47, AQE skew joins, the agg-based
  * LSH caps). At 100 TB you don't guess which join key is hot: you run
  * this report on the key column and read off the hottest keys, their
  * share of the table, the ratio to a perfectly uniform key, and the salt
  * factor that would bring each under a target per-task row count.
  *
  * Scale shape: one partially-aggregating shuffle keyed by the audited
  * key (the hottest key crosses the wire once per input partition); the
  * per-key count frame is localCheckpointed because totals and top-k both
  * consume it (one scan serves the diamond), and the 1-row totals frame
  * broadcasts onto the k survivors. No window, no driver data.
  */
object SkewAudit {

  /** Top-`k` keys by row count with share, uniform-ratio, and the salt
    * factor for `targetRowsPerTask`. Output ordered (cnt DESC, keys) —
    * a total order, so the report is deterministic under ties. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String], k: Int = 20,
                    targetRowsPerTask: Long = 4L << 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkewReport: need at least one key column")
    require(k >= 1 && targetRowsPerTask >= 1,
      s"keySkewReport: need k >= 1 and targetRowsPerTask >= 1")
    val keys = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // totals + top-k both read it; one scan, no residue
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.orderBy((col("cnt").desc +: keys.map(_.asc)): _*).limit(k)
      .crossJoin(broadcast(totals)) // 1-row aggregate frame
      .select(keys ++ Seq(
        col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        (col("cnt").cast("double") * col("n_keys").cast("double") /
          col("total").cast("double")).as("skew_ratio"),
        ceil(col("cnt").cast("double") / lit(targetRowsPerTask.toDouble))
          .cast("long").as("salt_factor")): _*)
      .orderBy((col("cnt").desc +: keys.map(_.asc)): _*)
  }
}
