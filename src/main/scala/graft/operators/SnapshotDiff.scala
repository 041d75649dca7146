package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning audit between two
  * materializations of the same table: which rows appeared, vanished, or
  * changed content between version N and N+1. A training-data pipeline
  * runs this before promoting a refreshed corpus (how much churn did the
  * new crawl/filter pass introduce?) and after a backfill (did anything
  * outside the target partition move?).
  *
  * Scale shape: NO join. Each side contributes one narrow row
  * (id, side-tagged fingerprint); a single hash aggregation on the id key
  * compares the sides. The fingerprint is md5 over the compared columns,
  * so wide rows never shuffle — at 100 TB the exchange carries ~50 bytes
  * per row regardless of document size. A full-outer-join formulation
  * would shuffle both whole tables AND sort-merge them; this is one
  * map-side-combinable aggregate.
  *
  * Reference scope: the reference's closest surface is full-load vs
  * incremental reconciliation by row count (`utilities/utilities.py:69-82`);
  * row-level churn classification is beyond-reference.
  */
object SnapshotDiff {

  // \u0001 column separator: ("ab","c") and ("a","bc") must fingerprint
  // differently (concat_ws also skips nulls - a null and an empty string
  // collide, acceptable for churn classification)
  private val Sep = "\u0001"

  /** Row-level diff: one row per id present in either snapshot, with
    * `status` ∈ added | removed | changed | unchanged. `compareCols` are
    * the content columns (fingerprinted with md5; ids must be unique per
    * side). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def tagged(df: DataFrame, side: Int): DataFrame =
      df.select(col(idCol),
        md5(concat_ws(Sep, compareCols.map(c => col(c).cast("string")): _*))
          .as("_fp"),
        lit(side).as("_side"))
    tagged(oldDf, 0).unionByName(tagged(newDf, 1))
      .groupBy(col(idCol))
      .agg(max(when(col("_side") === 0, col("_fp"))).as("_old"),
        max(when(col("_side") === 1, col("_fp"))).as("_new"))
      .withColumn("status",
        when(col("_old").isNull, lit("added"))
          .when(col("_new").isNull, lit("removed"))
          .when(col("_old") === col("_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"))
  }

  /** Churn summary: row counts per status (the number a release gate
    * thresholds on). */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
              compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))

  /** MINIMAL CDC patch from `oldDf` to `newDf`: one row per added /
    * changed / removed id — `(id, op, payloadCols…)`, payload taken from
    * the NEW snapshot (null payload on removed rows). Unchanged rows are
    * NOT in the patch; shipping the patch instead of the snapshot is the
    * 100 TB release mechanic (churn-sized transfer, not corpus-sized).
    * [[applyPatch]] replays it; round-trip pinned by SnapshotDiffSpec and
    * q161. */
  def patch(oldDf: DataFrame, newDf: DataFrame, idCol: String,
            compareCols: Seq[String],
            payloadCols: Seq[String]): DataFrame = {
    val d = diff(oldDf, newDf, idCol, compareCols)
      .filter(col("status") =!= "unchanged")
      .withColumnRenamed("status", "op")
    d.join(newDf.select(col(idCol) +: payloadCols.map(col): _*),
        Seq(idCol), "left")
      .select(col(idCol) +: col("op") +: payloadCols.map(col): _*)
  }

  /** Replay a [[patch]] onto the OLD snapshot: patched ids leave the old
    * frame (their op decides whether a new payload re-enters), everything
    * else carries through — the result row-equals the new snapshot the
    * patch was cut from. One anti-join + one union; the patch is
    * churn-sized, so broadcast-friendly under AQE. */
  def applyPatch(oldDf: DataFrame, patchDf: DataFrame, idCol: String,
                 payloadCols: Seq[String]): DataFrame = {
    val oldKept = oldDf.select(col(idCol) +: payloadCols.map(col): _*)
      .join(patchDf.select(col(idCol)), Seq(idCol), "left_anti")
    val incoming = patchDf.filter(col("op") =!= "removed")
      .select(col(idCol) +: payloadCols.map(col): _*)
    oldKept.unionByName(incoming)
  }
}
