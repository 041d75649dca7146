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
}
