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

  /** Column-attributed churn: [[summary]]'s row accounting PLUS one
    * `changed:<col>` count per compared column — WHICH column drove the
    * churn (the release-gate follow-up question: 9 % changed rows is
    * fine if it's all `last_seen_ts`, alarming if it's `text`). A row
    * with several changed columns counts once in `changed` and once
    * per column, so the per-column counts may sum past the row count.
    *
    * Same no-join scale shape as [[diff]], one fingerprint per column
    * instead of one per row: the exchange carries id + C narrow md5s,
    * then a second global aggregate folds the boolean flags — both
    * map-side combinable, no shuffle of content. Presence is tracked
    * separately from the fingerprints, so a NULL value (null
    * fingerprint) in a present row never reads as an absent row, and
    * null→null compares unchanged while null→value counts. */
  def columnChurn(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def tagged(df: DataFrame, side: Int): DataFrame =
      df.select(col(idCol) +: lit(side).as("_side") +:
        compareCols.map(c => md5(col(c).cast("string")).as(s"_fp_$c")): _*)
    val perId = tagged(oldDf, 0).unionByName(tagged(newDf, 1))
      .groupBy(col(idCol))
      .agg(max(when(col("_side") === 0, 1)).as("_in_old"),
        max(when(col("_side") === 1, 1)).as("_in_new") +:
          compareCols.flatMap(c => Seq(
            max(when(col("_side") === 0, col(s"_fp_$c"))).as(s"_o_$c"),
            max(when(col("_side") === 1, col(s"_fp_$c"))).as(s"_n_$c"))): _*)
    val both = col("_in_old").isNotNull && col("_in_new").isNotNull
    val colChanged = compareCols.map(c =>
      both && !(col(s"_o_$c") <=> col(s"_n_$c")))
    val anyChanged = colChanged.reduce(_ || _)
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val agg = perId.agg(
      cnt(col("_in_old").isNull && col("_in_new").isNotNull).as("added"),
      Seq(cnt(col("_in_old").isNotNull && col("_in_new").isNull)
          .as("removed"),
        cnt(anyChanged).as("changed"),
        cnt(both && !anyChanged).as("unchanged")) ++
        compareCols.zip(colChanged).map { case (c, ch) =>
          cnt(ch).as(s"changed:$c")
        }: _*)
    val metrics = agg.columns
    agg.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(s"`$m`").as("n"))).toIndexedSeq: _*))
        .as("kv"))
      .select(col("kv.metric"), col("kv.n"))
  }

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
