package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction for the latest-per-key monitor sinks ([[StreamSketch]],
  * [[StreamBitmap]], [[StreamQuantile]], [[StreamComponents]]): their
  * `current*` readers resolve each key's newest `batch_id` row, which
  * stays correct forever but scans one parquet directory per batch
  * elapsed — a long-lived monitor accumulates directories without
  * bound. This folds all-but-the-newest batch directories into a
  * single `batch_id=-1` snapshot holding ONLY each key's newest rows,
  * so the serving scan is bounded by the state size (sketch cells,
  * bitmap words, sketch entries, cluster assignment) plus one live
  * batch, not by batches elapsed.
  *
  * `keyCols` must match the reader's resolution granularity: per CELL
  * for [[StreamSketch]] (`depth, bucket`) and [[StreamBitmap]]
  * (`g, bucket`), per GROUP for [[StreamQuantile]] (`g` — the whole
  * sketch rides each emission, and an evicted value's row must die
  * with the batch that last carried it), per id for
  * [[StreamComponents]]. "Newest" keeps ALL rows of the key's maximal
  * batch, which for one-row-per-key-per-batch sinks is the newest row.
  *
  * Replay safety (the [[IncrementalIngest.compact]] argument): the
  * highest live batch directory is never absorbed — if that batch's
  * checkpoint didn't commit, its replay rewrites the same directory,
  * and `-1` sorting below every live id keeps the readers' newest-wins
  * resolution correct through the rewrite. Serving results are
  * IDENTICAL before and after compaction at any point between drains,
  * and through a crash at ANY point in the snapshot swap (the
  * retire → land → delete rename protocol with startup self-heal,
  * shared with [[FunnelStream.compact]] / [[Scd2Stream.compact]]).
  */
object StreamSinkCompact {

  def compactLatest(spark: SparkSession, path: String,
                    keyCols: Seq[String], numFiles: Int = 1): Unit = {
    require(keyCols.nonEmpty, "compactLatest needs at least one key column")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val prior = new org.apache.hadoop.fs.Path(p, "batch_id=-1")
    val retired = new org.apache.hadoop.fs.Path(path + "_retired")
    // self-heal a crash between the two swap renames below (the
    // FunnelStream/Scd2Stream protocol): the retired snapshot still
    // exists and the new one never landed — restore it; the absorbed
    // dirs were not yet deleted, so serving stays identical
    if (!fs.exists(prior) && fs.exists(retired))
      require(fs.rename(retired, prior),
        s"compactLatest: could not restore $retired to $prior")
    val live = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id=") &&
        s.getPath.getName != "batch_id=-1")
      .map(s => s.getPath.getName.stripPrefix("batch_id=").toLong -> s.getPath)
      .sortBy(_._1)
    // the newest live batch may be an uncommitted replay candidate — keep it
    val absorb = live.dropRight(1).map(_._2)
    if (absorb.isEmpty) return
    val sources = (if (fs.exists(prior)) Seq(prior) else Nil) ++ absorb
    // basePath keeps the batch_id partition column so newest-wins
    // resolution runs across the absorbed set (prior counts as oldest)
    val folded = spark.read.option("basePath", path)
      .parquet(sources.map(_.toString): _*)
    val latest = folded.groupBy(keyCols.map(k => col(k).as(s"_ck_$k")): _*)
      .agg(max(col("batch_id")).as("_graft_cb"))
    val snapshot = folded.join(latest,
        keyCols.map(k => col(k) === col(s"_ck_$k"))
          .reduce(_ && _) && col("batch_id") === col("_graft_cb"))
      .select(folded.columns.filter(_ != "batch_id").map(col): _*)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    snapshot.coalesce(numFiles).write.mode("overwrite").parquet(tmp.toString)
    // swap, never leaving a window where the prior snapshot's rows are
    // gone but the new one hasn't landed (a crash there would lose
    // every row whose source batch dirs earlier compactions removed):
    // retire the old snapshot, land the new one, only then drop
    // retired + absorbed. Hadoop rename reports failure by RETURNING
    // false — unchecked, a failed landing would delete the absorbed
    // dirs and lose state.
    if (fs.exists(retired)) fs.delete(retired, true)
    if (fs.exists(prior))
      require(fs.rename(prior, retired),
        s"compactLatest: could not retire $prior")
    if (!fs.rename(tmp, prior)) {
      if (fs.exists(retired)) fs.rename(retired, prior) // roll back
      throw new java.io.IOException(
        s"compactLatest: could not publish $tmp to $prior")
    }
    fs.delete(retired, true)
    absorb.foreach(fs.delete(_, true))
  }
}
