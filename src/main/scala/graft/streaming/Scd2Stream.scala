package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Scd2

/** Streaming SCD2 maintenance — the live-warehouse counterpart of
  * [[graft.operators.Scd2.merge]]: change events arriving on a stream fold
  * into a standing type-2 history, each micro-batch re-compacting ONLY the
  * affected keys' current rows (closed history passes through untouched),
  * so the incremental cost is proportional to the batch, not the
  * dimension.
  *
  * State layout under `statePath`: one complete history SNAPSHOT per
  * micro-batch, `snap/batch_id=N/`, written in overwrite mode. Batch N
  * merges against the LATEST snapshot with id < N, so a replayed batch
  * (failure between state write and checkpoint commit) re-reads its
  * original input state and overwrites its own partition — exactly-once
  * output from at-least-once delivery, the [[IncrementalIngest]]
  * discipline. Old snapshots are superseded, never read again; a real
  * deployment prunes them the way [[IncrementalIngest.compact]] does.
  *
  * Ordering contract (same as [[Scd2.merge]]): a batch's events must be
  * at-or-after each key's current `valid_from` — closed versions are
  * immutable. Event-time-ordered landing (the extract-by-watermark
  * pattern, SURVEY §2.11) satisfies this.
  */
object Scd2Stream {

  /** Drain `sourcePath` with AvailableNow, folding each micro-batch into
    * the standing SCD2 snapshot chain. Returns the number of micro-batches
    * this run processed. */
  def runAvailableNow(spark: SparkSession, sourcePath: String,
                      schema: StructType, keyCols: Seq[String], tsCol: String,
                      attrCols: Seq[String], tieCols: Seq[String],
                      statePath: String, checkpointPath: String): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = spark.readStream.schema(schema).parquet(sourcePath)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nBatches.incrementAndGet()
        val session = batch.sparkSession
        val hist = latestSnapshotBefore(session, s"$statePath/snap", batchId)
          match {
            case Some(prior) =>
              Scd2.merge(prior, batch, keyCols, tsCol, attrCols, tieCols)
            case None =>
              Scd2.fromChangeLog(batch, keyCols, tsCol, attrCols, tieCols)
          }
        hist.write.mode("overwrite")
          .parquet(s"$statePath/snap/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    nBatches.get()
  }

  /** Streaming fact ENRICHMENT against the evolving dimension — the
    * warehouse fact-loader loop: each micro-batch first folds into the
    * standing SCD2 snapshot chain (exactly as [[runAvailableNow]]), then
    * the SAME batch's rows join the just-updated history point-in-time
    * ([[Scd2.pointInTime]]) and land in a batch-id-keyed enriched-fact
    * sink. Because a version's identity depends only on observations at
    * or before a fact's timestamp, enriching wave N against the
    * waves-≤-N history yields EXACTLY what a full-history batch join
    * would — the q164 gate states that equivalence against the q156
    * oracle. Replay-safe on both sinks (overwrite-own-batch).
    *
    * `factCols` are the batch columns carried into the enriched sink
    * (must include the key and ts columns). Returns the number of
    * micro-batches processed. */
  def runEnrichAvailableNow(spark: SparkSession, sourcePath: String,
                            schema: StructType, keyCols: Seq[String],
                            tsCol: String, attrCols: Seq[String],
                            tieCols: Seq[String], factCols: Seq[String],
                            statePath: String, checkpointPath: String,
                            bucketSeconds: Long = 86400L): Long = {
    import org.apache.spark.sql.functions.col
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = spark.readStream.schema(schema).parquet(sourcePath)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nBatches.incrementAndGet()
        val session = batch.sparkSession
        val hist = latestSnapshotBefore(session, s"$statePath/snap", batchId)
          match {
            case Some(prior) =>
              Scd2.merge(prior, batch, keyCols, tsCol, attrCols, tieCols)
            case None =>
              Scd2.fromChangeLog(batch, keyCols, tsCol, attrCols, tieCols)
          }
        // materialize the new snapshot FIRST, then enrich from the
        // written copy — one computation of the merge, two consumers
        hist.write.mode("overwrite")
          .parquet(s"$statePath/snap/batch_id=$batchId")
        val snap = session.read.parquet(s"$statePath/snap/batch_id=$batchId")
        val dim = snap.select(
          (keyCols.map(col) :+ col("valid_from") :+ col("valid_to") :+
            col("version")) ++
            attrCols.map(a => col(a).as(s"${a}_at_time")): _*)
        Scd2.pointInTime(batch.select(factCols.map(col): _*), dim,
            keyCols, tsCol, bucketSeconds,
            dimCols = attrCols.map(a => s"${a}_at_time"))
          .write.mode("overwrite")
          .parquet(s"$statePath/enriched/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    nBatches.get()
  }

  /** The standing history: the latest snapshot (any batch id). */
  def currentHistory(spark: SparkSession, statePath: String): DataFrame =
    latestSnapshotBefore(spark, s"$statePath/snap", Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"Scd2Stream: no snapshot under $statePath/snap"))

  /** Latest `batch_id=N` snapshot with N < `batchId`, if any — a replayed
    * batch must merge against its ORIGINAL input state, never its own
    * previous attempt's output. */
  private def latestSnapshotBefore(spark: SparkSession, snapPath: String,
                                   batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(snapPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val ids = fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
      .filter(_ < batchId)
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$snapPath/batch_id=${ids.max}"))
  }
}
