package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Scd2

/** Streaming SCD2 maintenance — the live-warehouse counterpart of
  * [[graft.operators.Scd2.merge]]: change events arriving on a stream fold
  * into a standing type-2 history, each micro-batch re-compacting ONLY the
  * affected keys' current rows (closed history passes through untouched),
  * so the incremental cost is proportional to the batch, not the
  * dimension — in COMPUTE and in I/O.
  *
  * State layout under `statePath`: the snapshot is partitioned into
  * `nBuckets` key-hash buckets, and each micro-batch writes ONLY the
  * buckets its keys hash into, as a delta directory
  * `snap/batch_id=N/_gbucket=B/`. A per-batch MANIFEST
  * (`manifests/manifest_N`, the complete bucket → latest-batch map after
  * batch N) names where every bucket's current version lives, so reading
  * the standing history never lists the batch chain and untouched buckets
  * are never rewritten: a 1 TB dimension receiving a 1 GB batch performs
  * ~1 GB of snapshot I/O, not 1 TB (the partition-pruned MERGE discipline
  * of [[graft.plans.MergeInto]]).
  *
  * Replay safety: batch N merges against the latest manifest with id < N,
  * so a replayed batch (failure between state write and checkpoint commit)
  * re-reads its original input state and overwrites its own delta + its
  * own manifest — exactly-once output from at-least-once delivery, the
  * [[IncrementalIngest]] discipline. Superseded bucket versions accumulate
  * until [[compact]] folds them into the `batch_id=-1` base.
  *
  * Ordering contract (same as [[Scd2.merge]]): a batch's events must be
  * at-or-after each key's current `valid_from` — closed versions are
  * immutable. Event-time-ordered landing (the extract-by-watermark
  * pattern, SURVEY §2.11) satisfies this.
  */
object Scd2Stream {

  /** Default key-hash bucket count: wide enough that a typical batch
    * touches a small fraction of a large dimension, narrow enough that
    * bucket files stay right-sized at warehouse scale. */
  val DefaultBuckets: Int = 256

  private val BucketCol = "_gbucket"

  private def bucketOf(keyCols: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets)).cast("int")

  /** Drain `sourcePath` with AvailableNow, folding each micro-batch into
    * the standing bucketed SCD2 snapshot. Returns the number of
    * micro-batches this run processed. */
  def runAvailableNow(spark: SparkSession, sourcePath: String,
                      schema: StructType, keyCols: Seq[String], tsCol: String,
                      attrCols: Seq[String], tieCols: Seq[String],
                      statePath: String, checkpointPath: String,
                      nBuckets: Int = DefaultBuckets): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = spark.readStream.schema(schema).parquet(sourcePath)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nBatches.incrementAndGet()
        foldBatch(batch, batchId, keyCols, tsCol, attrCols, tieCols,
          statePath, nBuckets)
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
    * standing snapshot (exactly as [[runAvailableNow]]), then the SAME
    * batch's rows join the just-updated history point-in-time
    * ([[Scd2.pointInTime]]) and land in a batch-id-keyed enriched-fact
    * sink. The dimension side of the join reads ONLY the batch's own
    * affected buckets — every fact key hashes into one of them by
    * construction. Because a version's identity depends only on
    * observations at or before a fact's timestamp, enriching wave N
    * against the waves-≤-N history yields EXACTLY what a full-history
    * batch join would — the q164 gate states that equivalence against the
    * q156 oracle. Replay-safe on both sinks (overwrite-own-batch).
    *
    * `factCols` are the batch columns carried into the enriched sink
    * (must include the key and ts columns). Returns the number of
    * micro-batches processed. */
  def runEnrichAvailableNow(spark: SparkSession, sourcePath: String,
                            schema: StructType, keyCols: Seq[String],
                            tsCol: String, attrCols: Seq[String],
                            tieCols: Seq[String], factCols: Seq[String],
                            statePath: String, checkpointPath: String,
                            bucketSeconds: Long = 86400L,
                            nBuckets: Int = DefaultBuckets): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = spark.readStream.schema(schema).parquet(sourcePath)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nBatches.incrementAndGet()
        val session = batch.sparkSession
        val affected = foldBatch(batch, batchId, keyCols, tsCol, attrCols,
          tieCols, statePath, nBuckets)
        if (affected.nonEmpty) {
          // enrich from the WRITTEN delta — one computation of the merge,
          // and only the batch's own buckets are read back
          val snap = session.read.parquet(affected.map(b =>
            s"$statePath/snap/batch_id=$batchId/$BucketCol=$b"): _*)
          val dim = snap.select(
            (keyCols.map(col) :+ col("valid_from") :+ col("valid_to") :+
              col("version")) ++
              attrCols.map(a => col(a).as(s"${a}_at_time")): _*)
          Scd2.pointInTime(batch.select(factCols.map(col): _*), dim,
              keyCols, tsCol, bucketSeconds,
              dimCols = attrCols.map(a => s"${a}_at_time"))
            .write.mode("overwrite")
            .parquet(s"$statePath/enriched/batch_id=$batchId")
        }
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    nBatches.get()
  }

  /** Merge one micro-batch into the bucketed snapshot: read ONLY the
    * affected buckets' current versions, re-compact them with the batch,
    * write the result as this batch's delta, and publish the updated
    * bucket map as this batch's manifest. Returns the affected bucket
    * ids (empty for an empty batch — nothing written, manifest carried
    * forward unchanged). */
  private def foldBatch(batch: DataFrame, batchId: Long,
                        keyCols: Seq[String], tsCol: String,
                        attrCols: Seq[String], tieCols: Seq[String],
                        statePath: String, nBuckets: Int): Seq[Int] = {
    val session = batch.sparkSession
    val snapRoot = s"$statePath/snap"
    val maniRoot = s"$statePath/manifests"
    val priorMap = latestManifestBefore(session, maniRoot, batchId)
      .getOrElse(Map.empty[Int, Long])
    // ≤ nBuckets rows — driver-bounded by construction
    val affected = batch
      .select(bucketOf(keyCols, nBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val priorPaths = affected.flatMap(b =>
        priorMap.get(b).map(m => s"$snapRoot/batch_id=$m/$BucketCol=$b"))
      val hist =
        if (priorPaths.isEmpty)
          Scd2.fromChangeLog(batch, keyCols, tsCol, attrCols, tieCols)
        else
          Scd2.merge(session.read.parquet(priorPaths: _*), batch,
            keyCols, tsCol, attrCols, tieCols)
      hist.withColumn(BucketCol, bucketOf(keyCols, nBuckets))
        .write.mode("overwrite").partitionBy(BucketCol)
        .parquet(s"$snapRoot/batch_id=$batchId")
    }
    writeManifest(session, maniRoot, batchId,
      priorMap ++ affected.map(_ -> batchId))
    affected
  }

  /** The standing history: every bucket at its latest version, per the
    * newest manifest. */
  def currentHistory(spark: SparkSession, statePath: String): DataFrame = {
    val m = latestManifestBefore(spark, s"$statePath/manifests",
        Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"Scd2Stream: no snapshot under $statePath/snap"))
    if (m.isEmpty)
      throw new IllegalStateException(
        s"Scd2Stream: no snapshot under $statePath/snap")
    spark.read.parquet(m.toSeq.map { case (b, id) =>
      s"$statePath/snap/batch_id=$id/$BucketCol=$b"
    }: _*)
  }

  /** Fold every bucket version SUPERSEDED before the newest batch into
    * the `batch_id=-1` base and drop the absorbed delta directories and
    * stale manifests — the [[IncrementalIngest.compact]] analog. Bounds
    * the snapshot chain's file count across arbitrarily many batches.
    *
    * The NEWEST batch's delta and manifest are never absorbed: if that
    * batch crashed before its checkpoint committed, its replay merges
    * against the latest manifest BELOW it — compaction rewrites that
    * prior manifest to point into the base, so the replay reads the
    * identical rows from the folded location and overwrites its own
    * delta. Run between drains (not concurrently with one) — same
    * offline contract as [[IncrementalIngest.compact]]. */
  def compact(spark: SparkSession, statePath: String): Unit = {
    val snapRoot = s"$statePath/snap"
    val maniRoot = s"$statePath/manifests"
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ids = manifestIds(spark, maniRoot)
    if (ids.size < 2) return // nothing superseded below the newest batch
    val newest = ids.max
    val priorId = ids.filter(_ < newest).max
    val mapPrior = readManifest(spark, maniRoot, priorId)
    val mapNewest = readManifest(spark, maniRoot, newest)
    // fold the pre-newest state into the base (skip buckets already there)
    val foldPaths = mapPrior.toSeq.filter(_._2 != -1L).map { case (b, id) =>
      s"$snapRoot/batch_id=$id/$BucketCol=$b"
    }
    if (foldPaths.nonEmpty) {
      val tmp = new Path(s"$snapRoot/_compacting")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // basePath retains the bucket partition column for the re-write;
      // carry already-based buckets forward so the base stays complete
      val basedPaths = mapPrior.toSeq.filter(_._2 == -1L).map { case (b, _) =>
        s"$snapRoot/batch_id=-1/$BucketCol=$b"
      }
      spark.read.option("basePath", snapRoot)
        .parquet((foldPaths ++ basedPaths): _*)
        .drop("batch_id")
        .write.mode("overwrite").partitionBy(BucketCol)
        .parquet(tmp.toString)
      val base = new Path(s"$snapRoot/batch_id=-1")
      if (fs.exists(base)) fs.delete(base, true)
      fs.rename(tmp, base)
    }
    // republish: the pre-newest state lives wholly in the base; the
    // newest batch's own buckets stay in its delta
    writeManifest(spark, maniRoot, priorId, mapPrior.map { case (b, _) =>
      b -> -1L
    })
    writeManifest(spark, maniRoot, newest, mapNewest.map { case (b, id) =>
      b -> (if (id == newest) newest else -1L)
    })
    // drop stale manifests and every absorbed delta directory
    ids.filterNot(id => id == newest || id == priorId)
      .foreach(id => fs.delete(new Path(s"$maniRoot/manifest_$id"), false))
    val live = Set(-1L, newest)
    val snapP = new Path(snapRoot)
    if (fs.exists(snapP)) fs.listStatus(snapP)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(s => s.getPath.getName.stripPrefix("batch_id=").toLong -> s.getPath)
      .filterNot { case (id, _) => live.contains(id) }
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Newest `manifest_M` with M < `batchId`, parsed — a replayed batch
    * must merge against its ORIGINAL input state, never its own previous
    * attempt's output. One flat listing of small manifest files (pruned
    * by [[compact]] to two), never an enumeration of the batch chain. */
  private def latestManifestBefore(spark: SparkSession, maniRoot: String,
                                   batchId: Long): Option[Map[Int, Long]] = {
    val ids = manifestIds(spark, maniRoot).filter(_ < batchId)
    if (ids.isEmpty) None
    else Some(readManifest(spark, maniRoot, ids.max))
  }

  private def manifestIds(spark: SparkSession, maniRoot: String): Seq[Long] = {
    val p = new Path(maniRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("manifest_") =>
        n.stripPrefix("manifest_").toLong }
  }

  /** Manifest line format: `bucket,batchId`. Written to a temp name then
    * renamed — readers never observe a partial manifest. */
  private def writeManifest(spark: SparkSession, maniRoot: String,
                            batchId: Long, map: Map[Int, Long]): Unit = {
    val fs = new Path(maniRoot).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(maniRoot))
    val tmp = new Path(s"$maniRoot/.manifest_$batchId.tmp")
    val out = fs.create(tmp, true)
    try out.write(map.toSeq.sorted.map { case (b, id) => s"$b,$id" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(s"$maniRoot/manifest_$batchId")
    if (fs.exists(dst)) fs.delete(dst, false) // replayed batch: own retry
    fs.rename(tmp, dst)
  }

  private def readManifest(spark: SparkSession, maniRoot: String,
                           batchId: Long): Map[Int, Long] = {
    val p = new Path(s"$maniRoot/manifest_$batchId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, id) = l.split(',')
      b.toInt -> id.toLong
    }.toMap
  }
}
