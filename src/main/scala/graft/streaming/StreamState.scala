package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared batch_id-keyed state reads for the foreachBatch incremental
  * runners ([[StreamNearDup]], [[StreamFuzzyDedup]]): standing state is a
  * directory of `batch_id=N/` parquet partitions, each written atomically
  * in overwrite mode, so replaying a batch overwrites its own partitions
  * and recomputes the identical result. */
object StreamState {

  /** Run `body` with `spark.sql.shuffle.partitions` = `n`, restoring the
    * previous value after. This is the streaming STATE-LAYOUT knob: a
    * stateful query carries one state store per shuffle partition per
    * stateful operator (four per partition per side for a stream-stream
    * join), each committing delta/snapshot files every micro-batch, so
    * partition count is pure per-batch file-IO overhead until state
    * actually outgrows it — the q205 measurement (33.6 s → 11.5 s at 8
    * partitions, while 10× data moved the 32-partition run by −12%) is
    * the family-wide shape. The count bakes into the checkpoint at first
    * start (Scd2Stream's adaptive-bucket contract); size it from expected
    * CONCURRENT state rows, not input size. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    require(n > 0, "withStatePartitions: n must be positive")
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, saved)
  }

  /** The standing state excluding the current batch's own directories —
    * a replayed batch must not probe (or anti-join) against its previous
    * attempt's output. */
  def readExcluding(spark: SparkSession, path: String, batchId: Long,
                    empty: StructType): DataFrame =
    readExcludingKeepBatchId(spark, path, batchId, empty).drop("batch_id")

  /** [[readExcluding]] with the `batch_id` partition column retained —
    * for runners whose state resolution needs it (e.g. [[FunnelStream]]'s
    * latest-batch-wins `max_by`). The empty fallback carries no batch_id
    * column (nothing to resolve). */
  def readExcludingKeepBatchId(spark: SparkSession, path: String,
                               batchId: Long, empty: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(
        _.getPath.getName.startsWith("batch_id=")))
      spark.read.parquet(path).filter(col("batch_id") =!= batchId)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
  }
}
