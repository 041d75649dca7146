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
