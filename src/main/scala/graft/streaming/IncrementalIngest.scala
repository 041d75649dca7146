package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming restatement of the reference's incremental extract
  * loop (SURVEY.md §2.11): the extraction-history file becomes a history
  * table, the id set-difference becomes a per-batch left-anti join, and the
  * schedule/retry loop becomes a file-source stream with checkpointed
  * offsets. Failed batches are retried by the engine and ids only enter the
  * history after their rows are written — the reference's at-least-once,
  * exactly-once-per-id contract (`datalakewrapper.py:180-195, 286-297`).
  */
object IncrementalIngest {

  /** Run one incremental ingest pass over everything currently in
    * `sourcePath` (Trigger.AvailableNow — the reference's scheduled-batch
    * shape). New files arriving later are picked up by the next run via the
    * checkpoint; rows whose id is already in the history are dropped.
    *
    * At scale: the history table holds only ids (narrow), so the anti-join
    * broadcasts while the history fits and shuffle-joins beyond that; the
    * data path appends partition-parallel with no wide transform.
    */
  def runAvailableNow(spark: SparkSession, sourcePath: String,
                      schema: StructType, idCol: String, sinkPath: String,
                      historyPath: String, checkpointPath: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(sourcePath)
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val session = batch.sparkSession
        val history: DataFrame =
          if (historyExists(session, historyPath))
            session.read.parquet(historyPath)
          else session.createDataFrame(
            session.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(batch.schema.filter(_.name == idCol)))
        val fresh = batch
          .dropDuplicates(idCol)
          .join(history.select(idCol), Seq(idCol), "left_anti")
          .cache()
        try {
          fresh.write.mode("append").parquet(sinkPath)
          fresh.select(idCol).write.mode("append").parquet(historyPath)
        } finally fresh.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  private def historyExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }
}
