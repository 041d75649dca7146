package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming EXACT distinct-count maintenance —
  * [[graft.functions.Bitmap]]'s bucket words as STREAMING STATE: the
  * per-group distinct-user count stays exact while ingestion runs,
  * because the OR-monoid is idempotent (a replayed or duplicated event
  * sets a bit that is already set). The exact sibling of the HLL-based
  * monitors for machine-bounded id domains; state is one long per
  * touched (group, bucket) — domain/63 words per group at worst, and
  * only TOUCHED buckets ever materialize.
  *
  * Emission is one row per UPDATED (group, bucket) per batch,
  * batch_id-keyed with the [[IncrementalIngest]] overwrite discipline;
  * a word is a pure set function of everything ingested, so the
  * standing words are IDENTICAL to a one-shot batch
  * [[graft.functions.Bitmap.bitmaps]] — the q258 gate invariant. */
object StreamBitmap {

  /** Drain `sourcePath` with AvailableNow semantics, OR-folding each
    * batch's values into per-(group, bucket) words. Values must be
    * non-negative longs (the [[graft.functions.Bitmap]] contract). */
  def runAvailableNow(spark: SparkSession, sourcePath: String,
                      schema: StructType, groupCol: String,
                      valueCol: String, sinkPath: String,
                      checkpointPath: String,
                      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    val cells = StreamWaves.reader(spark, schema, sourcePath, maxFilesPerTrigger)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      // mirror the batch Bitmap.bitmaps contract: a negative id would
      // silently produce a negative bucket and a negative shift count,
      // diverging the maintained state from the batch invariant
      .select(col("g"),
        when(col("v") >= 0, col("v")).otherwise(raise_error(lit(
          s"StreamBitmap: negative $valueCol has no bit — offset the " +
            "domain first"))).as("v"))
      .select(col("g"), expr("v div 63").as("bucket"),
        expr("shiftleft(cast(1 as bigint), cast(v % 63 as int))").as("b"))
      .as[(String, Long, Long)]
    val updates = cells.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), rows: Iterator[(String, Long, Long)],
         state: GroupState[Long]) =>
          var bits = state.getOption.getOrElse(0L)
          rows.foreach { case (_, _, b) => bits |= b }
          state.update(bits)
          Iterator.single((key._1, key._2, bits))
      }
      .toDF("g", "bucket", "bits")
    val query = updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$sinkPath/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** The standing words: each (group, bucket)'s newest batch row —
    * shaped like [[graft.functions.Bitmap.bitmaps]] output. */
  def currentBitmap(spark: SparkSession, sinkPath: String): DataFrame = {
    val sink = spark.read.parquet(sinkPath)
    val latest = sink.groupBy(col("g").as("_lg"), col("bucket").as("_lb"))
      .agg(max(col("batch_id")).as("_lbid"))
    sink.join(latest, col("g") === col("_lg") &&
        col("bucket") === col("_lb") && col("batch_id") === col("_lbid"))
      .select(col("g"), col("bucket"), col("bits"))
  }
}
