package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.Sketches

/** Streaming count-min maintenance — the heavy-hitter serving layer the
  * batch sketches (q93's cells, q101's top-k) get once ingestion never
  * stops: the 4×w cell grid maintained as STREAMING STATE, folded
  * forward on every micro-batch, so "what does this term's frequency
  * look like right now" is a broadcast-join against at most d·w
  * standing rows instead of a rescan of everything ever ingested.
  *
  * State is ONE long per (depth, bucket) cell (`flatMapGroupsWithState`)
  * — bounded by the SKETCH size (≤ d·w entries, ~4096 at the defaults),
  * not by the stream's cardinality; that bound is the entire point of
  * sketched serving. A cell count is a pure set function of every item
  * ingested, so the standing grid is IDENTICAL, register for register,
  * to a one-shot [[Sketches.countMinCells]] over the same rows — the
  * invariant the q225 gate states (and point estimates served off the
  * maintained grid are therefore the batch estimates verbatim). Each
  * item expands to its d cells BEFORE the shuffle, so the per-batch
  * state update is one map-side-combinable count per touched cell.
  * Emission is one row per UPDATED cell per batch, written
  * batch_id-keyed with the [[IncrementalIngest]] overwrite discipline —
  * a replayed batch recomputes identical rows, so restarts never
  * double-count.
  */
object StreamSketch {

  /** Drain `sourcePath` with AvailableNow semantics, folding each
    * batch's items into the standing count-min cells. `itemCol` is
    * hashed exactly as [[Sketches.countMinCells]] does (same depth
    * salt, same md5-derived [[Sketches.hash60]]), so the maintained
    * grid and the batch grid agree cell for cell. */
  def runAvailableNow(spark: SparkSession, sourcePath: String,
                      schema: StructType, itemCol: String,
                      sinkPath: String, checkpointPath: String,
                      d: Int = 4, w: Int = 1024,
                      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import spark.implicits._
    require(d >= 1 && w >= 1, s"need d,w >= 1, got d=$d w=$w")
    val cells = StreamWaves.reader(spark, schema, sourcePath, maxFilesPerTrigger)
      .select(col(itemCol).cast("string").as("_it"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("depth"), col("_it"))
      .withColumn("bucket",
        pmod(Sketches.hash60(concat_ws(":", col("depth"), col("_it"))),
          lit(w.toLong)))
      .select(col("depth").cast("int"), col("bucket")).as[(Int, Long)]
    val updates = cells.groupByKey(identity)
      .flatMapGroupsWithState[Long, (Int, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cell: (Int, Long), rows: Iterator[(Int, Long)],
         state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single((cell._1, cell._2, n))
      }
      .toDF("depth", "bucket", "c")
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

  /** The monitor's standing grid: each cell's row from its LATEST batch
    * (counts are cumulative, so the newest row is the state). Shape
    * matches [[Sketches.countMinCells]] — feed it straight to
    * [[Sketches.countMinEstimate]] to serve point estimates. */
  def currentCells(spark: SparkSession, sinkPath: String): DataFrame = {
    val sink = spark.read.parquet(sinkPath)
    val latest = sink.groupBy(col("depth").as("_ld"), col("bucket").as("_lk"))
      .agg(max(col("batch_id")).as("_lb"))
    sink.join(latest,
        col("depth") === col("_ld") && col("bucket") === col("_lk") &&
          col("batch_id") === col("_lb"))
      .select(col("depth"), col("bucket"), col("c"))
  }
}
