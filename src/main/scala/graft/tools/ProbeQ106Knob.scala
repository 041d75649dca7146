package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: q106 end-to-end under statePartitions=8 (the current gate
  * wrapper) vs the session default — StreamNearDup is a foreachBatch
  * runner with hand-managed parquet state and NO Spark state store, so
  * the knob only throttles its batch shuffles.
  * `runMain graft.tools.ProbeQ106Knob <sfDir>`. */
object ProbeQ106Knob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JIT warmup pass (discard)
    time("warmup (sp=8)") {
      graft.streaming.StreamState.withStatePartitions(spark, 8) {
        graft.queries.PipelineQueries.streamNearDupQ(spark, sfDir).count()
      }
    }
    time("q106 sp=8 (current gate)") {
      graft.streaming.StreamState.withStatePartitions(spark, 8) {
        graft.queries.PipelineQueries.streamNearDupQ(spark, sfDir).count()
      }
    }
    time("q106 sp=32 (no knob)") {
      graft.queries.PipelineQueries.streamNearDupQ(spark, sfDir).count()
    }
    time("q106 sp=8 again") {
      graft.streaming.StreamState.withStatePartitions(spark, 8) {
        graft.queries.PipelineQueries.streamNearDupQ(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
