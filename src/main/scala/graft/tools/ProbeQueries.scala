package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named subset of SparkEntry queries with the same
  * harness shape as Bench (noop sink, cache cleared, min of N runs) —
  * isolates per-query regressions from whole-bench run-order effects.
  * `runMain graft.tools.ProbeQueries q42_ivf_topk q45_merge_sql` */
object ProbeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          val times = (1 to runs).map { _ =>
            val (t, err) = graft.Bench.timeQuery(spark, sfDir, fn)
            err.foreach(e => println(s"$name ERROR: $e"))
            t
          }
          println(f"$name: min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
