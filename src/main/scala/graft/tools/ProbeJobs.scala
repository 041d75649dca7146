package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: run ONE named SparkEntry query (warm session, noop sink) with
  * a job-level listener — prints every Spark job's wall duration and call
  * site, so a query's time splits into its constituent jobs instead of one
  * opaque total. `runMain graft.tools.ProbeJobs q201_graph_rank [runs]` */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.headOption.getOrElse(sys.error("usage: ProbeJobs <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    val fn = graft.SparkEntry.queries(name)

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        def prop(k: String) = p.flatMap(x => Option(x.getProperty(k)))
        val site = prop("callSite.short").getOrElse("?")
        val desc = prop("spark.job.description").getOrElse("")
        val nStages = js.stageInfos.size
        val nTasks = js.stageInfos.map(_.numTasks).sum
        val stageNames = js.stageInfos.map(_.name.takeWhile(_ != ' '))
          .groupBy(identity).map { case (n, g) => s"$n x${g.size}" }
          .mkString(",")
        starts(js.jobId) =
          (js.time, s"$site | st=$nStages tk=$nTasks [$stageNames] $desc")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows += ((je.jobId, (je.time - t0) / 1e3, site))
        }
    }
    (1 to runs).foreach { r =>
      rows.clear()
      spark.sparkContext.addSparkListener(listener)
      val (t, err) = graft.Bench.timeQuery(spark, sfDir, fn)
      spark.sparkContext.removeSparkListener(listener)
      err.foreach(e => println(s"$name ERROR: $e"))
      // the listener bus is async — give it a beat to drain
      Thread.sleep(800)
      println(f"== run $r: $name total=$t%.3f s, jobs=${rows.size}")
      rows.sortBy(_._1).foreach { case (id, d, site) =>
        println(f"  job $id%4d  $d%7.3f s  $site")
      }
      println(f"  sum-of-jobs=${rows.map(_._2).sum}%.3f s (gaps = driver-side)")
    }
    spark.stop()
  }
}
