package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One timed noop-sink run. Failures are REPORTED, not swallowed: a
    * crashing query must not masquerade as a fast one — the error rides in
    * the result and the bench exits nonzero. */
  def timeQuery(spark: SparkSession, sfDir: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (Double, Option[String]) = {
    // operators persist internal frames; drop them so every run (and
    // every query) pays its full pipeline, not a predecessor's cache
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val err =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor threads, codegen compiler, parquet footer
    // cache) so the first timed query doesn't absorb startup cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    // noop sink: every query column is materialized (count() would let
    // Catalyst prune the projection work under test). Each query runs
    // three times and reports the fastest run — min-of-2 still absorbed
    // multi-second machine stalls in round 7 (q03/q42 read 14-17s there
    // but probe at 0.6-1.0s in isolation). The three runs are
    // INTERLEAVED as full suite passes, not back-to-back: a bench-box
    // contention window (rounds 8-10 all show a multi-minute degraded
    // band — q15 recorded 12.4s against a 1.5s isolated probe in r10)
    // poisons all three consecutive runs of whatever query it lands on,
    // but with whole-suite passes the same query's other two runs sit
    // minutes away, so the min escapes the band and the artifact stays
    // trustworthy for round-over-round regression detection.
    // dev-loop filter (the driver sets no such env; full suite runs)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val suite = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val passes = (1 to 3).map { _ =>
      suite.map { case (name, fn) => name -> timeQuery(spark, sfDir, fn) }
    }
    val results = suite.map { case (name, _) =>
      val runs = passes.map(_.find(_._1 == name).get._2)
      name -> (runs.map(_._1).min, runs.flatMap(_._2).headOption)
    }.toMap
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) =>
      "\"" + k + "\":\"" + e.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","runs_per_query":3,"reported":"min","schedule":"interleaved-passes"}"""
    println(json)
    // the full per-query JSON also lands in a FILE: the stdout tail gets
    // truncated in round artifacts (BENCH_r07 lost its first ~35 queries),
    // which makes head-of-suite regressions invisible round-over-round
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"bench_out write failed: ${e.getMessage}") }
    spark.stop()
    if (results.values.exists(_._2.isDefined)) sys.exit(1)
  }
}
