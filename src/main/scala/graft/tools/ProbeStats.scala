package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the portable (md5) vs production (xxhash64) ANALYZE
  * stats pass over lineitem — the q120 cost decomposition. */
object ProbeStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    li.count()
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_shipdate", "l_returnflag")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("portable-md5")(
      graft.operators.TableStats.columnStats(li, cols)
        .write.format("noop").mode("overwrite").save())
    time("fast-xxhash64")(
      graft.operators.TableStats.columnStatsFast(li, cols)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
