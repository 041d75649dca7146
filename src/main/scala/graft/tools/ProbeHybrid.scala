package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-channel timing breakdown of q111_hybrid_retrieval. */
object ProbeHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min=${runs.min}%.3f runs=${runs.map(t => f"$t%.2f").mkString(",")}")
    }
    val d0 = graft.sources.Tables.load(spark, sfDir, "documents")
    time("persist+head") {
      val d = d0.select(col("doc_id"), col("text")).persist()
      d.filter(col("doc_id") === 0).select(col("text")).head()
      d.unpersist()
    }
    time("sparse_channel") {
      val d = d0.select(col("doc_id"), col("text")).persist()
      val q = d.filter(col("doc_id") === 0).select(col("text")).head().getString(0)
      graft.functions.TermStats.sparseTopK(
        d.filter(col("doc_id") =!= 0), "doc_id", "text", q, 20).collect()
      d.unpersist()
    }
    time("dense_channel") {
      val d = d0.select(col("doc_id"), col("text")).persist()
      val qhs = d.filter(col("doc_id") === 0)
        .select(graft.functions.Dedup.hashedCharShingles(lower(col("text")), 7).as("qhs"))
      d.filter(col("doc_id") =!= 0)
        .select(col("doc_id"),
          graft.functions.Dedup.hashedCharShingles(lower(col("text")), 7).as("hs"))
        .crossJoin(broadcast(qhs))
        .select(col("doc_id"),
          graft.functions.Dedup.jaccardSorted(col("hs"), col("qhs")).as("sim"))
        .orderBy(col("sim").desc, col("doc_id")).limit(20).collect()
      d.unpersist()
    }
    spark.stop()
  }
}
