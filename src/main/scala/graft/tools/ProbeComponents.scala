package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev tool: stage timing of the q56 dedup-clusters pipeline.
  * `runMain graft.tools.ProbeComponents <sfDir>` */
object ProbeComponents {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    time("docs count")(d.count())
    val ids = d.select(col("doc_id"))
      .unionByName(d.select((col("doc_id") + 100000).as("doc_id")))
      .unionByName(d.select((col("doc_id") + 200000).as("doc_id")))
    val chain = d.select(col("doc_id").as("a"), (col("doc_id") + 100000).as("b"))
      .unionByName(d.select((col("doc_id") + 100000).as("a"),
        (col("doc_id") + 200000).as("b")))
    val sameText = d.toDF("a", "ta")
      .join(d.toDF("b", "tb"), col("ta") === col("tb") && col("a") < col("b"))
      .select(col("a"), col("b"))
    val pairs = chain.unionByName(sameText)
    time("pairs materialize")(pairs.count())
    val labels = time("connectedComponents")(
      graft.operators.Components.connectedComponents(pairs, "a", "b"))
    time("labels count")(labels.count())
    val out = graft.operators.Components.assignClusters(ids, "doc_id", pairs, "a", "b")
      .select(col("doc_id"), col("cluster_id")).orderBy(col("doc_id"))
    time("full q56 noop")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
