package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val e = Tables.load(spark, dir, "embeddings")
    val coarse = Similarity.ivfCentroidsTrainedPortable(e, "embedding", "vec_id", k = 8, iters = 0)
    val cbs = Similarity.ivfPqCodebooks(e, "embedding", "vec_id", coarse, m = 8, ksub = 16, iters = 0)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    val enc = Similarity.ivfPqEncode(e.select(col("vec_id"), col("embedding")), "embedding", coarse, cbs)
    time("encode only")(enc.write.format("noop").mode("overwrite").save())
    println(enc.queryExecution.optimizedPlan.toString.take(1500))
    val cellOnly = e.select(col("vec_id"), Similarity.ivfCell(col("embedding"), coarse).as("c"))
    time("cell only")(cellOnly.write.format("noop").mode("overwrite").save())
    val pq = e.select(col("vec_id"), Similarity.pqEncode(col("embedding"), cbs).as("codes"))
    time("plain pqEncode")(pq.write.format("noop").mode("overwrite").save())
    val full = graft.queries.TrainingData.queries("q141_ivfpq_codes")(spark, dir)
    time("full q141")(full.write.format("noop").mode("overwrite").save())
    val exploded = enc.select(col("vec_id"), col("pq_cell"),
      posexplode(col("pq_codes")).as(Seq("subspace", "code")))
    time("encode+posexplode")(exploded.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
