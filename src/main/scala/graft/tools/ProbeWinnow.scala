package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose q90_winnow's cost — tokenize+hash+winnow explode
  * pass alone, then the full report, with the formatted plan (is the
  * Exchange((id, fp)) reused across both consumer branches?). */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    d.count()
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
    // stage 1: just the explode pass (tokenize + md5 span hashes + winnow)
    val fps = corpus
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(lower(col("text"))).as("_toks"))
      .select(col("doc_id"),
        graft.functions.SpanDedup.spanHashes(col("_toks"), 8).as("_spans"))
      .select(col("doc_id"),
        explode(graft.functions.SpanDedup.winnowFromSpans(col("_spans"), 4))
          .as("fp"))
    time("explode-only")(fps.write.format("noop").mode("overwrite").save())
    val report = graft.functions.SpanDedup
      .winnowReport(corpus, "doc_id", "text", n = 8, w = 4)
    time("winnowReport")(
      report.write.format("noop").mode("overwrite").save())

    // v2: aligned explicit null filters so both consumer branches share a
    // canonically-identical Exchange((id, fp)) — AQE stage reuse
    val pairs2 = fps.filter(col("doc_id").isNotNull && col("fp").isNotNull)
      .groupBy(col("doc_id"), col("fp")).agg(count(lit(1)).as("_c"))
    val docFreq2 = pairs2.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
    val agg2 = pairs2.join(docFreq2, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("nd") >= 2, lit(1L)).otherwise(lit(0L)))
          .as("n_shared_fps"))
    val rep2 = corpus.select(col("doc_id")).join(agg2, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("n_shared_fps"), lit(0L)).as("n_shared_fps"))
    time("v2-aligned-filters")(
      rep2.write.format("noop").mode("overwrite").save())

    // v3: persist fps, eagerly checkpoint the small report, unpersist
    def v3(): Unit = {
      val f = fps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docFreq = f.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      val agg = f.join(docFreq, "fp")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"),
          sum(when(col("nd") >= 2, lit(1L)).otherwise(lit(0L)))
            .as("n_shared_fps"))
      val rep = corpus.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_fps"), lit(0L)).as("n_fps"),
          coalesce(col("n_shared_fps"), lit(0L)).as("n_shared_fps"))
        .localCheckpoint()
      f.unpersist(blocking = true)
      rep.write.format("noop").mode("overwrite").save()
    }
    time("v3-persist-release")(v3())
    println(rep2.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(4000))
    spark.stop()
  }
}
