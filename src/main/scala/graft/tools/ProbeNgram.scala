package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev tool: stage timing for the q29 prefix-filter near-dup pipeline. */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val d = Tables.load(spark, sfDir, "documents")
    val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
      .withColumn("block", concat_ws("|", col("lang"), expr("n_chars div 32")))
    val grams = corpus.select(col("block"), col("doc_id"),
      Dedup.hashedWordShingles(
        TextAnalysis.tokens(lower(col("text"))), 3).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("gram+hash")(grams.count())
    val cands = Dedup.prefixFilterCandidates(grams, "doc_id", "grams", "block", 0.9)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("candidates")(cands.count())
    println(s"candidate pairs: $n")
    val out = time("full query")(
      graft.queries.TrainingData.queries("q29_ngram_jaccard")(spark, sfDir).count())
    println(s"final pairs: $out")
    spark.stop()
  }
}
