package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.sources.Tables

/** Dev tool: stage-by-stage timing/cardinality of the MinHash-LSH pipeline
  * under different parameters. `runMain graft.tools.ProbeMinhash <sfDir>`. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables.load(spark, sfDir, "documents")
    val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
      .cache()
    println(s"corpus: ${corpus.count()}")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    for ((k, numHashes, bands) <- Seq((7, 64, 8), (9, 64, 4))) {
      println(s"\n--- shingle=$k hashes=$numHashes bands=$bands r=${numHashes / bands} ---")
      val shingled = corpus.select(col("doc_id"),
        Dedup.hashedShingles(Dedup.charShingles(lower(col("text")), k)).as("hs"))
        .cache()
      time("shingle+hash")(shingled.count())
      val signed = shingled.withColumn("sig",
        Dedup.minhashSignatureFromHashes(col("hs"), numHashes)).cache()
      time("sign")(signed.count())
      val bandsDf = Dedup.lshBands(signed, "doc_id", "sig", bands, numHashes / bands)
      val cands = Dedup.lshCandidates(bandsDf, "doc_id").cache()
      val nCands = time("candidates")(cands.count())
      println(s"candidate pairs: $nCands")
      val sa = shingled.select(col("doc_id").as("doc_id_a"), col("hs").as("hs_a"))
      val sb = shingled.select(col("doc_id").as("doc_id_b"), col("hs").as("hs_b"))
      val verified = cands.join(sa, "doc_id_a").join(sb, "doc_id_b")
        .filter(size(col("hs_a")).cast("double") >= lit(0.95) * size(col("hs_b")) &&
                size(col("hs_b")).cast("double") >= lit(0.95) * size(col("hs_a")))
        .withColumn("jaccard", Dedup.jaccard(col("hs_a"), col("hs_b")))
        .filter(col("jaccard") >= 0.95)
      val nOut = time("verify")(verified.count())
      val clones = verified.filter(col("doc_id_b") === col("doc_id_a") + 100000)
      println(s"pairs: $nOut, clones: ${clones.count()}")
      shingled.unpersist(); signed.unpersist(); cands.unpersist()
    }
    spark.stop()
  }
}
