package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.sources.Tables

/** Dev tool: stage-by-stage breakdown of the q106 streaming near-dup
  * gate — lifecycle (checkpointed drain machinery) vs band-probe vs
  * size-prefilter vs exact-Jaccard verify vs state writes.
  * `runMain graft.tools.ProbeStreamNearDup <sfDir>`. */
object ProbeStreamNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- end-to-end gate shape (the q106 flow), wave-level timers -----
    val base = java.nio.file.Files.createTempDirectory("probe_q106").toString
    val src = s"$base/landing"
    val docs = Tables.load(spark, sfDir, "documents")
    val wave1 = docs.select(col("doc_id"), col("text"))
    val wave2 = docs.select((col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(substring(col("text"), lit(1),
          (col("n_chars") / 2).cast("int"))).as("text"))
    graft.streaming.StreamState.withStatePartitions(spark, 8) {
      wave1.coalesce(1).write.mode("append").parquet(src)
      time("wave1 drain (empty index)")(
        graft.streaming.StreamNearDup.runAvailableNow(spark, src,
          wave1.schema, "doc_id", "text", s"$base/state", s"$base/ckpt"))
      wave2.coalesce(1).write.mode("append").parquet(src)
      time("wave2 drain (probe standing index)")(
        graft.streaming.StreamNearDup.runAvailableNow(spark, src,
          wave1.schema, "doc_id", "text", s"$base/state", s"$base/ckpt"))
      time("replay drain (no data)")(
        graft.streaming.StreamNearDup.runAvailableNow(spark, src,
          wave1.schema, "doc_id", "text", s"$base/state", s"$base/ckpt"))
    }

    // --- batch re-enactment of the wave-2 foreachBatch body, staged ---
    println("\n--- wave-2 body stages (batch re-enactment) ---")
    val bounds = Dedup.sizeBandBounds(0.95)
    val signed = time("shingle+sign batch (persist)") {
      val f = wave2.select(col("doc_id"),
          Dedup.hashedCharShingles(lower(col("text")), 7).as("hs"))
        .withColumn("sig", Dedup.minhashSignatureFromHashes(col("hs"), 32))
        .withColumn("size_band", Dedup.sizeBand(size(col("hs")), bounds))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val batchBands = Dedup.lshBands(
      signed.select(col("doc_id"), col("size_band"), col("sig")),
      "doc_id", "sig", 8, 4, carry = Seq("size_band"))
    val standingBands = spark.read.parquet(s"$base/state/bands")
      .filter(col("batch_id") === 0).drop("batch_id")
    val standingHs = spark.read.parquet(s"$base/state/shingles")
      .filter(col("batch_id") === 0).drop("batch_id")
    val cands = time("size-banded bucket join -> distinct cands") {
      val c = Dedup.capBuckets(batchBands, "doc_id", 1 << 16,
          carry = Seq("size_band"))
        .toDF("doc_id_new", "band_idx", "band_sig", "size_band")
        .withColumn("size_band", explode(array(
          col("size_band") - 1, col("size_band"), col("size_band") + 1)))
        .join(Dedup.capBuckets(standingBands, "doc_id", 1 << 16,
            carry = Seq("size_band"))
          .toDF("doc_id_old", "band_idx", "band_sig", "size_band"),
          Seq("band_idx", "band_sig", "size_band"))
        .select(col("doc_id_new"), col("doc_id_old")).distinct()
        .localCheckpoint()
      println(s"  candidates: ${c.count()}"); c
    }
    val sized = time("size-ratio prefilter (narrow n_hs)") {
      val f = cands
        .join(signed.select(col("doc_id").as("doc_id_new"),
          size(col("hs")).as("n_new")), "doc_id_new")
        .join(standingHs.select(col("doc_id").as("doc_id_old"),
          col("n_hs").as("n_old")), "doc_id_old")
        .filter(col("n_new").cast("double") >= lit(0.95) * col("n_old") &&
          col("n_old").cast("double") >= lit(0.95) * col("n_new"))
        .select(col("doc_id_new"), col("doc_id_old")).localCheckpoint()
      println(s"  survivors: ${f.count()}"); f
    }
    val dropped = time("exact-Jaccard verify (stored sets)") {
      val d = sized
        .join(signed.select(col("doc_id").as("doc_id_new"),
          col("hs").as("hs_new")), "doc_id_new")
        .join(standingHs.select(col("doc_id").as("doc_id_old"),
          col("hs").as("hs_old")), "doc_id_old")
        .filter(Dedup.jaccardSorted(col("hs_new"), col("hs_old")) >= 0.95)
        .select(col("doc_id_new").as("doc_id")).distinct().localCheckpoint()
      println(s"  dropped: ${d.count()}"); d
    }
    time("accepted anti-join + 3 state writes") {
      val accepted = wave2.join(dropped, Seq("doc_id"), "left_anti").cache()
      accepted.write.mode("overwrite").parquet(s"$base/restate/accepted")
      batchBands.join(accepted.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$base/restate/bands")
      signed.select(col("doc_id"), col("hs"), size(col("hs")).as("n_hs"))
        .join(accepted.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$base/restate/shingles")
      accepted.unpersist()
    }
    signed.unpersist()
    spark.stop()
  }
}
