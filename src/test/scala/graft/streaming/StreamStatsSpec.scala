package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming quantile monitor must fold new batches into RESTORED
  * sketch state (not recompute), emit one report row per updated group
  * per batch, and converge to exactly the batch aggregate. */
class StreamStatsSpec extends SparkSpec {
  import spark.implicits._

  test("state restores across runs and converges to the batch sketch") {
    val dir = Files.createTempDirectory("sst").toString
    val src = s"$dir/landing"
    val schema = Seq(("a", 1L)).toDF("g", "v").schema
    def run(): Unit = StreamStats.runAvailableNow(
      spark, src, schema, "g", "v", s"$dir/sink", s"$dir/ckpt",
      capacity = 64, qs = Seq(0.5))

    // wave 1: group a sees 1..10 → p50 = 5
    (1L to 10L).map(("a", _)).toDF("g", "v")
      .write.mode("append").parquet(src)
    run()
    val b0 = spark.read.parquet(s"$dir/sink/batch_id=0")
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b0("a") == ((10L, 10L, Seq(5L))))

    // wave 2: group a sees 11..30 (state must carry the first 10: mass
    // 30, p50 = 15 — a stateless recompute of wave 2 alone would say 20)
    // and group b appears for the first time
    ((11L to 30L).map(("a", _)) ++ Seq(("b", 7L))).toDF("g", "v")
      .write.mode("append").parquet(src)
    run()
    val b1 = spark.read.parquet(s"$dir/sink/batch_id=1")
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b1("a") == ((30L, 30L, Seq(15L))))
    assert(b1("b") == ((1L, 1L, Seq(7L))))

    // replay with no new files: the sink must not gain batches
    val before = spark.read.parquet(s"$dir/sink").count()
    run()
    assert(spark.read.parquet(s"$dir/sink").count() == before)
  }

  test("quantileOf matches the sketchQuantile arithmetic") {
    val entries = Seq((1L, 40L), (5L, 80L), (9L, 40L), (100L, 40L))
    assert(StreamStats.quantileOf(entries, 200L, 0.25) == 5L) // rank 50
    assert(StreamStats.quantileOf(entries, 200L, 0.5) == 5L)  // rank 100
    assert(StreamStats.quantileOf(entries, 200L, 1.0) == 100L)
    assert(StreamStats.quantileOf(entries, 200L, 0.0) == 1L)  // floor rank 1
  }
}
