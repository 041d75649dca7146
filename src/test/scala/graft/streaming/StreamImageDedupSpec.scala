package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.ImagePixels

/** Streaming perceptual image dedup: stored-index drops across waves,
  * keep path for undecodable payloads, replay stability. */
class StreamImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(ids: Seq[Long], w: Int, h: Int, fmt: String,
                      shift: Int = 0, off: Long = 0L, trunc: Int = -1) =
    ImagePixels.fixtureFrame(ids.toDF("id"), "id", w, h, fmt, shift, off,
      trunc)

  test("a re-encoded resized clone drops against the STORED index, fresh " +
      "patterns and corrupt payloads are kept, replay is a no-op") {
    val dir = Files.createTempDirectory("img_dedup").toString
    val src = s"$dir/landing"
    val schema = fixture(Seq(1L), 36, 32, "png").schema
    def run(): Long = StreamImageDedup.runAvailableNow(spark, src, schema,
      "media_id", "payload", s"$dir/state", s"$dir/ckpt")
    // wave 1: four originals
    fixture(Seq(0L, 1L, 2L, 3L), 72, 64, "png")
      .coalesce(1).write.mode("append").parquet(src)
    assert(run() == 1L)
    def accepted(): Set[Long] = spark.read
      .parquet(s"$dir/state/accepted").select($"media_id")
      .as[Long].collect().toSet
    assert(accepted() == Set(0L, 1L, 2L, 3L))
    // wave 2: clones of 0 and 2 (resized BMP re-encode, brightness
    // shift — hamming 0 by construction), one fresh pattern, one
    // truncated payload
    fixture(Seq(0L, 2L), 144, 128, "bmp", shift = 3, off = 100L)
      .unionByName(fixture(Seq(7L), 72, 64, "png", off = 200L))
      .unionByName(fixture(Seq(0L), 36, 32, "png", off = 999L, trunc = 10))
      .coalesce(1).write.mode("append").parquet(src)
    assert(run() == 1L)
    assert(accepted() == Set(0L, 1L, 2L, 3L, 207L, 999L))
    // the index holds only decodable accepted hashes
    val indexed = spark.read.parquet(s"$dir/state/hashes")
      .select($"media_id").as[Long].collect().toSet
    assert(indexed == Set(0L, 1L, 2L, 3L, 207L))
    // replay with no new files: nothing changes
    val n3 = run()
    assert(n3 <= 1L)
    assert(accepted() == Set(0L, 1L, 2L, 3L, 207L, 999L))
  }

  test("a clone arriving in the SAME wave as nothing it matches is kept " +
      "(within-batch pairs deliberately not compared) and caught on the " +
      "NEXT wave probe") {
    val dir = Files.createTempDirectory("img_dedup2").toString
    val src = s"$dir/landing"
    val schema = fixture(Seq(1L), 36, 32, "png").schema
    def run(): Long = StreamImageDedup.runAvailableNow(spark, src, schema,
      "media_id", "payload", s"$dir/state", s"$dir/ckpt")
    // original + its clone land TOGETHER: both accepted (cross-batch
    // semantics), like StreamNearDup
    fixture(Seq(5L), 72, 64, "png")
      .unionByName(fixture(Seq(5L), 144, 128, "bmp", shift = 2, off = 50L))
      .coalesce(1).write.mode("append").parquet(src)
    run()
    val a1 = spark.read.parquet(s"$dir/state/accepted")
      .select($"media_id").as[Long].collect().toSet
    assert(a1 == Set(5L, 55L))
    // a third copy next wave drops against BOTH stored hashes
    fixture(Seq(5L), 72, 64, "bmp", off = 90L)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    val a2 = spark.read.parquet(s"$dir/state/accepted")
      .select($"media_id").as[Long].collect().toSet
    assert(a2 == Set(5L, 55L))
  }
}
