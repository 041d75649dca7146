package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("duplicates within the watermark window collapse to first-seen") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamDedup.dedupByFingerprint(
      input.toDF().toDF("ts", "id", "text"), "ts", "text", "10 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(100), 1L, "alpha"), (ts(110), 2L, "alpha"),
        (ts(120), 3L, "beta"))
      query.processAllAvailable()
      // same-batch duplicate of alpha dropped
      input.addData((ts(130), 4L, "alpha"), (ts(140), 5L, "gamma"))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 3L, 5L)) // 2 and 4 were dup fingerprints
    } finally query.stop()
  }

  test("state evicts after the watermark passes: late re-arrival survives") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamDedup.dedupByFingerprint(
      input.toDF().toDF("ts", "id", "text"), "ts", "text", "10 seconds")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_evict").outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(100), 1L, "alpha"))
      query.processAllAvailable()
      // push the watermark far past alpha's fingerprint state
      input.addData((ts(1000), 2L, "filler"))
      query.processAllAvailable()
      // alpha again, with event time beyond the old state's horizon
      input.addData((ts(1010), 3L, "alpha"))
      query.processAllAvailable()
      val ids = spark.table("dedup_evict").select("id").as[Long]
        .collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // the re-arrival was NOT deduped
    } finally query.stop()
  }
}
