package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkLog(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select($"user_id", to_timestamp($"ts_s").as("ts"), $"event_id",
        $"event_type")

  test("three staged waves fold into the full-recompute history; a " +
       "no-data run changes nothing; later waves may introduce new keys") {
    val base = java.nio.file.Files.createTempDirectory("scd2stream")
    try {
      val src = s"$base/landing"
      val all = Seq(
        (1L, "2024-01-01 00:00:00", 1L, "A"),
        (1L, "2024-01-02 00:00:00", 2L, "B"),   // wave 1
        (1L, "2024-01-11 00:00:00", 3L, "B"),   // wave 2: same attr
        (2L, "2024-01-12 00:00:00", 4L, "C"),   // wave 2: NEW key
        (1L, "2024-01-21 00:00:00", 5L, "A"),   // wave 3: new run
        (2L, "2024-01-22 00:00:00", 6L, "D"))   // wave 3: new run
      val log = mkLog(all)
      def run(): Long = Scd2Stream.runAvailableNow(spark, src, log.schema,
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"),
        s"$base/state", s"$base/ckpt")
      def wave(lo: Int, hi: Int) =
        mkLog(all.filter(r => r._3 >= lo && r._3 <= hi))
          .coalesce(1).write.mode("append").parquet(src)
      wave(1, 2); assert(run() == 1L)
      wave(3, 4); assert(run() == 1L)
      wave(5, 6); assert(run() == 1L)
      assert(run() <= 1L) // no new files
      val got = Scd2Stream.currentHistory(spark, s"$base/state")
        .select($"user_id", $"event_type", $"valid_from", $"valid_to",
          $"version", $"is_current")
        .collect().map(_.toSeq).toSet
      val want = graft.operators.Scd2.fromChangeLog(log, Seq("user_id"),
          "ts", Seq("event_type"), Seq("event_id"))
        .select($"user_id", $"event_type", $"valid_from", $"valid_to",
          $"version", $"is_current")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      // wave-2's same-attr observation did NOT mint a version
      assert(want.count(_.head == 1L) == 3)
    } finally {
      val walk = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  test("currentHistory without any snapshot fails loudly") {
    val e = intercept[IllegalStateException] {
      Scd2Stream.currentHistory(spark, "/tmp/graft_scd2stream_nowhere")
    }
    assert(e.getMessage.contains("no snapshot"))
  }
}
