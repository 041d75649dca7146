package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkLog(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select($"user_id", to_timestamp($"ts_s").as("ts"), $"event_id",
        $"event_type")

  private def withBase(f: java.nio.file.Path => Unit): Unit = {
    val base = java.nio.file.Files.createTempDirectory("scd2stream")
    try f(base)
    finally {
      val walk = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  private val all = Seq(
    (1L, "2024-01-01 00:00:00", 1L, "A"),
    (1L, "2024-01-02 00:00:00", 2L, "B"),   // wave 1
    (1L, "2024-01-11 00:00:00", 3L, "B"),   // wave 2: same attr
    (2L, "2024-01-12 00:00:00", 4L, "C"),   // wave 2: NEW key
    (1L, "2024-01-21 00:00:00", 5L, "A"),   // wave 3: new run
    (2L, "2024-01-22 00:00:00", 6L, "D"))   // wave 3: new run

  private def histOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"user_id", $"event_type", $"valid_from", $"valid_to",
        $"version", $"is_current")
      .collect().map(_.toSeq).toSet

  test("three staged waves fold into the full-recompute history; a " +
       "no-data run changes nothing; later waves may introduce new keys") {
    withBase { base =>
      val src = s"$base/landing"
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
      val got = histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
      val want = histOf(graft.operators.Scd2.fromChangeLog(log,
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id")))
      assert(got == want)
      // wave-2's same-attr observation did NOT mint a version
      assert(want.count(_.head == 1L) == 3)
    }
  }

  test("a batch writes ONLY its keys' buckets; untouched bucket files " +
       "keep their mtimes across later batches (pruned-I/O pin)") {
    withBase { base =>
      val src = s"$base/landing"
      val log = mkLog(all)
      def run(): Long = Scd2Stream.runAvailableNow(spark, src, log.schema,
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"),
        s"$base/state", s"$base/ckpt", nBuckets = 64)
      // wave 1: both keys land (keys 1 and 2 → two buckets at nBuckets=64)
      mkLog(all.take(2) :+ all(3)).coalesce(1)
        .write.mode("append").parquet(src)
      assert(run() == 1L)
      val b0 = new java.io.File(s"$base/state/snap/batch_id=0")
      val b0Buckets = b0.listFiles().filter(_.getName.startsWith("_gbucket="))
      val expected = Seq(1L, 2L).toDF("user_id")
        .select(pmod(xxhash64($"user_id"), lit(64)).cast("int"))
        .distinct().count().toInt
      assert(b0Buckets.length == expected, b0Buckets.map(_.getName).toSeq)
      val mtimes = b0Buckets.flatMap(_.listFiles())
        .map(f => f.getPath -> f.lastModified()).toMap
      // wave 2 touches ONLY key 1 → only key 1's bucket in the new delta
      mkLog(Seq(all(4))).coalesce(1).write.mode("append").parquet(src)
      assert(run() == 1L)
      val b1 = new java.io.File(s"$base/state/snap/batch_id=1")
      val b1Buckets = b1.listFiles().filter(_.getName.startsWith("_gbucket="))
      assert(b1Buckets.length == 1, b1Buckets.map(_.getName).toSeq)
      // batch-0 delta is untouched byte-for-byte (no rewrite of closed
      // history or of key 2's bucket)
      val after = b0.listFiles().filter(_.getName.startsWith("_gbucket="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      assert(after == mtimes)
      // and the standing history is still the full recompute
      val got = histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
      val want = histOf(graft.operators.Scd2.fromChangeLog(
        mkLog(all.take(2) ++ Seq(all(3), all(4))),
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id")))
      assert(got == want)
    }
  }

  test("compact folds superseded bucket versions into the base: same " +
       "history before and after, absorbed deltas gone, and a post-" +
       "compact drain continues correctly") {
    withBase { base =>
      val src = s"$base/landing"
      val log = mkLog(all)
      def run(): Long = Scd2Stream.runAvailableNow(spark, src, log.schema,
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"),
        s"$base/state", s"$base/ckpt", nBuckets = 8)
      def wave(lo: Int, hi: Int) =
        mkLog(all.filter(r => r._3 >= lo && r._3 <= hi))
          .coalesce(1).write.mode("append").parquet(src)
      wave(1, 2); assert(run() == 1L)
      wave(3, 4); assert(run() == 1L)
      val before = histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
      Scd2Stream.compact(spark, s"$base/state")
      val afterCompact =
        histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
      assert(afterCompact == before)
      // batch 0's delta was absorbed; the base and the newest delta remain
      val snap = new java.io.File(s"$base/state/snap")
      val dirs = snap.listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).toSet
      assert(dirs == Set("batch_id=-1", "batch_id=1"), dirs)
      // manifests pruned to the two live ones
      val manis = new java.io.File(s"$base/state/manifests")
        .listFiles().map(_.getName).filter(_.startsWith("manifest_")).toSet
      assert(manis == Set("manifest_0", "manifest_1"), manis)
      // the drain continues against the compacted state
      wave(5, 6); assert(run() == 1L)
      val got = histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
      val want = histOf(graft.operators.Scd2.fromChangeLog(log,
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id")))
      assert(got == want)
      // idempotent: compacting twice is safe
      Scd2Stream.compact(spark, s"$base/state")
      Scd2Stream.compact(spark, s"$base/state")
      assert(histOf(Scd2Stream.currentHistory(spark, s"$base/state"))
        == want)
    }
  }

  test("currentHistory without any snapshot fails loudly") {
    val e = intercept[IllegalStateException] {
      Scd2Stream.currentHistory(spark, "/tmp/graft_scd2stream_nowhere")
    }
    assert(e.getMessage.contains("no snapshot"))
  }
}
