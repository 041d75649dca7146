package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import graft.SparkSpec
import graft.operators.Funnels

/** Streaming funnel fold vs the batch recompute: event-time-ordered waves
  * drained through [[FunnelStream]] must leave a standing state equal to
  * [[Funnels.funnelTimes]] over the full log — including chains that
  * complete WITHIN one wave and chains that complete ACROSS waves — and a
  * no-data replay must not change the answer. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "buy")

  // u1 completes the whole funnel inside wave 1; u2's chain crosses all
  // three waves; u3 views in wave 1 and never converts; u4's click
  // arrives before any view (chain must stay open); u5 only appears in
  // wave 2 and completes within it
  private val wave1 = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:09:00"), "buy"),
    (2L, ts("2024-01-02 09:00:00"), "view"),
    (3L, ts("2024-01-02 11:00:00"), "view"),
    (4L, ts("2024-01-02 12:00:00"), "click"))
  private val wave2 = Seq(
    (2L, ts("2024-01-11 09:00:00"), "click"),
    (5L, ts("2024-01-12 08:00:00"), "view"),
    (5L, ts("2024-01-12 08:30:00"), "click"),
    (5L, ts("2024-01-12 09:00:00"), "buy"),
    (4L, ts("2024-01-12 10:00:00"), "view"))
  private val wave3 = Seq(
    (2L, ts("2024-01-21 09:00:00"), "buy"),
    (3L, ts("2024-01-21 10:00:00"), "error"))

  private def drain(dir: String, gap: Option[Long] = None,
                    total: Option[Long] = None): Long = {
    val src = s"$dir/landing"
    val schema = wave1.toDF("user_id", "ts", "etype").schema
    def run(): Long = FunnelStream.runAvailableNow(spark, src, schema,
      "user_id", "ts", "etype", steps, s"$dir/state", s"$dir/ckpt",
      gap, total)
    Seq(wave1, wave2, wave3).foreach { w =>
      w.toDF("user_id", "ts", "etype").coalesce(1)
        .write.mode("append").parquet(src)
      run()
    }
    run() // no-data replay
  }

  private def standing(dir: String) =
    FunnelStream.currentTimes(spark, s"$dir/state", "user_id", steps,
        StructField("user_id", org.apache.spark.sql.types.LongType))
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq

  test("drained state equals the batch funnel over the full log; " +
      "no-data replay is a no-op") {
    val dir = Files.createTempDirectory("fstream").toString
    val replayBatches = drain(dir)
    assert(replayBatches <= 1,
      s"no-data replay ran $replayBatches folding batches")
    val got = standing(dir)
    val full = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts", "etype")
    val want = Funnels.funnelTimes(full, "user_id", "ts", "etype", steps)
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(got == want)
    // the interesting rows really exercise the fold paths
    val byUser = got.map(r => r._1 -> r).toMap
    assert(byUser(1L)._4.contains(ts("2024-01-01 10:09:00"))) // in-wave
    assert(byUser(2L)._4.contains(ts("2024-01-21 09:00:00"))) // cross-wave
    assert(byUser(4L)._2.contains(ts("2024-01-12 10:00:00")) &&
      byUser(4L)._3.isEmpty) // pre-view click never counts
    // the report matches the batch report
    val report = FunnelStream.currentReport(spark, s"$dir/state",
        "user_id", steps,
        StructField("user_id", org.apache.spark.sql.types.LongType))
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    val wantReport = Funnels.funnel(full, "user_id", "ts", "etype", steps)
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(report == wantReport)
  }

  test("compaction folds resolved rows into the batch_id=-1 base: " +
      "answer unchanged, directories bounded, later drains still fold") {
    val dir = Files.createTempDirectory("fstreamc").toString
    val src = s"$dir/landing"
    val schema = wave1.toDF("user_id", "ts", "etype").schema
    def run(): Long = FunnelStream.runAvailableNow(spark, src, schema,
      "user_id", "ts", "etype", steps, s"$dir/state", s"$dir/ckpt")
    def dirs(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/state/delta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("batch_id=")).toSet
    }
    Seq(wave1, wave2).foreach { w =>
      w.toDF("user_id", "ts", "etype").coalesce(1)
        .write.mode("append").parquet(src)
      run()
    }
    val before = standing(dir)
    // mid-chain compact: batch 0 absorbs into the base, batch 1 stays
    FunnelStream.compact(spark, s"$dir/state", "user_id")
    assert(dirs() == Set("batch_id=-1", "batch_id=1"))
    assert(standing(dir) == before)
    FunnelStream.compact(spark, s"$dir/state", "user_id") // no-op
    assert(standing(dir) == before)
    // the compacted base is a valid fold input, not just a valid read
    wave3.toDF("user_id", "ts", "etype").coalesce(1)
      .write.mode("append").parquet(src)
    run()
    FunnelStream.compact(spark, s"$dir/state", "user_id")
    val want = Funnels.funnelTimes(
        (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts", "etype"),
        "user_id", "ts", "etype", steps)
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(standing(dir) == want)
    // a user updated across base and a later batch resolved to the
    // LATER row (u2's chain completed in wave 3, past the first compact)
    assert(standing(dir).find(_._1 == 2L).get._4
      .contains(ts("2024-01-21 09:00:00")))
  }

  test("conversion windows ride the fold: a cross-wave chain expiring " +
      "the step gap stays open, matching the windowed batch funnel") {
    val dir = Files.createTempDirectory("fstreamw").toString
    // 7-day step gap: u2's view(Jan 2) -> click(Jan 11) gap is 9 days —
    // expired; u5's 30-minute hops survive
    drain(dir, gap = Some(7L * 86400))
    val got = standing(dir)
    val full = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts", "etype")
    val want = Funnels.funnelTimes(full, "user_id", "ts", "etype", steps,
        maxStepGapSec = Some(7L * 86400))
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(got == want)
    val byUser = got.map(r => r._1 -> r).toMap
    assert(byUser(2L)._3.isEmpty)
    assert(byUser(5L)._4.isDefined)
  }
}
