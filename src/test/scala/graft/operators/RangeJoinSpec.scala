package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive inequality join") {
    val rnd = new scala.util.Random(41)
    val intervals = (1 to 150).map { i =>
      val start = rnd.nextInt(10000).toLong
      // lengths from sub-bucket to many-bucket spans
      (i.toLong, rnd.nextInt(4).toLong, start, start + rnd.nextInt(900).toLong)
    }.toDF("iv_id", "k", "start_ts", "end_ts")
      .withColumn("start_ts", col("start_ts").cast("timestamp"))
      .withColumn("end_ts", col("end_ts").cast("timestamp"))
    val points = (1 to 300).map { i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(11000).toLong)
    }.toDF("pt_id", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))

    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq

    val bucketed = collectPairs(RangeJoin.pointInInterval(
      points, intervals, Seq("k"), "ts", "start_ts", "end_ts",
      bucketSeconds = 256L))
    val naive = collectPairs(points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("start_ts") && col("ts") <= col("end_ts")))
    assert(bucketed.toSet == naive.toSet)
    assert(bucketed.size == naive.size) // one output row per pair, no dupes
    assert(naive.nonEmpty)
  }

  test("interval overlap join equals the naive inequality join, exactly once per pair") {
    val rnd = new scala.util.Random(43)
    def mkIntervals(n: Int, idBase: Long) = (1 to n).map { i =>
      val start = rnd.nextInt(10000).toLong
      // lengths from zero to many-bucket spans
      (idBase + i, rnd.nextInt(4).toLong, start, start + rnd.nextInt(900).toLong)
    }
    val left = mkIntervals(150, 0L).toDF("a_id", "k", "a_start", "a_end")
      .withColumn("a_start", col("a_start").cast("timestamp"))
      .withColumn("a_end", col("a_end").cast("timestamp"))
    val right = mkIntervals(200, 1000L).toDF("b_id", "k", "b_start", "b_end")
      .withColumn("b_start", col("b_start").cast("timestamp"))
      .withColumn("b_end", col("b_end").cast("timestamp"))

    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSeq

    val bucketed = collectPairs(RangeJoin.intervalOverlap(
      left, right, Seq("k"), "a_start", "a_end", "b_start", "b_end",
      bucketSeconds = 256L))
    val naive = collectPairs(left.join(right, Seq("k"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end")))
    assert(bucketed.toSet == naive.toSet)
    assert(bucketed.size == naive.size) // responsibility bucket: no dupes
    assert(naive.nonEmpty)
  }

  test("interval overlap: inclusive endpoint touch counts, disjoint does not, " +
       "degenerate end<start rows are dropped") {
    def iv(rows: Seq[(Long, Long, Long, Long)], names: (String, String, String)) =
      rows.toDF("k", names._1, names._2, names._3)
        .withColumn(names._2, col(names._2).cast("timestamp"))
        .withColumn(names._3, col(names._3).cast("timestamp"))
    val left = iv(Seq((1L, 1L, 100L, 200L), (1L, 2L, 500L, 400L)),
      ("a_id", "a_start", "a_end")) // a_id=2 is degenerate
    val right = iv(Seq((1L, 10L, 200L, 300L),   // touches a_id=1 at 200
                       (1L, 11L, 201L, 300L),   // disjoint from a_id=1
                       (1L, 12L, 400L, 500L)),  // overlaps only the degenerate row
      ("b_id", "b_start", "b_end"))
    val out = RangeJoin.intervalOverlap(left, right, Seq("k"),
        "a_start", "a_end", "b_start", "b_end", bucketSeconds = 60L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("intervalOverlapLeft: unmatched lefts null-extend, matched pairs " +
      "are the inner join, degenerate lefts stay dropped") {
    val left = Seq(
      (1L, 1L, 100L, 200L),   // overlaps right 10
      (2L, 1L, 500L, 600L),   // no overlap -> null-extended
      (3L, 2L, 100L, 200L),   // key with no right rows -> null-extended
      (4L, 1L, 300L, 250L))   // degenerate (end < start) -> dropped
      .toDF("a_id", "k", "a_start", "a_end")
    val right = Seq((10L, 1L, 150L, 260L), (11L, 1L, 700L, 800L))
      .toDF("b_id", "k", "b_start", "b_end")
    val out = RangeJoin.intervalOverlapLeft(left, right, Seq("k"),
        "a_start", "a_end", "b_start", "b_end", bucketSeconds = 60L,
        leftIdCol = "a_id")
      .select($"a_id", coalesce($"b_id", lit(-1L)))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, -1L), (3L, -1L)))
  }

  test("bounds are inclusive on both ends") {
    val iv = Seq((1L, 1L, 100L, 200L)).toDF("iv_id", "k", "start_ts", "end_ts")
      .select($"iv_id", $"k", $"start_ts".cast("timestamp"), $"end_ts".cast("timestamp"))
      .toDF("iv_id", "k", "start_ts", "end_ts")
    val pts = Seq((10L, 1L, 100L), (11L, 1L, 200L), (12L, 1L, 99L), (13L, 1L, 201L))
      .toDF("pt_id", "k", "ts")
      .select($"pt_id", $"k", $"ts".cast("timestamp")).toDF("pt_id", "k", "ts")
    val out = RangeJoin.pointInInterval(pts, iv, Seq("k"), "ts",
        "start_ts", "end_ts", bucketSeconds = 60L)
      .select("pt_id").as[Long].collect().toSet
    assert(out == Set(10L, 11L))
  }
}
