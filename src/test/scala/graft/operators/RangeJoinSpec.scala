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
