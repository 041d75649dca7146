package graft.operators

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("one pass yields exact counts, typed bounds, and exact NDV below k") {
    val df = Seq(
      (Some(9L), Some("b")),
      (Some(10L), Some("a")),
      (Some(10L), None),
      (None, Some("a")))
      .toDF("num", "str")
    val got = TableStats.columnStats(df, Seq("num", "str"), k = 16)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    // typed min: 9 < 10 numerically (a lexicographic min over the string
    // rendering would claim "10" < "9")
    assert(got("num") == (("num", 4L, 1L, 2.0, Some("9"), Some("10"))))
    assert(got("str") == (("str", 4L, 1L, 2.0, Some("a"), Some("b"))))
  }

  test("all statistics come from a single aggregation (one scan, no rescans)") {
    val df = spark.range(1, 1001).toDF("v").withColumn("w", $"v" % 7)
    val stats = TableStats.columnStats(df, Seq("v", "w"), k = 64)
    stats.collect()
    val plan = stats.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly one scan of the input in the whole (final) plan — every
    // column's sketch/bounds ride the same aggregation
    assert(plan.split("Range \\(").length - 1 == 1, plan)
    assert(plan.split("ObjectHashAggregate").length - 1 == 2, plan) // partial+final
  }

  test("saturated NDV estimate lands near the truth") {
    val df = (1L to 20000L).toDF("v")
    val est = TableStats.columnStats(df, Seq("v"), k = 256)
      .select($"ndv_est").as[Double].collect().head
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
  }
}
