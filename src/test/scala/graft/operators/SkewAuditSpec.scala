package graft.operators

import graft.SparkSpec

class SkewAuditSpec extends SparkSpec {
  import spark.implicits._

  // 100× key 1, 10× key 2, 1× keys 3..12  → total 120 rows, 12 keys
  private val df = (Seq.fill(100)(1L) ++ Seq.fill(10)(2L) ++ (3L to 12L))
    .toDF("k")

  test("reports count, share, uniform ratio, and salt factor per hot key") {
    val got = SkewAudit.keySkewReport(df, Seq("k"), k = 3,
        targetRowsPerTask = 40L)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 100L, 100.0 / 120.0, 100.0 * 12.0 / 120.0, 3L), // ceil(100/40)
      (2L, 10L, 10.0 / 120.0, 10.0 * 12.0 / 120.0, 1L),
      (3L, 1L, 1.0 / 120.0, 12.0 / 120.0, 1L)))           // tie → lowest key
  }

  test("a uniform key reads skew_ratio 1.0 everywhere") {
    val uniform = (1L to 300L).map(i => i % 30).toDF("k")
    val ratios = SkewAudit.keySkewReport(uniform, Seq("k"), k = 30)
      .select($"skew_ratio").as[Double].collect()
    assert(ratios.length == 30 && ratios.forall(_ == 1.0))
  }

  test("rejects empty keys and degenerate parameters") {
    intercept[IllegalArgumentException] {
      SkewAudit.keySkewReport(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      SkewAudit.keySkewReport(df, Seq("k"), k = 0)
    }
  }
}
