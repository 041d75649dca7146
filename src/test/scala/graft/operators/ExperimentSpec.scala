package graft.operators

import graft.SparkSpec

/** A/B conversion audit: exact diff rationals, ppm fence, control
  * handling. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, Boolean)], tolPpm: Long)
      : Map[String, (Long, Long, Long, Long, Boolean)] =
    Experiment.conversionAudit(rows.toDF("variant", "converted"),
        "variant", "converted", "a", tolPpm)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("hand-checked rationals: control zero-diff, fence strict") {
    // a: 2/4 convert; b: 3/4 -> diff = 3·4 − 2·4 = 4 over 16 = 25 pp
    val rows = Seq(("a", true), ("a", true), ("a", false), ("a", false),
      ("b", true), ("b", true), ("b", true), ("b", false))
    val got = audit(rows, tolPpm = 200000) // 20 pp: b trips
    assert(got("a") == ((4L, 2L, 0L, 16L, false)))
    assert(got("b") == ((4L, 3L, 4L, 16L, true)))
    // exactly-on-the-fence is NOT shifted (strict >): 25 pp tolerance
    val at = audit(rows, tolPpm = 250000)
    assert(!at("b")._5)
  }

  test("a falling variant reports a negative diff and still trips") {
    val rows = Seq(("a", true), ("a", true), ("b", false), ("b", false))
    val got = audit(rows, 500000)
    assert(got("b")._3 < 0 && got("b")._5)
  }

  test("absent control fails loudly") {
    val e = intercept[IllegalArgumentException] {
      audit(Seq(("b", true)), 0)
    }
    assert(e.getMessage.contains("control variant"))
  }
}
