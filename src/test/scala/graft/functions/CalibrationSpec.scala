package graft.functions

import graft.SparkSpec

/** Quantile mapping: exact rank→order-statistic projection. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(rows: Seq[(Long, String, Long)], ref: String)
      : Map[Long, Long] =
    Calibration.quantileNormalize(rows.toDF("id", "g", "x"),
        "id", "g", "x", ref)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap

  test("equal-size groups map rank to rank") {
    // ref a: {10,20,30}; b: {1,5,9} -> {10,20,30}
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 1L), (6L, "b", 9L))
    val got = norm(rows, "a")
    assert(got(5L) == 10L && got(4L) == 20L && got(6L) == 30L)
    // reference rows self-map
    assert(got(1L) == 10L && got(2L) == 20L && got(3L) == 30L)
  }

  test("unequal sizes use the ceil position") {
    // ref a: {10,20,30,40} (n_ref=4); b: {7,8} (ng=2)
    // r=1 -> ceil(4/2)=2 -> 20; r=2 -> ceil(8/2)=4 -> 40
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "a", 40L), (5L, "b", 7L), (6L, "b", 8L))
    val got = norm(rows, "a")
    assert(got(5L) == 20L && got(6L) == 40L)
    // and the reverse direction: ref b {7,8}, a's 4 ranks ->
    // ceil(r*2/4) = 1,1,2,2 -> 7,7,8,8
    val rev = norm(rows, "b")
    assert(rev(1L) == 7L && rev(2L) == 7L && rev(3L) == 8L && rev(4L) == 8L)
  }

  test("ties break by id, deterministically") {
    // b has two equal values: lower id gets the lower rank
    val rows = Seq((1L, "a", 100L), (2L, "a", 200L),
      (5L, "b", 3L), (4L, "b", 3L))
    val got = norm(rows, "a")
    assert(got(4L) == 100L && got(5L) == 200L)
  }

  test("absent reference group fails loudly") {
    val rows = Seq((1L, "a", 1L))
    val e = intercept[IllegalArgumentException] {
      norm(rows, "nope")
    }
    assert(e.getMessage.contains("reference group"))
  }
}
