package graft.operators

import graft.SparkSpec

/** Exact basket lift on a hand-checked co-occurrence table. */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("pairLift: hand-checked lift rationals, duplicate rows dedupe, " +
      "fence splits") {
    // baskets: b1{x,y}, b2{x,y}, b3{x,z}, b4{y} -> N=4
    // c_x=3 c_y=3 c_z=1; c_xy=2 lift=8/9; c_xz=1 lift=4/3
    val rows = Seq(("b1", "x"), ("b1", "y"), ("b1", "y"), // dup row
      ("b2", "x"), ("b2", "y"), ("b3", "x"), ("b3", "z"), ("b4", "y"))
      .toDF("bk", "it")
    val got = Baskets.pairLift(rows, Seq("bk"), "it", 1L, 1L)
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    assert(got == Set(
      ("x", "y", 2L, 3L, 3L, 4L, 888888L, false),
      ("x", "z", 1L, 3L, 1L, 4L, 1333333L, true)))
  }
}
