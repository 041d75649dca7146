package graft.operators

import graft.SparkSpec

/** Exact basket lift on a hand-checked co-occurrence table; struct
  * basket keys (no concat collisions), width cap. */
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

  test("separator characters inside a component never merge baskets: " +
      "(a:b, c) and (a, b:c) stay distinct") {
    val rows = Seq(("a:b", "c", "x"), ("a:b", "c", "y"),
      ("a", "b:c", "x"), ("a", "b:c", "z")).toDF("k1", "k2", "it")
    val got = Baskets.pairLift(rows, Seq("k1", "k2"), "it", 1L, 1L)
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    // two baskets {x,y} and {x,z}: N=2, c_x=2, c_y=c_z=1, lifts = 1.
    // a string-concat key would fuse them into one {x,y,z} basket.
    assert(got == Set(
      ("x", "y", 1L, 2L, 1L, 2L, 1000000L, true),
      ("x", "z", 1L, 2L, 1L, 2L, 1000000L, true)))
  }

  test("NULL components are positional: (null, x) and (x, null) are " +
      "different baskets") {
    val rows = Seq(
      (Option.empty[String], Some("x"), "p"),
      (Option.empty[String], Some("x"), "q"),
      (Some("x"), Option.empty[String], "p"),
      (Some("x"), Option.empty[String], "r"))
      .toDF("k1", "k2", "it")
    val got = Baskets.pairLift(rows, Seq("k1", "k2"), "it", 1L, 1L)
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    // concat_ws would skip the NULLs and fuse both baskets into "x"
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Set(("p", "q", 1L), ("p", "r", 1L)))
    assert(got.forall(_._6 == 2L)) // n_baskets = 2
  }

  test("maxBasket drops a degenerate wide basket entirely and the rest " +
      "equals the computation without it") {
    val rows = Seq(("b1", "x"), ("b1", "y"),
      ("wide", "p"), ("wide", "q"), ("wide", "r")).toDF("bk", "it")
    val capped = Baskets.pairLift(rows, Seq("bk"), "it", 1L, 1L,
        maxBasket = 2)
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    val without = Baskets.pairLift(rows.filter($"bk" =!= "wide"),
        Seq("bk"), "it", 1L, 1L)
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    assert(capped == without)
    assert(capped == Set(("x", "y", 1L, 1L, 1L, 1L, 1000000L, true)))
    // and the default is exact: no cap engaged
    val full = Baskets.pairLift(rows, Seq("bk"), "it", 1L, 1L)
      .collect()
    assert(full.length == 4) // (x,y) + (p,q),(p,r),(q,r)
    intercept[IllegalArgumentException](
      Baskets.pairLift(rows, Seq("bk"), "it", 1L, 1L, maxBasket = 1))
  }
}
