package graft.operators

import graft.SparkSpec

/** Segment-scoped first/last-touch attribution on a hand-built
  * timeline. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // user 1: view(t1) click(t2) PURCHASE(t3, 100c) click(t4) PURCHASE(t5, 50c)
  //   conv 1: first=view, last=click; conv 2: first=last=click
  // user 2: PURCHASE(t1, 30c) with no touches -> direct
  private val rows = Seq(
    (1L, 10L, 1L, "view", 0L), (1L, 11L, 2L, "click", 0L),
    (1L, 12L, 3L, "purchase", 100L), (1L, 13L, 4L, "click", 0L),
    (1L, 14L, 5L, "purchase", 50L),
    (2L, 20L, 1L, "purchase", 30L))
    .toDF("u", "id", "t", "ty", "cents")

  test("segments reset at conversions; touchless conversions are direct") {
    val got = Attribution.firstLastTouch(rows, "u", "id", "t", "ty",
        "cents", Seq("view", "click"), "purchase")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("first_touch", "view", 1L, 100L),
      ("first_touch", "click", 1L, 50L),
      ("first_touch", "direct", 1L, 30L),
      ("last_touch", "click", 2L, 150L),
      ("last_touch", "direct", 1L, 30L)))
  }

  test("a touch AFTER the last conversion credits nothing") {
    val df = Seq((1L, 1L, 1L, "purchase", 10L), (1L, 2L, 2L, "view", 0L))
      .toDF("u", "id", "t", "ty", "cents")
    val got = Attribution.firstLastTouch(df, "u", "id", "t", "ty",
        "cents", Seq("view", "click"), "purchase")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("first_touch", "direct", 1L, 10L),
      ("last_touch", "direct", 1L, 10L)))
  }
}
