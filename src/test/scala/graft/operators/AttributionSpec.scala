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

  test("ties in t break by id for both models") {
    val df = Seq((1L, 2L, 5L, "click", 0L), (1L, 1L, 5L, "view", 0L),
      (1L, 3L, 6L, "purchase", 100L))
      .toDF("u", "id", "t", "ty", "cents")
    val got = Attribution.firstLastTouch(df, "u", "id", "t", "ty",
        "cents", Seq("view", "click"), "purchase")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("first_touch", "view", 1L, 100L),
      ("last_touch", "click", 1L, 100L)))
  }

  test("aggregate form equals the full-frame windowed form on a " +
      "pseudo-random timeline (the shape it replaced)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val types = Array("view", "click", "purchase", "other")
    val rows = (0 until 400).map { i =>
      val u = (i * 2654435761L % 7).abs
      val ty = types(((i * 40503L + 17) % 4).abs.toInt)
      (u, i.toLong, ((i * 9176L) % 97).abs, ty, (i % 13).toLong)
    }.toDF("u", "id", "t", "ty", "cents")
    val got = Attribution.firstLastTouch(rows, "u", "id", "t", "ty",
      "cents", Seq("view", "click"), "purchase")
    // reference: the unbounded-following window + distinct formulation
    val e = rows.filter(col("ty").isin("view", "click", "purchase"))
    val wSeg = Window.partitionBy(col("u")).orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = e.withColumn("seg",
      coalesce(sum(when(col("ty") === "purchase", 1L)).over(wSeg), lit(0L)))
    val wT = Window.partitionBy(col("u"), col("seg"))
      .orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val touches = seg.filter(col("ty") =!= "purchase")
      .select(col("u"), col("seg"),
        first(col("ty")).over(wT).as("first_type"),
        last(col("ty")).over(wT).as("last_type")).distinct()
    val j = seg.filter(col("ty") === "purchase")
      .select(col("u"), col("seg"), col("cents"))
      .join(touches, Seq("u", "seg"), "left")
      .select(col("cents"),
        coalesce(col("first_type"), lit("direct")).as("first_type"),
        coalesce(col("last_type"), lit("direct")).as("last_type"))
    def model(name: String, c: String) = j.groupBy(col(c).as("touch_type"))
      .agg(count(lit(1)).as("n_conv"), sum(col("cents")).as("cents"))
      .select(lit(name).as("model"), col("touch_type"), col("n_conv"),
        col("cents"))
    val ref = model("first_touch", "first_type")
      .unionAll(model("last_touch", "last_type"))
    assert(got.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))) ==
      ref.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))))
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
