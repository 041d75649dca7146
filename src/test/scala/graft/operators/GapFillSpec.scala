package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Densify + fill-forward: the per-key bucket grid with carried
  * observations. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private val observed = Seq(
    // (key, bucket, v)
    ("a", 1L, Some(10L)), ("a", 4L, None), ("a", 6L, Some(60L)),
    ("b", 3L, Some(30L)))
    .toDF("k", "day", "v")

  test("densify emits every step between each key's min and max") {
    val got = GapFill.densify(observed, Seq("k"), "day")
      .select("k", "day").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 5L), ("a", 6L), ("b", 3L)))
  }

  test("gap rows carry null payloads; observed rows keep theirs") {
    val got = GapFill.densify(observed, Seq("k"), "day")
      .as[(String, Long, Option[Long])].collect().toMap2
    assert(got(("a", 1L)).contains(10L))
    assert(got(("a", 2L)).isEmpty) // gap
    assert(got(("a", 4L)).isEmpty) // observed-but-null stays null
  }

  test("null keys keep their observed payloads (null-safe grid join)") {
    val df = Seq((Option.empty[String], 1L, Some(7L)),
      (Option.empty[String], 3L, Some(9L)), (Some("a"), 1L, Some(1L)))
      .toDF("k", "day", "v")
    val got = GapFill.densify(df, Seq("k"), "day")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map(
      (None, 1L) -> Some(7L), (None, 2L) -> None, (None, 3L) -> Some(9L),
      (Some("a"), 1L) -> Some(1L)))
  }

  test("a null bucket fails loudly instead of silently vanishing") {
    val df = Seq((Some("a"), Some(1L), 10L), (Some("a"), None, 99L))
      .toDF("k", "day", "v")
    val ex = intercept[Exception] {
      GapFill.densify(df, Seq("k"), "day").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("null buckets cannot be gridded")))
  }

  test("step > 1 strides the grid") {
    val got = GapFill.densify(observed.filter(col("k") === "a"),
        Seq("k"), "day", step = 2L)
      .select("day").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L)) // 1, 3, 5 — max 6 unreachable mid-stride
  }

  test("fillForward carries the last non-null observation, per key") {
    val dense = GapFill.densify(observed, Seq("k"), "day")
    val got = GapFill.fillForward(dense, Seq("k"), "day", Seq("v"))
      .as[(String, Long, Option[Long])].collect().toMap2
    assert(got(("a", 2L)).contains(10L)) // gap inherits day 1
    assert(got(("a", 5L)).contains(10L)) // observed null also inherits
    assert(got(("a", 6L)).contains(60L)) // fresh observation wins
    assert(got(("b", 3L)).contains(30L)) // keys never cross
  }

  test("leading nulls stay null (nothing to carry)") {
    val df = Seq(("a", 1L, None: Option[Long]), ("a", 2L, Some(5L)))
      .toDF("k", "day", "v")
    val got = GapFill.fillForward(df, Seq("k"), "day", Seq("v"))
      .as[(String, Long, Option[Long])].collect().toMap2
    assert(got(("a", 1L)).isEmpty)
  }

  private implicit class Tuples3[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
