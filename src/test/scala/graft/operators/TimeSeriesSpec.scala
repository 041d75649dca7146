package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Exact-integer time-series aggregates: gap attribution, island
  * merging, streak islands. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("timeWeightedSum attributes each gap to the earlier row") {
    // k: v=10 at t=0, v=20 at t=5, v=30 at t=15 (last holds no gap)
    // twsum = 10·5e6 + 20·10e6 = 250e6; span = 15e6
    val df = Seq((1L, ts(0), 100L, 10L), (1L, ts(5), 101L, 20L),
      (1L, ts(15), 102L, 30L)).toDF("k", "t", "id", "v")
    val got = TimeSeries.timeWeightedSum(df, "k", "t", "id", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 3L, 15000000L, 250000000L)))
  }

  test("timeWeightedSum: singleton key sums zero over zero span") {
    val df = Seq((1L, ts(9), 1L, 42L)).toDF("k", "t", "id", "v")
    val got = TimeSeries.timeWeightedSum(df, "k", "t", "id", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 0L, 0L)))
  }

  test("intervalCoverage merges overlaps, keeps gaps, absorbs contained") {
    // [0,10) [5,12) merge -> 12; [20,25) separate -> 5; [21,23) contained
    val df = Seq((1L, 0L, 10L, 1L), (1L, 5L, 12L, 2L),
      (1L, 20L, 25L, 3L), (1L, 21L, 23L, 4L)).toDF("k", "s", "e", "id")
    val got = TimeSeries.intervalCoverage(df, "k", "s", "e", "id")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 2L, 17L)))
  }

  test("intervalCoverage: adjacent half-open intervals merge") {
    val df = Seq((1L, 0L, 10L, 1L), (1L, 10L, 20L, 2L)).toDF("k", "s", "e", "id")
    val got = TimeSeries.intervalCoverage(df, "k", "s", "e", "id")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 20L)))
  }

  test("latenessAudit: strict < against the prior high-water mark") {
    // arrival 1..5, event times 10, 30, 20, 30, 25:
    // late: t=20 (hw 30, late 10), t=25 (hw 30, late 5); t=30 ties hw
    // -> NOT late (strict)
    val df = Seq((1L, 1L, 10L), (1L, 2L, 30L), (1L, 3L, 20L),
      (1L, 4L, 30L), (1L, 5L, 25L)).toDF("k", "a", "t")
    val got = TimeSeries.latenessAudit(df, "k", "a", "t", "a")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 5L, 2L, 10L)))
  }

  test("latenessAudit: an in-order key reports zero") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("k", "a", "t")
    val got = TimeSeries.latenessAudit(df, "k", "a", "t", "a")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 2L, 0L, 0L)))
  }

  test("groupTrend: exact OLS rationals on a hand-checked line") {
    // y = 3x + 10 exactly: slope_num/slope_den must reduce to 3
    val df = Seq((1L, 100L, 310L), (1L, 101L, 313L), (1L, 102L, 316L),
      (1L, 103L, 319L)).toDF("g", "x", "y")
    val got = TimeSeries.groupTrend(df, "g", "x", "y")
      .selectExpr("g", "slope_num", "slope_den", "rising")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(got._2 == 3 * got._3 && got._3 > 0 && got._4)
    // re-based x: sums must reflect x in {0,1,2,3}, not {100..103}
    val sums = TimeSeries.groupTrend(df, "g", "x", "y")
      .selectExpr("sx", "sxx").as[(Long, Long)].collect().head
    assert(sums == ((6L, 14L)))
  }

  test("latenessAudit: duplicate arrival values break ties by idCol") {
    // two rows share arrival 1; id order (10, 20) then (5): with the
    // id tie-break the t=5 row sees hw=20 (late 15) deterministically
    val df = Seq((1L, 1L, 10L, 1L), (1L, 1L, 20L, 2L), (1L, 2L, 5L, 3L))
      .toDF("k", "a", "t", "id")
    val got = TimeSeries.latenessAudit(df, "k", "a", "t", "id")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 3L, 1L, 15L)))
  }

  test("groupTrend: all-x-equal group reports rising = NULL") {
    val df = Seq((1L, 5L, 10L), (1L, 5L, 99L)).toDF("g", "x", "y")
    val got = TimeSeries.groupTrend(df, "g", "x", "y")
      .selectExpr("slope_den", "rising").collect().head
    assert(got.getLong(0) == 0L && got.isNullAt(1))
  }

  test("groupTrend: a falling series reports rising = false") {
    val df = Seq((1L, 0L, 100L), (1L, 1L, 90L), (1L, 2L, 95L))
      .toDF("g", "x", "y")
    val got = TimeSeries.groupTrend(df, "g", "x", "y")
      .selectExpr("slope_num", "rising")
      .as[(Long, Boolean)].collect().head
    assert(got._1 < 0 && !got._2)
  }

  test("slidingDistinctRegisters: window edges and register merges " +
      "equal the from-scratch rebuild") {
    import graft.functions.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    // activity on days 1, 2, 9 — day 2's window spans {1,2}; day 9's
    // window (3..9) must NOT see them
    val df = Seq((1L, "u1"), (1L, "u2"), (2L, "u2"), (2L, "u3"),
      (9L, "u1")).toDF("day", "u")
    val got = TimeSeries.slidingDistinctRegisters(df, "day", "u", 7, 4)
      .as[(Long, Long, Long)].collect().toSet
    def oneShot(day: Long, users: Seq[String]) =
      users.toDF("u")
        .select(Sketches.hash60(col("u").cast("string")).as("h"))
        .agg(Sketches.hllSketch(col("h"), 4).as("r"))
        .select(org.apache.spark.sql.functions.posexplode(col("r")))
        .as[(Int, Int)].collect()
        .map { case (b, r) => (day, b.toLong, r.toLong) }.toSet
    val want = oneShot(1L, Seq("u1", "u2")) ++
      oneShot(2L, Seq("u1", "u2", "u3")) ++ oneShot(9L, Seq("u1"))
    assert(got == want)
  }

  test("slidingDistinctExact: window edges, OR idempotence, true counts") {
    // day 1 {u1,u2}, day 2 {u2,u3}, day 9 {u1}: wau(2) = 3 (overlap u2
    // counted once), wau(9) = 1 (days 1-2 aged out)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (9L, 1L))
      .toDF("day", "u")
    val got = TimeSeries.slidingDistinctExact(df, "day", "u", 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (2L, 2L, 3L), (9L, 1L, 1L)))
  }

  test("dayStreaks: islands, longest run, duplicates collapse") {
    // days {1,2,3, 7, 9,10} (3 visits on day 2)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 2L), (1L, 3L),
      (1L, 7L), (1L, 9L), (1L, 10L)).toDF("k", "day")
    val got = TimeSeries.dayStreaks(df, "k", "day")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 3L, 3L, 6L)))
  }
  test("intervalIntersection: clips, touch-only pairs, and overlapping " +
      "clips collapse correctly") {
    // A: [0,100), [200,300); B: [50,250), [300,400)
    // clips: [50,100), [200,250); touch at 300 contributes nothing
    val a = Seq((1L, 1L, 0L, 100L), (1L, 2L, 200L, 300L))
      .toDF("k", "id", "s", "e")
    val b = Seq((1L, 10L, 50L, 250L), (1L, 11L, 300L, 400L))
      .toDF("k", "id", "s", "e")
    val got = TimeSeries.intervalIntersection(a, b, "k", "id", "s", "e",
        bucketUs = 100L)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 2L, 100L)))
    // overlapping clips dedupe through the island sweep: two A
    // intervals both intersecting one B window must not double-count
    val a2 = Seq((1L, 1L, 0L, 80L), (1L, 2L, 40L, 120L))
      .toDF("k", "id", "s", "e")
    val b2 = Seq((1L, 10L, 0L, 200L)).toDF("k", "id", "s", "e")
    val got2 = TimeSeries.intervalIntersection(a2, b2, "k", "id", "s", "e",
        bucketUs = 100L)
      .as[(Long, Long, Long)].collect().head
    assert(got2 == ((1L, 1L, 120L)))
  }
}
