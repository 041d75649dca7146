package graft.operators

import graft.SparkSpec

/** FD + RI profiling audits: exact violation accounting, SQL-standard
  * null semantics. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("fdAudit counts fanning lhs and surplus rhs separately") {
    // a->1 only (holds); b->{1,2}; c->{1,2,3}: 2 violating lhs, 1+2 extra
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 2),
      ("c", 1), ("c", 2), ("c", 3)).toDF("l", "r")
    val got = Profiling.fdAudit(df, Seq("l" -> "r"))
      .as[(String, String, Long, Long, Long, Boolean)].collect().head
    assert(got == (("l", "r", 3L, 2L, 3L, false)))
  }

  test("fdAudit: null rhs never violates; null lhs is a group") {
    val df = Seq((Some("a"), Option(1)), (Some("a"), Option.empty[Int]),
      (Option.empty[String], Option(7))).toDF("l", "r")
    val got = Profiling.fdAudit(df, Seq("l" -> "r"))
      .as[(String, String, Long, Long, Long, Boolean)].collect().head
    // groups: a -> {1, null} = 1 distinct; null -> {7}
    assert(got._3 == 2L && got._6)
  }

  test("riAudit counts orphans; null child keys are legal") {
    val child = Seq(Option(1L), Option(2L), Option(9L),
      Option.empty[Long]).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profiling.riAudit(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(got == (("c->p", 3L, 1L, false)))
  }

  test("categoricalProfile: mode tie goes to the larger value; " +
      "Gini rationals exact; nulls are a category") {
    val df = Seq(("g", Some("a")), ("g", Some("a")), ("g", Some("b")),
      ("g", Some("b")), ("g", None)).toDF("k", "v")
    val got = Profiling.categoricalProfile(df, "k", "v").collect().head
    // counts {a:2, b:2, null:1}: tie a/b -> mode b (larger value)
    assert(got.getLong(1) == 5L && got.getLong(2) == 3L)
    assert(got.getString(3) == "b" && got.getLong(4) == 2L)
    // gini = (25 - (4+4+1)) / 25 = 16/25
    assert(got.getLong(5) == 16L && got.getLong(6) == 25L)
  }

  test("benfordAudit: exact digit counts, deviations, and verdicts") {
    // 6 values: digits 1,1,1,2,9 (and 0 dropped): N=5
    val df = Seq(1L, 19L, 150L, 250L, 900L, 0L).toDF("x")
    val got = Profiling.benfordAudit(df, "x", tolPpm = 200000)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    assert(got.keySet == (1L to 9L).toSet) // absent digits report 0
    // digit 1: n=3 → dev = |3e6 − 5·301030| = 1494850; tol·N = 1e6 → off
    assert(got(1L) == ((3L, 1494850L, true)))
    // digit 2: n=1 → dev = |1e6 − 5·176091| = 119545 → within
    assert(got(2L) == ((1L, 119545L, false)))
    // digit 3: n=0 → dev = 5·124939 = 624695 → within 1e6
    assert(got(3L) == ((0L, 624695L, false)))
    // digit 9: n=1 → dev = |1e6 − 5·45757| = 771215 → within
    assert(got(9L) == ((1L, 771215L, false)))
  }

  test("benfordAudit: non-positive values carry no first digit") {
    val df = Seq(-5L, 0L, 10L).toDF("x")
    val got = Profiling.benfordAudit(df, "x", 0)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got(1L) == 1L && got.values.sum == 1L)
  }

  test("riAudit intact relationship reports zero orphans") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Profiling.riAudit(child, "fk", parent, "pk", "ok")
      .as[(String, Long, Long, Boolean)].collect().head
    assert(got == (("ok", 3L, 0L, true)))
  }
  test("correlationAudit: perfect line is related, constant column is " +
      "NULL, anti-correlation flips direction") {
    import spark.implicits._
    // g=a: y = 2x exactly (corr 1); g=b: y constant (undefined);
    // g=c: y = -x (corr -1)
    val df = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 7L), ("b", 2L, 7L),
      ("c", 1L, 3L), ("c", 2L, 2L), ("c", 3L, 1L))
      .toDF("g", "x", "y")
    val got = Profiling.correlationAudit(df, "g", "x", "y", 1L, 2L)
      .selectExpr("g", "direction", "related").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
      .toMap
    assert(got("a") == ((1L, Some(true))))
    assert(got("b") == ((0L, None)))
    assert(got("c") == ((-1L, Some(true))))
  }
  test("correlationAudit: x·y and x·x products past Long range never " +
      "wrap — direction and verdict stay exact") {
    import spark.implicits._
    // y = x exactly at 4e9-scale values: single products reach 6.4e19
    // (> Long.MaxValue). A LongType accumulation wraps negative and
    // flips the covariance sign; the DECIMAL(38,0) sums must read
    // direction = +1. (`related` is not selected: at this magnitude
    // cov² exceeds 38 digits and fails LOUDLY in both engines — the
    // silent-wrap defect was in the sums.)
    val df = Seq(("h", 0L, 0L), ("h", 4000000000L, 4000000000L),
      ("h", 8000000000L, 8000000000L)).toDF("g", "x", "y")
    val got = Profiling.correlationAudit(df, "g", "x", "y", 1L, 2L)
      .selectExpr("g", "direction", "sxy").collect().head
    assert(got.getLong(1) == 1L)
    assert(got.isNullAt(2)) // BIGINT display gate nulls past ±9.2e18
  }

  test("log2Histogram: power-of-two boundaries land in the right " +
      "buckets; zero is bucket -1; negatives fail") {
    import spark.implicits._
    val df = Seq(("a", 0L), ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 7L), ("a", 8L)).toDF("g", "v")
    val got = Profiling.log2Histogram(df, "g", "v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", -1L, 1L, 0L, 0L), ("a", 0L, 1L, 1L, 1L),
      ("a", 1L, 2L, 2L, 3L), ("a", 2L, 2L, 4L, 7L),
      ("a", 3L, 1L, 8L, 8L)))
    val e = intercept[Exception] {
      Profiling.log2Histogram(Seq(("a", -5L)).toDF("g", "v"), "g", "v")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("log2Histogram")))
  }
}
