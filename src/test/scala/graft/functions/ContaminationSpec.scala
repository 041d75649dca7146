package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // n = 3 keeps the hand arithmetic readable; the operator is n-generic.
  private val bench = Seq((100L, "secret eval question one")).toDF("id", "text")

  test("overlapReport: hit counts, fractions, and the short-doc fallback") {
    val corpus = Seq(
      // 5 tokens → 3 distinct 3-grams, 2 of them in the benchmark
      (1L, "secret eval question one extra"),
      // no overlap
      (2L, "totally unrelated clean text here"),
      // SHORT doc (< 3 tokens): one all-tokens shingle, no vanishing
      (3L, "secret eval"),
      // short doc equal to a benchmark short-shingle? benchmark has 4
      // tokens → its shingles are proper 3-grams, so no match
      (4L, "secret")).toDF("id", "text")
    val got = Contamination.overlapReport(corpus, "id", "text", bench, "text", n = 3)
      .select($"id", $"n_shingles", $"n_hits", $"contam_frac", $"contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // bench 3-grams: {secret eval question, eval question one}
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0, true)))
    assert(got(2L) == ((3L, 0L, 0.0, false)))
    assert(got(3L) == ((1L, 0L, 0.0, false))) // present, one shingle
    assert(got(4L) == ((1L, 0L, 0.0, false)))
    assert(got.size == 4) // nothing silently dropped
  }

  test("decontaminate: strict and fractional thresholds") {
    val corpus = Seq(
      (1L, "secret eval question one extra"),   // frac 2/3
      (2L, "eval question one and some padding words"), // frac 1/5
      (3L, "totally unrelated clean text here")).toDF("id", "text")
    def ids(maxFrac: Double): Set[Long] =
      Contamination.decontaminate(corpus, "id", "text", bench, "text",
          n = 3, maxFrac = maxFrac)
        .select($"id").as[Long].collect().toSet
    assert(ids(0.0) == Set(3L))          // any shared shingle drops
    assert(ids(0.5) == Set(2L, 3L))      // 1/5 ≤ 0.5 < 2/3
    assert(ids(1.0) == Set(1L, 2L, 3L))  // nothing exceeds 1
    // decontaminate keeps every corpus column, none of the report's
    val cols = Contamination.decontaminate(corpus, "id", "text",
      bench, "text", n = 3, maxFrac = 0.0).columns.toSeq
    assert(cols == Seq("id", "text"))
  }

  test("documents absent from the report are kept (null-text keep path)") {
    val corpus = Seq((1L, "secret eval question one extra"),
        (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val kept = Contamination.decontaminate(corpus, "id", "text",
        bench, "text", n = 3, maxFrac = 0.0)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(2L)) // null text never contaminated, never dropped
  }
}
