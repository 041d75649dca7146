package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{SpanDedup, TextAnalysis}

class SpanHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "a b c d e f",
    2L -> "x y z a b c d q r",
    3L -> "a b c d e f",          // clone of 1
    4L -> "m m m m m",            // within-doc repetition
    5L -> "t u",                  // shorter than n
    6L -> "")

  test("kernel equals the composed HOF formulation, position order kept") {
    val n = 3
    val d = docs.toDF("id", "text")
      .select($"id", TextAnalysis.tokens(lower($"text")).as("_toks"))
    val composed = d.select($"id",
        when(size($"_toks") >= n,
          transform(sequence(lit(0), size($"_toks") - n),
            i => xxhash64(concat_ws(" ", slice($"_toks", i + lit(1), lit(n))))))
          .otherwise(array().cast("array<long>")).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val fused = d.select($"id",
        SpanHashExpr.spanHashes($"_toks", n).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused == composed)
  }

  test("SQL registration: span_hash(tokens, n)") {
    GraftExtensions.register(spark)
    docs.toDF("id", "text").createOrReplaceTempView("span_docs")
    val out = spark.sql(
      """SELECT id, span_hash(filter(split(trim(lower(text)), '\\s+'),
        |  t -> t != ''), 3) AS hs FROM span_docs""".stripMargin)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).length == 4 && out(1L) == out(3L))
    assert(out(5L).isEmpty && out(6L).isEmpty)
  }

  test("fast report equals the portable report") {
    val df = docs.toDF("id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"id", $"n_spans", $"n_dup_spans", $"dup_span_frac", $"keep")
        .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(rows(SpanDedup.spanReportFast(df, "id", "text", 3)) ==
      rows(SpanDedup.spanReport(df, "id", "text", 3)))
  }
}
