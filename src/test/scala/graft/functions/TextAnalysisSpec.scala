package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles extra whitespace and empty strings") {
    val out = Seq("a  b\tc", "", "  x ").toDF("t")
      .select(TextAnalysis.tokenCount($"t").as("n")).as[Long].collect().toSeq
    assert(out == Seq(3L, 0L, 1L))
  }

  test("bpeTokenCount counts alnum runs and punctuation marks") {
    val out = Seq("Hello, world!").toDF("t")
      .select(TextAnalysis.bpeTokenCount($"t").as("n")).as[Long].collect().head
    assert(out == 4L) // hello , world !
  }

  test("punctRatio and stopwordRatio are zero-guarded") {
    val row = Seq(("a.b!", ""), ("the cat", "")).toDF("t", "pad")
      .select(TextAnalysis.punctRatio($"t").as("p"),
        TextAnalysis.stopwordRatio($"t").as("s"))
      .as[(Double, Double)].collect()
    assert(row(0)._1 == 0.5) // 2 punct / 4 chars
    assert(row(1)._2 == 0.5) // 'the' of 2 tokens
  }

  test("qualityScore stays in [0,1]") {
    val out = Seq("", "the quick brown fox.", "a" * 2000).toDF("t")
      .select(TextAnalysis.qualityScore($"t").as("q")).as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId picks the language with most marker hits, en-first tiebreak") {
    val out = Seq("the cat and the dog is", "el gato de la casa los",
      "der hund und die katze das", "xyz").toDF("t")
      .select(TextAnalysis.langId($"t").as("l")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "de", "en")) // no markers → tiebreak en
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val out = Seq("The  Cat", "the cat", "the dog").toDF("t")
      .select(TextAnalysis.fingerprint($"t").as("f")).as[String].collect()
    assert(out(0) == out(1) && out(0) != out(2))
  }

  test("rollingHash is order-sensitive and stable") {
    val out = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TextAnalysis.rollingHash($"t").as("h")).as[Long].collect()
    assert(out(0) == out(2) && out(0) != out(1))
    assert(out.forall(h => h >= 0 && h < 1000000007L))
  }

  test("cleanText strips markup and collapses whitespace") {
    val out = Seq(
      "<p class=\"x\">hello   <b>world</b></p>\n<br/>",
      "  plain\t\ttext  ",
      "a < b but 2 > 1")
      .toDF("t").select(TextAnalysis.cleanText($"t")).as[String].collect()
    assert(out(0) == "hello world")
    assert(out(1) == "plain text")
    assert(out(2) == "a 1") // '< b but 2 >' parses as a tag — regex, not HTML
  }
}
