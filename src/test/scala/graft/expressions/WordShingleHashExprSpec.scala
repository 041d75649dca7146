package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{Dedup, TextAnalysis}

class WordShingleHashExprSpec extends SparkSpec {
  import spark.implicits._

  val texts = Seq(
    "the quick brown fox jumps over the lazy dog and more text here",
    "a b a b a b a b",           // heavy duplicate grams
    "one two three",             // exactly n tokens for n=3
    "just two", "single", "")    // short docs collapse; empty stays defined

  test("native fused hashes equal the composed HOF formulation bit-for-bit") {
    for (n <- Seq(2, 3)) {
      val out = texts.toDF("t")
        .select(
          Dedup.hashedWordShingles(TextAnalysis.tokens(lower($"t")), n).as("native"),
          Dedup.hashedShingles(
            Dedup.wordShingles(TextAnalysis.tokens(lower($"t")), n)).as("hof"))
        .as[(Seq[Long], Seq[Long])].collect()
      out.foreach { case (nat, hof) => assert(nat == hof, s"n=$n") }
    }
  }

  test("output is sorted, distinct, and in [0, P)") {
    val out = texts.toDF("t")
      .select(Dedup.hashedWordShingles(TextAnalysis.tokens($"t"), 3))
      .as[Seq[Long]].collect()
    out.foreach { hs =>
      assert(hs == hs.sorted && hs.distinct == hs)
      assert(hs.forall(h => h >= 0 && h < 2147483647L))
    }
  }

  test("null token array yields null") {
    val out = Seq(Option.empty[Seq[String]]).toDF("toks")
      .select(WordShingleHashExpr.wordShingleHashes($"toks", 3))
      .collect().head
    assert(out.isNullAt(0))
  }
}
