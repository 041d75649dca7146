package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSegmentsExprSpec extends SparkSpec {
  import spark.implicits._

  private def seg(runs: String*): Seq[Seq[String]] =
    runs.toDF("r").select(BpeSegmentsExpr.bpeSegments($"r").as("u"))
      .as[Seq[String]].collect().toSeq

  /** Naive maximal-munch against the same vocabulary. */
  private def naive(run: String): Seq[String] = {
    val vocab = BpeTokenCountExpr.vocabulary.toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < run.length) {
      val end = (run.length to (i + 1) by -1)
        .find(e => vocab.contains(run.substring(i, e))).get
      out += run.substring(i, end)
      i = end
    }
    out.toSeq
  }

  test("segments match the naive longest-match reference on real runs") {
    val runs = Seq("the", "internationalization", "a1b2c3", "xyzzy",
      "2026", "preprocessing", "q", "zzzzzzzz")
    assert(seg(runs: _*) == runs.map(naive))
  }

  test("segments concatenate back to the input exactly") {
    val runs = Seq("establishment", "0x1f4a", "antidisestablishmentarianism")
    seg(runs: _*).zip(runs).foreach { case (units, run) =>
      assert(units.mkString == run)
      assert(units.forall(BpeTokenCountExpr.vocabulary.contains))
    }
  }

  test("unit count equals bpe_token_count on pure alnum runs") {
    val runs = Seq("tokenization", "99bottles", "abcdefghij")
    val viaSegments = seg(runs: _*).map(_.size.toLong)
    val viaCount = runs.toDF("r")
      .select(BpeTokenCountExpr.bpeTokenCountVocab($"r").as("n"))
      .as[Long].collect().toSeq
    assert(viaSegments == viaCount)
  }

  test("non-alnum input fails fast instead of desynchronizing") {
    intercept[Exception] {
      Seq("has space").toDF("r")
        .select(BpeSegmentsExpr.bpeSegments($"r")).collect()
    }
    intercept[Exception] {
      Seq("Upper").toDF("r")
        .select(BpeSegmentsExpr.bpeSegments($"r")).collect()
    }
  }
}
