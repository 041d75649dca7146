package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextAnalysis

class BpeTokenCountExprSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy longest-match, written independently of the trie
    * kernel: regex pre-tokenize with RE2's whitespace class (the DuckDB
    * oracle side — [\t\n\f\r ], NOT Java's \s which adds ), then
    * per alnum run strip the longest vocabulary prefix via a linear scan
    * over the vocab set. Java regex matches code points, so a surrogate
    * pair is one symbol piece — the kernel must agree. */
  private def naive(text: String): Long = {
    val vocab = BpeTokenCountExpr.vocabulary.toSet
    val maxLen = vocab.map(_.length).max
    val pieces = "[a-z0-9]+|[^a-z0-9\\t\\n\\f\\r ]".r
      .findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq
    pieces.map { p =>
      if (!p.head.isLetterOrDigit || p.head > 'z') 1L
      else {
        var rest = p
        var n = 0L
        while (rest.nonEmpty) {
          val take = (math.min(maxLen, rest.length) to 1 by -1)
            .find(l => vocab.contains(rest.substring(0, l))).get
          rest = rest.substring(take)
          n += 1
        }
        n
      }
    }.sum
  }

  test("vocabulary loads: deduped, alnum-only, all 36 single chars present") {
    val v = BpeTokenCountExpr.vocabulary
    assert(v.distinct.size == v.size)
    assert(v.forall(_.forall(c => c.isDigit || (c >= 'a' && c <= 'z'))))
    assert((('a' to 'z') ++ ('0' to '9')).forall(c => v.contains(c.toString)))
    assert(v.exists(_.length >= 4)) // real multi-char units, not just chars
  }

  test("trie kernel equals the naive longest-match reference") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog.",
      "internationalization", "ab cd.", "x,y", "", "   ",
      "a1b2c3 42  12x", "THE THE the", "don't stop-believing!",
      "héllo wörld", "punctuation... everywhere?!",
      // a surrogate pair (emoji) is ONE symbol token, not two; vertical
      // tab is a SYMBOL under RE2 \s, not whitespace
      "ok 😀 fine", "a\u000Bb")
    texts.foreach { t =>
      val got = Seq(t).toDF("t")
        .select(TextAnalysis.bpeTokenCountVocab($"t")).as[Long].head()
      assert(got == naive(t), s"text='$t' got=$got want=${naive(t)}")
    }
  }

  test("longest match wins over shorter units") {
    // "the" is a unit, so "the" = 1 token, not t+h+e or th+e
    def count(t: String): Long = Seq(t).toDF("t")
      .select(TextAnalysis.bpeTokenCountVocab($"t")).as[Long].head()
    assert(count("the") == 1L)
    assert(count("th") == 1L)
    // vocab count is never more than the per-char count, and at most the
    // heuristic count times max word length
    assert(count("internationalization") < "internationalization".length)
  }

  test("null yields null; expression stays inside whole-stage codegen") {
    val out = Seq(Option("abc"), None).toDF("t")
      .select(TextAnalysis.bpeTokenCountVocab($"t")).collect()
      .map(r => Option(r.get(0)))
    assert(out(0).contains(2L) && out(1).isEmpty) // "ab" + "c"
    // local literal frames constant-fold to LocalTableScan; a range scan
    // keeps a real projection, which must land inside a codegen span
    val plan = spark.range(4)
      .select(TextAnalysis.bpeTokenCountVocab(
        concat(lit("doc "), $"id".cast("string"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" star prefix is the whole-stage-codegen marker: the
    // projection containing the expression compiles, no fallback
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("bpe_token_count")))
  }
}
