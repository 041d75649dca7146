package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lines: fixed width, ragged tail, empty text") {
    val out = Seq(
        (1L, "a b c d e f g"), // 2 lines, tail ragged
        (2L, "a b c"),         // 1 ragged line
        (3L, ""),              // no lines
        (4L, "  x   y  "))     // whitespace-noise tokenization
      .toDF("id", "text")
      .select($"id", TextAnalysis.tokens($"text").as("_toks"))
      .select($"id", LineDedup.linesFromTokens($"_toks", 5).as("ls"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c d e", "f g"))
    assert(out(2L) == Seq("a b c"))
    assert(out(3L) == Seq.empty)
    assert(out(4L) == Seq("x y"))
  }

  /** Naive reference: explode every doc's lines in (id, idx) order, keep a
    * line iff its text was never seen before (corpus-global first
    * occurrence), reassemble per doc. */
  private def naive(docs: Seq[(Long, String)], lt: Int)
      : Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.Set[String]()
    val perDoc = scala.collection.mutable.LinkedHashMap[Long,
      (Long, Long, Vector[String])]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val ls = toks.grouped(lt).map(_.mkString(" ")).toVector
      if (ls.nonEmpty) {
        val kept = ls.filter(l => seen.add(l))
        perDoc(id) = (ls.size.toLong, kept.size.toLong, kept)
      }
    }
    perDoc.view.mapValues { case (n, k, ls) => (n, k, ls.mkString(" ")) }.toMap
  }

  test("dedupLines matches the naive first-occurrence reference") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      // exact clone of 10 → keeps nothing
      (20L, "the quick brown fox jumps over the lazy dog today"),
      // shares the FIRST 5-token line with 10, second line is new
      (30L, "the quick brown fox jumps into a cold river now"),
      // empty → no output row
      (40L, ""),
      // within-doc repeat: two identical lines, first kept only
      (50L, "alpha beta gamma delta eps alpha beta gamma delta eps"))
    val got = LineDedup.dedupLines(docs.toDF("doc_id", "text"),
        "doc_id", "text", 5)
      .select($"doc_id", $"n_lines", $"n_kept", $"kept_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == naive(docs, 5))
    assert(!got.contains(40L))         // empty doc: no row, not a zero row
    assert(got(20L) == ((2L, 0L, ""))) // clone keeps nothing, text empty
    assert(got(50L)._2 == 1L)          // within-doc dup collapses
  }

  test("first occurrence is by (doc_id, line_idx), not arrival order") {
    // the shared line sits LAST in doc 1 and FIRST in doc 2 → doc 1 owns it
    val docs = Seq(
      (2L, "z z z z z m m m m m"),
      (1L, "a b c d e z z z z z"))
    val got = LineDedup.dedupLines(docs.toDF("doc_id", "text"),
        "doc_id", "text", 5)
      .select($"doc_id", $"n_kept").as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L) // both its lines are first occurrences
    assert(got(2L) == 1L) // loses "z z z z z" to doc 1, keeps "m m m m m"
  }
}
