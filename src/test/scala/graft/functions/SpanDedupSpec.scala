package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: materialize every n-token window STRING per doc,
    * count duplicates by global string equality (no hashing) — the report
    * must agree exactly (hash collisions are ~impossible on this corpus). */
  private def naive(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long)] = {
    val windows = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(w => id -> w.mkString(" ")).toSeq
    }
    val totals = windows.groupBy(_._2).view.mapValues(_.size).toMap
    docs.map { case (id, _) =>
      val mine = windows.filter(_._1 == id)
      id -> (mine.size.toLong,
        mine.count(w => totals(w._2) >= 2).toLong)
    }.toMap
  }

  private def report(docs: Seq[(Long, String)], n: Int) =
    SpanDedup.spanReport(docs.toDF("id", "text"), "id", "text", n)
      .select($"id", $"n_spans", $"n_dup_spans")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("span report equals the naive all-windows recount") {
    val docs = Seq(
      1L -> "a b c d e f",          // windows abc bcd cde def
      2L -> "x y z a b c d q r",    // shares abc+bcd? windows: xyz yza zab abc bcd cdq dqr
      3L -> "a b c d e f",          // exact clone of 1 — every window dup
      4L -> "m m m m m",            // within-doc repetition: mmm ×3 (self-dup)
      5L -> "t u",                  // shorter than n → 0 windows
      6L -> "")                     // empty
    assert(report(docs, 3) == naive(docs, 3))
  }

  test("clone corpus: clones and originals both fully duplicated") {
    val base = Seq(1L -> "one two three four five six seven eight nine ten",
                   2L -> "alpha beta gamma delta epsilon zeta eta theta")
    val corpus = base ++ base.map { case (id, t) => (id + 100L) -> t }
    val got = report(corpus, 4)
    assert(got == naive(corpus, 4))
    // every window of every doc is duplicated by its clone
    got.foreach { case (_, (n, dup)) => assert(n > 0 && dup == n) }
  }

  test("short documents report zero windows and keep = true") {
    val out = SpanDedup.spanReport(
        Seq(1L -> "just two", 2L -> "").toDF("id", "text"), "id", "text", 5)
      .select($"id", $"n_spans", $"dup_span_frac", $"keep")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.size == 2)
    out.values.foreach { case (n, frac, keep) =>
      assert(n == 0L && frac == 0.0 && keep)
    }
  }

  test("within-doc repetition counts as duplication") {
    // "p q p q p q": windows (n=2) pq qp pq qp pq — all totals >= 2
    val got = report(Seq(1L -> "p q p q p q"), 2)
    assert(got(1L) == ((5L, 5L)))
  }
}
