package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: exhaustive all-pairs Levenshtein ≤ 1. */
  private def allPairsRef(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) d(i)(0) = i
      for (j <- 0 to b.length) d(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, ta) <- rows
      (ib, tb) <- rows
      if ia < ib
      dist = lev(ta, tb) if dist <= 1
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def pairsOf(rows: Seq[(Long, String)],
                      maxBucket: Int = 256): Set[(Long, Long, Long)] =
    FuzzyDedup.nearDupPairs(rows.toDF("doc_id", "name"), "doc_id", "name",
        maxBucket)
      .as[(Long, Long, Long)].collect().toSet

  test("deletion-neighborhood blocking is COMPLETE: equality to all-pairs " +
      "on a seeded typo corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val bases = Seq.fill(12)((1 to (4 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = (0 until 120).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      val t = rnd.nextInt(4) match {
        case 0 => b // exact clone
        case 1 => // substitution at a random position
          val p = rnd.nextInt(b.length)
          b.updated(p, alphabet(rnd.nextInt(alphabet.length)))
        case 2 => // deletion at a random position
          val p = rnd.nextInt(b.length)
          b.substring(0, p) + b.substring(p + 1)
        case _ => // insertion at a random position
          val p = rnd.nextInt(b.length + 1)
          b.substring(0, p) + alphabet(rnd.nextInt(alphabet.length)) +
            b.substring(p)
      }
      (i.toLong, t)
    }
    val want = allPairsRef(rows)
    assert(want.nonEmpty, "corpus must actually contain near-dup pairs")
    assert(want.exists(_._3 == 0L) && want.exists(_._3 == 1L),
      "corpus must contain both exact-clone and distance-1 pairs")
    assert(pairsOf(rows) == want)
  }

  test("substitution, insertion, deletion, and exact clones all pair; " +
      "distance-2 strings never do") {
    val rows = Seq(
      1L -> "alpha", 2L -> "alpxa", // substitution
      3L -> "alphax",               // insertion vs 1
      4L -> "alph",                 // deletion vs 1
      5L -> "alpha",                // exact clone of 1
      6L -> "omega")                // unrelated
    val got = pairsOf(rows)
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((1L, 3L, 1L)))
    assert(got.contains((1L, 4L, 1L)))
    assert(got.contains((1L, 5L, 0L)))
    assert(!got.exists { case (a, b, _) => a == 6L || b == 6L })
    // alpxa vs alph is distance 2 - must not surface
    assert(!got.contains((2L, 4L, 2L)) && !got.exists(_._3 > 1L))
    assert(got == allPairsRef(rows))
  }

  test("degenerate hot buckets drop under the cap; a raised cap restores " +
      "the full pair set") {
    val rows = (1L to 10L).map(i => i -> "aaaa")
    assert(pairsOf(rows, maxBucket = 2).isEmpty)
    val full = pairsOf(rows, maxBucket = 16)
    assert(full.size == 45 && full.forall(_._3 == 0L)) // C(10,2) clones
  }

  test("dedup keeps the smallest id of each fuzzy cluster and every " +
      "unpaired row") {
    val df = Seq(1L -> "alpha", 2L -> "alphx", 3L -> "beta",
      4L -> "alpham").toDF("doc_id", "name")
    val kept = FuzzyDedup.dedup(df, "doc_id", "name")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("null texts yield no pairs and do not crash") {
    val df = Seq((1L, Some("alpha")), (2L, None), (3L, Some("alphx")))
      .toDF("doc_id", "name")
    val got = FuzzyDedup.nearDupPairs(df, "doc_id", "name")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L)))
  }
}
