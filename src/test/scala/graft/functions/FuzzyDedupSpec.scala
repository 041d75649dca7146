package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: exhaustive all-pairs Levenshtein ≤ maxDist. */
  private def allPairsRef(rows: Seq[(Long, String)],
                          maxDist: Int = 1): Set[(Long, Long, Long)] = {
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
      dist = lev(ta, tb) if dist <= maxDist
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def pairsOf(rows: Seq[(Long, String)], maxBucket: Int = 256,
                      maxDist: Int = 1): Set[(Long, Long, Long)] =
    FuzzyDedup.nearDupPairs(rows.toDF("doc_id", "name"), "doc_id", "name",
        maxBucket, maxDist)
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

  test("depth-2 blocking is COMPLETE for distance <= 2: equality to " +
      "all-pairs on a double-typo corpus") {
    val rnd = new scala.util.Random(77)
    val alphabet = "abcd"
    def mutate(b: String): String = rnd.nextInt(3) match {
      case 0 if b.nonEmpty => // substitution
        val p = rnd.nextInt(b.length)
        b.updated(p, alphabet(rnd.nextInt(alphabet.length)))
      case 1 if b.nonEmpty => // deletion
        val p = rnd.nextInt(b.length)
        b.substring(0, p) + b.substring(p + 1)
      case _ => // insertion
        val p = rnd.nextInt(b.length + 1)
        b.substring(0, p) + alphabet(rnd.nextInt(alphabet.length)) +
          b.substring(p)
    }
    val bases = Seq.fill(8)((1 to (4 + rnd.nextInt(4)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = (0 until 90).map { i =>
      var t = bases(rnd.nextInt(bases.length))
      (0 until rnd.nextInt(3)).foreach(_ => t = mutate(t)) // 0-2 edits
      (i.toLong, t)
    }
    val want = allPairsRef(rows, maxDist = 2)
    assert(want.exists(_._3 == 2L), "corpus must contain distance-2 pairs")
    assert(pairsOf(rows, maxBucket = 8192, maxDist = 2) == want)
  }

  test("depth-2 pairs double substitutions and insert+substitute combos " +
      "that depth-1 misses; distance-3 never surfaces") {
    val rows = Seq(
      1L -> "martha", 2L -> "narthx", // two substitutions: d=2
      3L -> "marthaxy",               // two insertions vs 1: d=2
      4L -> "artha",                  // deletion: d=1 vs 1, d=2 w/ others
      5L -> "zzzzzz")                 // far from everything
    val d1 = pairsOf(rows, maxDist = 1)
    assert(!d1.exists { case (a, b, _) => (a, b) == (1L, 2L) })
    val d2 = pairsOf(rows, maxBucket = 1024, maxDist = 2)
    assert(d2.contains((1L, 2L, 2L)) && d2.contains((1L, 3L, 2L)) &&
      d2.contains((1L, 4L, 1L)))
    assert(!d2.exists { case (a, b, _) => a == 5L || b == 5L })
    assert(d2 == allPairsRef(rows, maxDist = 2))
  }

  test("depth-2 short-string edges: empty and single-char strings pair " +
      "by their true distance, no phantom variants") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abcd")
    val d2 = pairsOf(rows, maxDist = 2)
    // lev: (""/"a")=1, (""/"ab")=2, ("a"/"ab")=1, ("a"/"abcd")=3 out,
    // ("ab"/"abcd")=2, (""/"abcd")=4 out
    assert(d2 == Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L),
      (3L, 4L, 2L)))
    assert(d2 == allPairsRef(rows, maxDist = 2))
  }

  test("bipartite probe equals the exhaustive cross reference and never " +
      "emits within-side pairs") {
    val corpus = Seq(1L -> "alpha", 2L -> "alphx", 3L -> "beta",
      4L -> "gamma")
    val batch = Seq(10L -> "alpha", 11L -> "alpa", 12L -> "delta",
      13L -> "bketa")
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
    for (md <- Seq(1, 2)) {
      val want = (for {
        (ci, ct) <- corpus
        (bi, bt) <- batch
        dist = lev(ct, bt) if dist <= md
      } yield (ci, bi, dist.toLong)).toSet
      val got = FuzzyDedup.crossNearDupPairs(
          corpus.toDF("doc_id", "name"), batch.toDF("doc_id", "name"),
          "doc_id", "name", maxBucket = 1024, maxDist = md)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"maxDist=$md")
      // within-side near-dups (1,2 in corpus) must never surface
      assert(!got.exists { case (a, b, _) => a == 2L && b == 1L })
    }
  }

  test("bipartite cap counts the JOINT bucket across both sides") {
    // 9 corpus clones + 1 batch clone: joint bucket 10 > cap 8, so the
    // batch copy pairs with nothing; raising the cap restores all 9
    val corpus = (1L to 9L).map(i => i -> "aaaa")
    val batch = Seq(100L -> "aaaa")
    def run(cap: Int) = FuzzyDedup.crossNearDupPairs(
        corpus.toDF("doc_id", "name"), batch.toDF("doc_id", "name"),
        "doc_id", "name", maxBucket = cap)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(8).isEmpty)
    assert(run(16) == (1L to 9L).map(i => (i, 100L, 0L)).toSet)
  }

  test("token-level pairs equal the all-pairs DP reference on a seeded " +
      "title corpus") {
    def tokLev(a: Seq[String], b: Seq[String]): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) d(i)(0) = i
      for (j <- 0 to b.length) d(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val bases = Seq.fill(10)(
      Seq.fill(2 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))))
    val rows = (0 until 150).map { i =>
      val b = bases(rnd.nextInt(bases.size))
      val t = rnd.nextInt(4) match {
        case 0 => b
        case 1 if b.nonEmpty => // drop a token
          val p = rnd.nextInt(b.size); b.patch(p, Nil, 1)
        case 2 => // insert a token
          val p = rnd.nextInt(b.size + 1)
          b.patch(p, Seq(vocab(rnd.nextInt(vocab.size))), 0)
        case _ if b.nonEmpty => // substitute a token
          val p = rnd.nextInt(b.size)
          b.updated(p, vocab(rnd.nextInt(vocab.size)))
        case _ => b
      }
      (i.toLong, t)
    }
    val want = (for {
      (ia, ta) <- rows
      (ib, tb) <- rows
      if ia < ib
      dist = tokLev(ta, tb) if dist <= 1
    } yield (ia, ib, dist.toLong)).toSet
    assert(want.exists(_._3 == 0L) && want.exists(_._3 == 1L))
    val got = FuzzyDedup.tokenNearDupPairs(
        rows.toDF("doc_id", "toks"), "doc_id", "toks", maxBucket = 8192)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("token-level edge cases: empty sequences, single tokens, and " +
      "token-vs-char distance divergence") {
    val rows = Seq(
      1L -> Seq("alpha", "beta"),
      2L -> Seq("alpha"),               // one deletion: d1
      3L -> Seq("alpha", "beta", "c"),  // one insertion vs 1: d1
      4L -> Seq.empty[String],          // d1 vs 2 (single delete)
      5L -> Seq("alphax", "betax"))     // 2 CHAR edits but 2 TOKEN subs
    val got = FuzzyDedup.tokenNearDupPairs(
        rows.toDF("doc_id", "toks"), "doc_id", "toks")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)))
    assert(got.contains((2L, 4L, 1L)))
    // [alphax, betax] is 2 token-substitutions from [alpha, beta]:
    // char-close, token-far - must NOT pair
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L })
    assert(!got.contains((1L, 4L, 2L)) && got.forall(_._3 <= 1L))
  }

  test("bipartite token probe equals the exhaustive cross DP reference " +
      "and never emits within-side pairs") {
    def tokLev(a: Seq[String], b: Seq[String]): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) d(i)(0) = i
      for (j <- 0 to b.length) d(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val corpus = Seq(
      1L -> Seq("alpha", "beta", "gamma"),
      2L -> Seq("alpha", "beta"), // within-side d1 of 1: must not leak
      3L -> Seq("delta"))
    val batch = Seq(
      10L -> Seq("alpha", "beta", "gamma"),  // clone of 1
      11L -> Seq("alpha", "gamma"),          // d1 of 2? no: ["alpha","beta"]->sub; d1 of 1: drop beta
      12L -> Seq("eps", "zeta", "eta"))      // far
    val want = (for {
      (ci, ct) <- corpus
      (bi, bt) <- batch
      dv = tokLev(ct, bt) if dv <= 1
    } yield (ci, bi, dv.toLong)).toSet
    assert(want.nonEmpty)
    val got = FuzzyDedup.crossTokenNearDupPairs(
        corpus.toDF("doc_id", "toks"), batch.toDF("doc_id", "toks"),
        "doc_id", "toks", maxBucket = 1024)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L })
  }

  test("length-difference prefilter is recall-free at its boundary: " +
      "pairs at length diff exactly maxDist still surface") {
    // |len(a)-len(b)| <= lev(a,b), so the candidate-stage prefilter
    // abs(len diff) <= maxDist can never drop a true pair; the boundary
    // (diff == maxDist) is the case a off-by-one would break
    val d1 = Seq(1L -> "abc", 2L -> "abcd") // diff 1, lev 1
    assert(pairsOf(d1, maxDist = 1) == Set((1L, 2L, 1L)))
    val d2 = Seq(1L -> "ab", 2L -> "abcd") // diff 2, lev 2
    assert(pairsOf(d2, maxBucket = 64, maxDist = 2) == Set((1L, 2L, 2L)))
    assert(pairsOf(d2, maxDist = 1).isEmpty) // diff 2 > maxDist 1: out
  }

  test("identical-text groups expand to every member pair exactly once, " +
      "mixed with cross-text fuzzy pairs") {
    // the distinct-text factoring recovers member pairs by join fan-out;
    // this pins the expansion against the exhaustive reference on a
    // corpus mixing clone groups with fuzzy neighbors of those clones
    val rows = Seq(1L -> "kappa", 2L -> "kappa", 3L -> "kappa",
      4L -> "kappax", 5L -> "kappax", 6L -> "kapa", 7L -> "omega")
    val got = pairsOf(rows)
    assert(got == allPairsRef(rows))
    assert(got.count(_._3 == 0L) == 4) // C(3,2) + C(2,2)
  }

  test("an id appearing with two different texts still pairs across " +
      "texts (the min-id surrogate is tie-broken, never bare)") {
    // both distinct texts share min member id 5 — a bare `rid < rid`
    // candidate order would silently kill the abc/abd cross-pairs
    val rows = Seq(5L -> "abc", 7L -> "abc", 5L -> "abd", 9L -> "abd")
    val got = pairsOf(rows)
    assert(got == allPairsRef(rows))
    assert(got.contains((5L, 9L, 1L)) && got.contains((7L, 9L, 1L)))
    assert(!got.exists(p => p._1 == p._2)) // no self-pair for id 5
  }

  test("null texts yield no pairs and do not crash") {
    val df = Seq((1L, Some("alpha")), (2L, None), (3L, Some("alphx")))
      .toDF("doc_id", "name")
    val got = FuzzyDedup.nearDupPairs(df, "doc_id", "name")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L)))
  }

  test("provenance: dropped set complements dedup's survivors; exact " +
       "outranks fuzzy; keeper is the closest then-smallest neighbor") {
    val df = Seq(
      (1L, "alpha"),   // keeper of the alpha group
      (2L, "alpha"),   // exact dup of 1
      (3L, "alphx"),   // fuzzy of 1/2 (d=1)
      (4L, "alpha"),   // exact dup of 1 (not 2 — min exact keeper)
      (5L, "beta"),    // untouched survivor
      (6L, "alphx"))   // exact dup of 3 — exact outranks its fuzzy links
      .toDF("doc_id", "name")
    val prov = FuzzyDedup.provenance(df, "doc_id", "name")
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(prov == Map(
      2L -> (1L, "exact", 0L),
      3L -> (1L, "fuzzy", 1L),
      4L -> (1L, "exact", 0L),
      6L -> (3L, "exact", 0L)))
    // the dropped ids are exactly the complement of dedup's survivors
    val survivors = FuzzyDedup.dedup(df, "doc_id", "name")
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 5L))
    assert(prov.keySet ++ survivors == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert((prov.keySet & survivors).isEmpty)
  }

  test("provenance at depth 2: keeper is the CLOSEST neighbor, ties to " +
       "the smallest id") {
    val df = Seq(
      (3L, "abcde"),
      (7L, "abcdx"),    // d=1 from 3
      (9L, "abcdxz"))   // d=1 from 7, d=2 from 3 → keeper 7, dist 1
      .toDF("doc_id", "name")
    val prov = FuzzyDedup.provenance(df, "doc_id", "name", maxDist = 2)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(prov == Map(7L -> (3L, "fuzzy", 1L), 9L -> (7L, "fuzzy", 1L)))
  }

  test("null and empty texts across every entry point: nulls never pair, " +
       "empties follow the edit-distance semantics") {
    // the q122/q126/q129 corpus shape plus the degenerate rows a real
    // crawl delivers: NULL text, empty text, single chars
    val df = Seq(
      (1L, Some("alpha")), (2L, None), (3L, Some("alphx")),
      (4L, Some("")), (5L, Some("")), (6L, Some("x")))
      .toDF("doc_id", "name")
    // char-level: "" ≡ "" (dist 0), "" ~ "x" (dist 1); null drops
    val pairs = FuzzyDedup.nearDupPairs(df, "doc_id", "name")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L, 1L), (4L, 5L, 0L), (4L, 6L, 1L),
      (5L, 6L, 1L)))
    // depth 2: "x" also reaches "alphx"? no — lev("x","alphx")=4; but
    // nulls must still drop and empties still pair
    val pairs2 = FuzzyDedup.nearDupPairs(df, "doc_id", "name", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(!pairs2.exists(p => p._1 == 2L || p._2 == 2L))
    assert(pairs2.contains((4L, 5L, 0L)) && pairs2.contains((4L, 6L, 1L)))
    // bipartite: null/empty on BOTH sides; within-side pairs never emit
    val corpus = Seq((10L, Some("alpha")), (11L, None), (12L, Some("")))
      .toDF("doc_id", "name")
    val batch = Seq((20L, Some("alphz")), (21L, None), (22L, Some("")),
      (23L, Some("q"))).toDF("doc_id", "name")
    val cross = FuzzyDedup.crossNearDupPairs(corpus, batch, "doc_id", "name")
      .as[(Long, Long, Long)].collect().toSet
    assert(cross == Set((10L, 20L, 1L), (12L, 22L, 0L), (12L, 23L, 1L)))
    // dedup drops only the larger member of real pairs — null rows and
    // the smallest empty survive untouched
    val kept = FuzzyDedup.dedup(df, "doc_id", "name")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
    // token-level: null arrays drop, empty arrays pair with single-token
    // rows (token edit distance 1) and each other (identical)
    val toks = Seq(
      (1L, Some(Seq("a", "b"))), (2L, None),
      (3L, Some(Seq.empty[String])), (4L, Some(Seq.empty[String])),
      (5L, Some(Seq("z"))))
      .toDF("doc_id", "toks")
    val tp = FuzzyDedup.tokenNearDupPairs(toks, "doc_id", "toks")
      .as[(Long, Long, Long)].collect().toSet
    assert(tp == Set((3L, 4L, 0L), (3L, 5L, 1L), (4L, 5L, 1L)))
    // bipartite token probe: ["a","b"] is distance 2 from both [] and
    // ["z"], and the null row is on the corpus side — nothing pairs
    val tcross = FuzzyDedup.crossTokenNearDupPairs(
        toks.filter($"doc_id" <= 2), toks.filter($"doc_id" > 2),
        "doc_id", "toks")
      .as[(Long, Long, Long)].collect().toSet
    assert(tcross.isEmpty)
  }
}
