package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver reference: classic Sennrich BPE over a word-frequency map —
    * overlapping adjacent pair counts, argmax by (count desc, left asc,
    * right asc), greedy-leftmost application (a merged token never
    * re-matches as the left element within the same pass). */
  private def refTrain(words: Map[String, Long], n: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var state: Map[Seq[String], Long] =
      words.map { case (w, f) => w.map(_.toString) -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (i <- 1 to n) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((toks, f) <- state; j <- 0 until toks.size - 1)
        counts((toks(j), toks(j + 1))) += f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((i, a, b, a + b, c))
        state = state.map { case (toks, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          for (t <- toks) {
            if (t == b && merged.nonEmpty && merged.last == a)
              merged(merged.size - 1) = a + b
            else merged += t
          }
          merged.toSeq -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def trainOn(words: Map[String, Long], n: Int) = {
    val df = words.toSeq.toDF("w", "freq")
      .select(Bpe.delimit($"w").as("s"), $"freq")
    Bpe.train(df, n).orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
      .map(r => (r._1.toInt, r._2, r._3, r._4, r._5))
  }

  test("merge table equals the driver reference on a seeded corpus " +
      "with ties (tie-break: count desc, then left, then right)") {
    val words = Map("the" -> 5L, "that" -> 3L, "cat" -> 2L, "hat" -> 2L,
      "thee" -> 1L, "aaaa" -> 4L)
    for (n <- Seq(1, 3, 6, 10))
      assert(trainOn(words, n) == refTrain(words, n), s"n=$n")
  }

  test("greedy-leftmost application: identical-pair runs pair up " +
      "non-overlapping, alternating chains merge fully") {
    def apply1(w: String, a: String, b: String): String =
      Seq(w).toDF("w")
        .select(Bpe.applyMerge(Bpe.delimit($"w"), lit(a), lit(b)))
        .as[String].head()
    assert(apply1("aaaa", "a", "a") == "|aa|aa")
    assert(apply1("aaa", "a", "a") == "|aa|a")
    assert(apply1("ababab", "a", "b") == "|ab|ab|ab")
    assert(apply1("bab", "a", "b") == "|b|ab")
    assert(apply1("xyz", "a", "b") == "|x|y|z")
    // a token just merged never re-matches as the LEFT element
    assert(apply1("aab", "a", "a") == "|aa|b")
  }

  test("applyMerges tokenizes with a whole trained table in rank order") {
    val words = Map("lower" -> 4L, "lowest" -> 3L, "newer" -> 5L)
    val table = trainOn(words, 4)
    val merges = table.map(m => (m._2, m._3))
    // reference: fold the same merges over a fresh word
    var toks: Seq[String] = "lowers".map(_.toString)
    for ((a, b) <- merges) {
      val m = scala.collection.mutable.ArrayBuffer.empty[String]
      for (t <- toks) {
        if (t == b && m.nonEmpty && m.last == a) m(m.size - 1) = a + b
        else m += t
      }
      toks = m.toSeq
    }
    val got = Seq("lowers").toDF("w")
      .select(Bpe.applyMerges(Bpe.delimit($"w"), merges)).as[String].head()
    assert(got == "|" + toks.mkString("|"))
  }

  test("fuzz: random corpora match the reference at every merge depth") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val alphabet = "abcd"
      val words = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val n = 1 + rnd.nextInt(8)
      assert(trainOn(words, n) == refTrain(words, n),
        s"trial=$trial n=$n words=$words")
    }
  }

  test("wordCounts lower-cases, drops empties and separator-bearing " +
      "words, and weights by occurrence") {
    val df = Seq("The cat  the CAT", "a|b the").toDF("text")
    val got = Bpe.wordCounts(df, "text").orderBy("s")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("cat", "|c|a|t", 2L), ("the", "|t|h|e", 3L)))
  }

  test("native kernel == nested fold at every reachable depth (fuzz), " +
      "and a multi-thousand-merge table neither overflows nor stalls") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc"
    val words = (1 to 40).map(_ =>
      (1 to (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = words.toDF("w").select($"w", Bpe.delimit($"w").as("s"))
    val table = trainOn(
      words.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
      6).map(m => (m._2, m._3))
    for (depth <- 0 to table.size) {
      val m = table.take(depth)
      val both = df.select(
        Bpe.applyMerges($"s", m).as("k"),
        Bpe.applyMergesFolded($"s", m).as("f"))
      assert(both.filter($"k" =!= $"f").count() == 0, s"depth=$depth")
    }
    // a production-sized table: thousands of (mostly inapplicable)
    // merges through the one-reference-object kernel
    val big = (1 to 3000).map(i => (s"x$i", s"y$i")) ++ table
    val out = df.select(Bpe.applyMerges($"s", big).as("k"))
      .as[String].collect()
    val want = df.select(Bpe.applyMergesFolded($"s", table).as("f"))
      .as[String].collect()
    assert(out.toSeq == want.toSeq) // the x/y merges never match
  }

  test("degenerate vocabularies: single-char words exhaust after zero " +
      "pairs; train emits fewer rows than asked") {
    val words = Map("a" -> 3L, "b" -> 2L)
    assert(trainOn(words, 5).isEmpty)
    val one = Map("ab" -> 1L)
    assert(trainOn(one, 5) == Seq((1, "a", "b", "ab", 1L)))
  }
}
