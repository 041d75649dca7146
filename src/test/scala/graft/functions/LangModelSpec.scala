package graft.functions

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def report(docs: Seq[(Long, String)]) =
    LangModel.surprisalReport(docs.toDF("id", "text"), "id", "text")
      .select($"id", $"n_tokens", $"sum_bits", $"mean_bits")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  /** floor(log2 x) + 1, the unpadded-binary length both engines compute. */
  private def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  test("surprisal equals the hand-computed bit-length model") {
    // corpus: "a" ×4, "b" ×2, "c" ×1, "d" ×1 → N = 8 (bitLen 4)
    val docs = Seq(1L -> "a a b c", 2L -> "a a b d")
    val counts = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 1L)
    val n = counts.values.sum
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      val bits = toks.map(t => bitLen(n) - bitLen(counts(t)))
      id -> (toks.size.toLong, bits.sum, bits.sum.toDouble / toks.size)
    }.toMap
    assert(report(docs) == want)
  }

  test("rare tokens score strictly higher than common ones") {
    // 16 "the" + 1 "xyzzy": bits(the) = bitLen(17) - bitLen(16) = 0,
    // bits(xyzzy) = bitLen(17) - bitLen(1) = 4
    val docs = Seq(1L -> Seq.fill(16)("the").mkString(" "), 2L -> "xyzzy")
    val got = report(docs)
    assert(got(1L)._3 == 0.0)
    assert(got(2L)._3 == 4.0)
  }

  test("empty and whitespace-only documents report zero") {
    val got = report(Seq(1L -> "", 2L -> "   ", 3L -> "word"))
    assert(got(1L) == ((0L, 0L, 0.0)))
    assert(got(2L) == ((0L, 0L, 0.0)))
    assert(got(3L)._1 == 1L)
  }

  test("case folding: tokens count case-insensitively") {
    // "The the THE" is one term with count 3 — every token gets the same bits
    val got = report(Seq(1L -> "The the THE"))
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == 3 * (bitLen(3) - bitLen(3)))
  }

  test("bigram surprisal: hand-computed conditional bits") {
    // corpus pairs: (a,b)×2 from doc1, (a,c)×1, (c,a)×1 from doc2
    // c_a = c(a,b)+c(a,c) = 3; c_c = c(c,a) = 1
    // bits(b|a) = bitLen(3) - bitLen(2) = 0
    // bits(c|a) = bitLen(3) - bitLen(1) = 1
    // bits(a|c) = bitLen(1) - bitLen(1) = 0
    val docs = Seq(1L -> "a b a b", 2L -> "a c a")
      .toDF("doc_id", "text")
    val got = LangModel.bigramSurprisalReport(docs, "doc_id", "text")
      .select($"doc_id", $"n_pairs", $"sum_bits", $"mean_bits")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1 pairs: ab, ba, ab → wait: "a b a b" → (a,b),(b,a),(a,b)
    // recount: c(a,b)=2, c(b,a)=1, c(a,c)=1, c(c,a)=1
    // c_a = 3, c_b = 1, c_c = 1
    // doc1: 2×bits(b|a) + 1×bits(a|b) = 2×(bitLen(3)-bitLen(2)) +
    //       (bitLen(1)-bitLen(1)) = 0
    assert(got(1L) == ((3L, 0L, 0.0)))
    // doc2: bits(c|a) + bits(a|c) = (bitLen(3)-bitLen(1)) + 0 = 1
    assert(got(2L) == ((2L, 1L, 0.5)))
  }

  test("bigram surprisal: sub-2-token documents report zero pairs") {
    val docs = Seq(1L -> "solo", 2L -> "", 3L -> "two words")
      .toDF("doc_id", "text")
    val got = LangModel.bigramSurprisalReport(docs, "doc_id", "text")
      .select($"doc_id", $"n_pairs").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("Kneser-Ney: hand-checked rationals on the san-francisco shape") {
    // corpus: "san francisco" x3, "san diego", "new york"
    // pc: (san,francisco) c=3, (san,diego) 1, (new,york) 1 → T=3
    // c_san=4 fwd=2; back(francisco)=1, back(diego)=1, back(york)=1
    val docs = Seq(1L -> "san francisco", 2L -> "san francisco",
      3L -> "san francisco", 4L -> "san diego", 5L -> "new york")
      .toDF("doc_id", "text")
    val got = LangModel.kneserNeyBigrams(docs, "doc_id", "text")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._8, r._9))).toMap
    // P(francisco|san) = max(12-3,0)*3 + 3*2*1 = 33 over 4*4*3 = 48
    assert(got(("san", "francisco")) == ((33L, 48L)))
    // P(diego|san) = max(4-3,0)*3 + 3*2*1 = 9 over 48
    assert(got(("san", "diego")) == ((9L, 48L)))
    // P(york|new) = max(4-3,0)*3 + 3*1*1 = 6 over 4*1*3 = 12
    assert(got(("new", "york")) == ((6L, 12L)))
  }

  test("Kneser-Ney: observed mass per context never exceeds 1 " +
      "(cross-multiplied)") {
    val docs = Seq(1L -> "a b a c a b b c c a a a")
      .toDF("doc_id", "text")
    val rows = LangModel.kneserNeyBigrams(docs, "doc_id", "text")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    rows.groupBy(_._1).foreach { case (w1, grp) =>
      val den = grp.head._9
      assert(grp.forall(_._9 == den))
      assert(grp.map(_._8).sum <= den, s"context $w1 oversubscribed")
    }
  }
}
