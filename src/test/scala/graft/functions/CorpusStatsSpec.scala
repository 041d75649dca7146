package graft.functions

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "web",  "en", "the cat sat",        11L),
    (2L, "web",  "en", "a dog",               5L),
    (3L, "web",  "de", "der hund",            8L),
    (4L, "book", "en", "one two three four", 18L))
    .toDF("doc_id", "source", "lang", "text", "n_chars")

  test("corpusStats aggregates volume and exact percentiles per slice") {
    val out = CorpusStats.corpusStats(docs, "source", "lang", "text", "n_chars")
      .select($"source", $"lang", $"n_docs", $"n_tokens", $"n_chars_total",
        $"p50_chars")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out(("web", "en")) == ((2L, 5L, 16L, 8.0))) // median of {5,11}
    assert(out(("web", "de")) == ((1L, 2L, 8L, 8.0)))
    assert(out(("book", "en")) == ((1L, 4L, 18L, 18.0)))
  }

  test("dupRateBySource: min-id keeper rule, rate per source") {
    val corpus = Seq(
      (1L, "web",  "same text"),
      (2L, "web",  "same text"),   // dup of 1
      (3L, "web",  "unique a"),
      (4L, "book", "same text"),   // dup of 1 (cross-source: keeper is id 1)
      (5L, "book", "unique b"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.dupRateBySource(corpus, "doc_id", "text", "source")
      .select($"source", $"n_docs", $"n_unique", $"n_dups", $"dup_rate")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out("web") == ((3L, 2L, 1L, 1.0 / 3.0)))
    assert(out("book") == ((2L, 1L, 1L, 0.5)))
  }

  test("vocabCoverage: rank order, exact cumulative fractions, k cut") {
    // corpus tokens: the×4, cat×2, dog×1, sat×1 → total 8
    val d = Seq((1L, "the cat the dog"), (2L, "the cat the sat"))
      .toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(d, "doc_id", "text", 3)
      .select($"rank", $"term", $"cnt", $"cum_coverage")
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == ((1, "the", 4L, 0.5)))
    assert(out(1) == ((2, "cat", 2L, 0.75)))
    assert(out(2) == ((3, "dog", 1L, 0.875))) // tie dog/sat → term order
  }

  test("tokenizerFertility: hand-computed ratios per group (real vocab)") {
    // greedy longest-match against the embedded vocabulary:
    // "ab cd." → words 2; units: "ab"(in vocab)=1, "cd"→c,d=2, "."=1 → 4
    // "x,y"    → words 1; units: x=1, ","=1, y=1 → 3
    val d = Seq((1L, "en", "ab cd."), (2L, "de", "x,y"))
      .toDF("doc_id", "lang", "text")
    val got = CorpusStats.tokenizerFertility(d, "lang", "text")
      .select($"lang", $"n_words", $"n_bpe_tokens", $"fertility")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("en") == ((2L, 4L, 2.0)))
    assert(got("de") == ((1L, 3L, 3.0)))
  }

  test("lengthOutlierReport: median/MAD gate, hand-computed") {
    // group g: lengths 10,10,12,14,100 → med 12, devs 2,2,0,2,88 → mad 2
    // keep iff dev <= 6 → the 100 is the only outlier
    val d = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 12L),
      (4L, "g", 14L), (5L, "g", 100L)).toDF("doc_id", "source", "len")
    val out = CorpusStats.lengthOutlierReport(d, "doc_id", "source", "len")
      .select($"doc_id", $"med", $"mad", $"keep")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((12.0, 2.0, true)))
    assert(out(5L) == ((12.0, 2.0, false)))
  }

  test("lengthOutlierReport: even group count interpolates the median") {
    // lengths 10,11,20,21 → med 15.5, devs 5.5,4.5,4.5,5.5 → mad 5.0
    // keep iff dev <= 15 → all kept
    val d = Seq((1L, "g", 10L), (2L, "g", 11L), (3L, "g", 20L),
      (4L, "g", 21L)).toDF("doc_id", "source", "len")
    val out = CorpusStats.lengthOutlierReport(d, "doc_id", "source", "len")
      .select($"med", $"mad", $"keep")
      .as[(Double, Double, Boolean)].collect()
    assert(out.forall(_ == ((15.5, 5.0, true))))
  }

  test("lengthOutlierReport: a constant group has MAD 0 and keeps all") {
    val d = Seq((1L, "g", 7L), (2L, "g", 7L)).toDF("doc_id", "source", "len")
    val out = CorpusStats.lengthOutlierReport(d, "doc_id", "source", "len")
      .select($"mad", $"keep").as[(Double, Boolean)].collect()
    assert(out.forall(_ == ((0.0, true))))
  }
}
