package graft.functions

import graft.SparkSpec

/** Term statistics: TF/DF tables, BM25 top terms, heavy hitters. */
class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "the cat and the dog"),
    (4L, "quantum flux capacitor the")).toDF("doc_id", "text")

  test("termFrequencies counts per (doc, term); docFrequencies per term") {
    val tf = TermStats.termFrequencies(docs, "doc_id", "text")
    assert(tf.filter($"doc_id" === 1L && $"term" === "the")
      .select("tf").as[Long].head() == 2L)
    val df = TermStats.docFrequencies(tf)
    assert(df.filter($"term" === "the").select("df").as[Long].head() == 4L)
    assert(df.filter($"term" === "quantum").select("df").as[Long].head() == 1L)
  }

  test("bm25 ranks rare terms above ubiquitous ones") {
    val top = TermStats.bm25TopTerms(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"score".desc, $"term")
      .select("doc_id", "term").as[(Long, String)].collect()
    // doc 4's distinctive terms beat "the" (df = 4 → negative-ish idf)
    val doc4 = top.filter(_._1 == 4L).map(_._2).toSet
    assert(doc4.subsetOf(Set("quantum", "flux", "capacitor")) && doc4.size == 2)
    // every doc yields at most k rows
    assert(top.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("logIdf=false produces the same per-document ranking (monotone)") {
    def ranks(logIdf: Boolean) =
      TermStats.bm25TopTerms(docs, "doc_id", "text", k = 3, logIdf = logIdf)
        .orderBy($"doc_id", $"score".desc, $"term")
        .select("doc_id", "term").as[(Long, String)].collect().toSeq
    assert(ranks(true) == ranks(false))
  }

  test("heavyHitters returns top-k by occurrences with doc frequency") {
    val hh = TermStats.heavyHitters(docs, "doc_id", "text", 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(hh.head == ("the", 7L, 4L))
    assert(hh.map(_._2) == hh.map(_._2).sorted.reverse)
    assert(hh.length == 3)
  }
}
