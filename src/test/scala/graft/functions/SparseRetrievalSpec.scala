package graft.functions

import graft.SparkSpec

class SparseRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "apple banana apple"),
    (1L, "apple banana cherry"),
    (2L, "banana banana banana"),
    (3L, "cherry date elderberry"),
    (4L, "apple apple apple apple")).toDF("id", "text")

  /** Serial reference scorer with the same scaled-integer contract. */
  private def naiveScores(corpus: Seq[(Long, String)], query: String)
      : Map[Long, (Long, Long)] = {
    val n = corpus.size.toDouble
    val tf = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => w -> o.length } }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    val q = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w -> o.length.toDouble }
    tf.flatMap { case (id, terms) =>
      val hits = terms.filter { case (w, _) => q.contains(w) }
      if (hits.isEmpty) None else Some(id -> (
        hits.map { case (w, c) =>
          val idf = (n - dfreq(w) + 0.5) / (dfreq(w) + 0.5)
          math.floor(q(w) * c.toDouble * idf * 1048576.0).toLong
        }.sum,
        hits.size.toLong))
    }
  }

  test("ranking matches the serial scaled-integer reference") {
    val corpus = docs.as[(Long, String)].collect().toSeq
    val query = "apple banana apple"
    val got = TermStats.sparseTopK(docs, "id", "text", query, 10)
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, t) => id -> (s, t) }.toMap
    assert(got == naiveScores(corpus, query))
  }

  test("top-k is score-descending with id tiebreak and honors k") {
    val got = TermStats.sparseTopK(docs, "id", "text", "apple banana", 3)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 3)
    val scores = got.map(_._2).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("documents sharing no query term never appear") {
    val got = TermStats.sparseTopK(docs, "id", "text", "apple", 10)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(got == Set(0L, 1L, 4L)) // 2 and 3 contain no 'apple'
  }
}
