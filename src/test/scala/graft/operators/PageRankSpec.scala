package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Serial reference with the identical fixed-point integer contract. */
  private def naive(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (s, d) => sums(d) += rank(s) / deg(s) }
      rank = nodes.map(n => n -> (150000L + sums(n) * 17L / 20L)).toMap
    }
    rank
  }

  private val graph = Seq( // star into "hub", a chain, and a self-loop
    ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
    ("c", "d"), ("d", "e"), ("e", "c"),
    ("loop", "loop"))

  test("ranks equal the serial fixed-point reference") {
    val got = PageRank.pagerank(graph.toDF("s", "d"), "s", "d", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == naive(graph, 3))
  }

  test("result is partitioning-independent") {
    val df = graph.toDF("s", "d")
    val one = PageRank.pagerank(df.coalesce(1), "s", "d", 2)
      .as[(String, Long)].collect().toMap
    val many = PageRank.pagerank(df.repartition(8), "s", "d", 2)
      .as[(String, Long)].collect().toMap
    assert(one == many)
  }

  test("zero iterations returns uniform scale; hub outranks its spokes") {
    val df = graph.toDF("s", "d")
    val r0 = PageRank.pagerank(df, "s", "d", 0).as[(String, Long)].collect()
    assert(r0.forall(_._2 == 1000000L))
    val r3 = PageRank.pagerank(df, "s", "d", 3)
      .as[(String, Long)].collect().toMap
    assert(r3("hub") > r3("b") && r3("hub") > r3("c"))
  }

  test("symmetric graph conserves mass up to floor loss") {
    val sym = graph.flatMap { case (s, d) => Seq((s, d), (d, s)) }.distinct
    val iters = 3
    val total = PageRank.pagerank(sym.toDF("s", "d"), "s", "d", iters)
      .as[(String, Long)].collect().map(_._2).sum
    val n = sym.flatMap(e => Seq(e._1, e._2)).distinct.size
    val full = n * 1000000L
    // each node floors away < 1 unit per div and < deg units per sum round
    assert(total <= full && total > full - iters * n * 20L)
  }

  test("personalizedPagerank: restart mass flows only to seeds") {
    import org.apache.spark.sql.functions.col
    // chain s -> x -> y with a detached pair (p -> q): seeding {s}
    // leaves the detached pair at EXACTLY zero forever, and the chain
    // decays by the damping factor per hop
    val edges = Seq(("s", "x"), ("x", "y"), ("p", "q"))
      .toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val got = PageRank.personalizedPagerank(edges, "src", "dst",
        seeds, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("p") == 0L && got("q") == 0L)
    assert(got("s") == 150000L) // restart term only (nothing points at s)
    // x receives s's damped mass: 150000*17/20 over its hop history
    assert(got("x") == 150000L * 17L / 20L)
    assert(got("y") == got("x") * 17L / 20L)
    // reference cross-check: a literal serial run of the same contract
    val nodes = Seq("s", "x", "y", "p", "q")
    var rank = nodes.map(n => n -> (if (n == "s") 1000000L else 0L)).toMap
    val es = Seq(("s", "x"), ("x", "y"), ("p", "q"))
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    for (_ <- 1 to 3) {
      val sums = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      es.foreach { case (a, b) => sums(b) += rank(a) / deg(a) }
      rank = nodes.map(n => n ->
        ((if (n == "s") 150000L else 0L) + sums(n) * 17L / 20L)).toMap
    }
    assert(got == rank)
  }

  test("textRankEdges thresholds, symmetrizes, and dedupes") {
    val docs = Seq((1L, "x y x y x y z"), (2L, "x y q")).toDF("id", "text")
    // bigram counts: (x,y)=4, (y,x)=2, (y,z)=1, (y,q)=1
    val e = PageRank.textRankEdges(docs, "id", "text", minCount = 2)
      .as[(String, String)].collect().toSet
    assert(e == Set(("x", "y"), ("y", "x")))
    val ranked = PageRank.textRank(docs, "id", "text", 2, 2, 10)
      .as[(String, Long)].collect()
    assert(ranked.map(_._1).toSet == Set("x", "y"))
    assert(ranked.head._2 == ranked.last._2) // symmetric 2-cycle → equal
  }
}
