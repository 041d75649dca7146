package graft.operators

import graft.SparkSpec

/** Multi-source BFS: exact hop distances, bounded frontier rounds. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  hops: Int): Map[Long, Long] =
    Bfs.multiSourceDistances(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("n"), "n", hops)
      .as[(Long, Long)].collect().toMap

  test("hop layers from a single seed on a chain") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(chain, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source: nearest seed wins") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L))
    assert(bfs(chain, Seq(1L, 5L), 3) ==
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("a settled node never worsens when re-reached on a longer path") {
    // 1 -> 2 directly (dist 1) and via 3 -> 4 (dist 3)
    val g = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 2L))
    assert(bfs(g, Seq(1L), 4)(2L) == 1L)
  }

  test("unreached nodes are absent; direction respected") {
    val g = Seq((1L, 2L), (3L, 1L)) // 3 -> 1: 3 is NOT reachable FROM 1
    val got = bfs(g, Seq(1L), 3)
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("matches driver BFS on a random graph") {
    val rng = new scala.util.Random(3)
    val edges = Seq.fill(200)(
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    val seeds = Seq(0L, 1L)
    val got = bfs(edges, seeds, 5)
    // literal reference
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    for (h <- 1 to 5) {
      val next = dist.toSeq.flatMap { case (n, d) =>
        adj.getOrElse(n, Nil).map(_ -> (d + 1))
      }
      next.foreach { case (n, d) =>
        if (!dist.contains(n) || dist(n) > d) dist += n -> d
      }
    }
    assert(got == dist)
  }
}
