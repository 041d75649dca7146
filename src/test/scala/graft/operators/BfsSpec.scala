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

  test("delta frontier == exactly the nodes that changed each round") {
    import org.apache.spark.sql.functions._
    // diamond + tail: layers {1}, {2,3}, {4}, {5}; node 2 is re-reached
    // at hop 2 via 3 but must NOT reappear in any later frontier
    val g = Seq((1L, 2L), (1L, 3L), (3L, 2L), (2L, 4L), (3L, 4L), (4L, 5L))
    val e = g.toDF("src", "dst").repartition(col("src")).localCheckpoint()
    var dists = Seq(1L).toDF("node")
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dists
    val layers = Seq(Set(2L -> 1L, 3L -> 1L), Set(4L -> 2L), Set(5L -> 3L),
      Set.empty[(Long, Long)])
    for (expect <- layers) {
      val before = dists.as[(Long, Long)].collect().toSet
      val (d, f) = Bfs.step(e, dists, frontier)
      val after = d.as[(Long, Long)].collect().toSet
      val front = f.as[(Long, Long)].collect().toSet
      assert(front == expect) // frontier is exactly this hop's layer...
      assert(after -- before == front) // ...and exactly the rows added
      dists = d; frontier = f
    }
  }

  private def bf(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                 rounds: Int): Map[Long, Long] =
    Bfs.weightedDistances(edges.toDF("s", "d", "w"), "s", "d", "w",
        seeds.toDF("n"), "n", rounds)
      .as[(Long, Long)].collect().toMap

  test("cheapest path beats fewest hops") {
    // 1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 2 + 3 = 5
    val g = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(bf(g, Seq(1L), 2) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
    // with only 1 round the 2-edge path is out of budget: direct wins
    assert(bf(g, Seq(1L), 1) == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
  }

  test("a later round IMPROVES a settled node (frontier must re-open it)") {
    // 1 -> 4 direct 10 (settled round 1); 1->2->3->4 = 1+1+1 (round 3)
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(bf(g, Seq(1L), 1)(4L) == 10L)
    assert(bf(g, Seq(1L), 3)(4L) == 3L)
  }

  test("negative edge on a bounded budget relaxes exactly") {
    // rounds bound path LENGTH, so a negative edge cannot diverge
    val g = Seq((1L, 2L, 5L), (2L, 3L, -3L))
    assert(bf(g, Seq(1L), 2) == Map(1L -> 0L, 2L -> 5L, 3L -> 2L))
  }

  private def tree(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                   rounds: Int): Map[Long, (Long, Long)] =
    Bfs.weightedPathTree(edges.toDF("s", "d", "w"), "s", "d", "w",
        seeds.toDF("n"), "n", rounds)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("path tree: preds trace the cheapest route; seeds self-point") {
    // 1 -> 4 direct 10; 1 -> 2 -> 3 -> 4 = 3: pred chain 4<-3<-2<-1
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val t = tree(g, Seq(1L), 3)
    assert(t(1L) == ((0L, 1L)))
    assert(t(2L) == ((1L, 1L)) && t(3L) == ((2L, 2L)) &&
      t(4L) == ((3L, 3L)))
    // with 1 round, the direct edge wins and pred is the seed
    assert(tree(g, Seq(1L), 1)(4L) == ((10L, 1L)))
  }

  test("path tree: equal-cost tie breaks to the smaller predecessor") {
    // 3 reachable at cost 5 via 1 AND via 2 — pred must be 1
    val g = Seq((0L, 1L, 2L), (0L, 2L, 2L), (1L, 3L, 3L), (2L, 3L, 3L))
    assert(tree(g, Seq(0L), 2)(3L) == ((5L, 1L)))
  }

  test("path tree: every pred walk reaches a seed within rounds") {
    val rng = new scala.util.Random(13)
    val edges = Seq.fill(150)((rng.nextInt(25).toLong,
      rng.nextInt(25).toLong, 1L + rng.nextInt(5)))
    val t = tree(edges, Seq(0L, 1L), 5)
    t.keys.foreach { n =>
      var cur = n
      var steps = 0
      while (t(cur)._2 != cur && steps <= 5) { cur = t(cur)._2; steps += 1 }
      assert(t(cur)._2 == cur && Seq(0L, 1L).contains(cur),
        s"node $n walked to $cur in $steps")
    }
  }

  test("matches driver Bellman-Ford on a random weighted graph") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(200)((rng.nextInt(30).toLong,
      rng.nextInt(30).toLong, 1L + rng.nextInt(9)))
    val seeds = Seq(0L, 1L)
    val rounds = 5
    val got = bf(edges, seeds, rounds)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relax = dist.toSeq.flatMap { case (n, dn) =>
        edges.collect { case (s, d, w) if s == n => d -> (dn + w) }
      }
      relax.foreach { case (n, c) =>
        if (!dist.contains(n) || dist(n) > c) dist += n -> c
      }
    }
    assert(got == dist)
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
