package graft.operators

import graft.SparkSpec

/** Degree-oriented triangle counting: every triangle exactly once. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tris(pairs: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Triangles.triangles(
        Triangles.canonicalEdges(pairs.toDF("a", "b"), "a", "b"))
      .as[(Long, Long, Long)].collect().toSet

  /** Reference: brute-force over all id-ordered vertex triples. */
  private def naive(pairs: Seq[(Long, Long)]): Long = {
    val es = pairs.flatMap { case (a, b) =>
      if (a == b) Nil
      else Seq((math.min(a, b), math.max(a, b)))
    }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      if es((nodes(i), nodes(j))) && es((nodes(j), nodes(k))) &&
        es((nodes(i), nodes(k)))
    } yield 1).size.toLong
  }

  test("one triangle, found once, regardless of input orientation") {
    assert(tris(Seq((1L, 2L), (3L, 2L), (3L, 1L))).size == 1)
  }

  test("self-loops and duplicate edges never mint triangles") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = base ++ Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 3L))
    assert(tris(noisy).size == 1)
  }

  test("a 4-clique holds exactly C(4,3) = 4 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tris(k4).size == 4)
  }

  test("a square (no diagonals) holds none") {
    assert(tris(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("hub star: orientation keeps the hub's wedges closed-only") {
    // star centered at 0 with 20 leaves + one leaf-leaf edge: exactly
    // one triangle even though the hub spans 190 leaf pairs
    val star = (1L to 20L).map((0L, _)) :+ (5L, 6L)
    assert(tris(star).size == 1)
  }

  test("matches brute force on a random graph") {
    val rng = new scala.util.Random(11)
    val pairs = Seq.fill(120)(
      (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    assert(tris(pairs).size.toLong == naive(pairs))
  }

  test("clusteringCoefficient: exact rational, zero-fill, undefined den") {
    // triangle + pendant 4: nodes 1,2 cc = 2/2; 3 has deg 3 → 2/6;
    // 4 has deg 1 → 0/0 (undefined, still emitted)
    val got = Triangles.clusteringCoefficient(
        Triangles.canonicalEdges(
          Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b"),
          "a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 2L, 2L)), 2L -> ((2L, 1L, 2L, 2L)),
      3L -> ((3L, 1L, 2L, 6L)), 4L -> ((1L, 0L, 0L, 0L))))
  }

  test("perNodeCounts credits all three vertices") {
    val got = Triangles.perNodeCounts(
        Triangles.canonicalEdges(
          Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b"),
          "a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
