package graft.operators

import graft.SparkSpec

/** Synchronous k-core peeling: all under-k nodes drop at once, degrees
  * recompute on the surviving subgraph. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Long, rounds: Int)
      : Map[Long, Long] = {
    val sym = edges ++ edges.map(_.swap)
    KCore.kCore(sym.toDF("u", "v"), "u", "v", k, rounds)
      .as[(Long, Long)].collect().toMap
  }

  private def triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L))

  test("a triangle is its own 2-core; nothing survives k=3") {
    assert(core(triangle, 2, 3) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(triangle, 3, 3).isEmpty)
  }

  test("peeling cascades: a pendant chain unravels round by round") {
    // triangle + chain 3-4-5: round 1 drops 5 (deg 1), round 2 drops 4
    // (deg fell to 1), triangle survives — one round would miss node 4
    val g = triangle ++ Seq((3L, 4L), (4L, 5L))
    assert(core(g, 2, 1).keySet == Set(1L, 2L, 3L, 4L))
    assert(core(g, 2, 3).keySet == Set(1L, 2L, 3L))
  }

  test("peels are synchronous: mutually-dependent under-k nodes drop together") {
    // 4-5 hang off the triangle and off each other (deg 2 each via the
    // triangle link + their mutual edge): at k=3 both are under-k in
    // round 1 and must drop TOGETHER (asynchronous peeling that removed
    // 4 first would still work here, but the round-1 survivor set pins
    // the synchronous semantics)
    val g = triangle ++ Seq((3L, 4L), (3L, 5L), (4L, 5L))
    // degrees: 3 has 4, others: 1:2, 2:2, 4:2, 5:2 → k=3 round 1 keeps
    // only node 3, whose edges all died with their other endpoint
    assert(core(g, 3, 1).isEmpty)
  }

  test("reported degree is within the surviving subgraph, not the input") {
    // two triangles sharing node 3, plus node 3's pendant: the 2-core
    // keeps both triangles; 3's degree is 4 there (pendant gone)
    val g = triangle ++ Seq((3L, 6L), (6L, 7L), (3L, 7L), (3L, 9L))
    val got = core(g, 2, 3)
    assert(got(3L) == 4L && !got.contains(9L))
  }

  test("fixpoint: extra rounds after convergence change nothing") {
    val g = triangle ++ Seq((3L, 4L), (4L, 5L))
    assert(core(g, 2, 3) == core(g, 2, 8))
  }
}
