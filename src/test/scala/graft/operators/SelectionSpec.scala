package graft.operators

import graft.SparkSpec

/** Greedy max-coverage: exact gains, deterministic ties, saturation. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def pick(items: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long)] =
    Selection.greedyMaxCoverage(items.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("greedy covers, gains shrink by prior coverage, ties pick low id") {
    // doc1 {a b c}, doc2 {b c d}, doc3 {d e}: greedy = 1 (3), 3 (2), 2 (0→stops)
    val items = Seq(1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "b", 2L -> "c", 2L -> "d", 3L -> "d", 3L -> "e")
    assert(pick(items, 3) == Seq((1L, 1L, 3L), (2L, 3L, 2L)))
    // doc2 ties doc1 on raw size; lower id wins round 1
    val tied = Seq(1L -> "a", 1L -> "b", 2L -> "c", 2L -> "d")
    assert(pick(tied, 2) == Seq((1L, 1L, 2L), (2L, 2L, 2L)))
  }

  test("duplicate incidence rows do not inflate gains (set semantics)") {
    val items = Seq(1L -> "a", 1L -> "a", 1L -> "a", 2L -> "b", 2L -> "c")
    assert(pick(items, 2) == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("matches the driver greedy on a random incidence table") {
    val rng = new scala.util.Random(11)
    val items = Seq.fill(400)(
      (rng.nextInt(12).toLong, s"t${rng.nextInt(40)}"))
    val got = pick(items, 5)
    // literal reference
    val byDoc = items.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    var covered = Set.empty[String]
    val want = Seq.newBuilder[(Long, Long, Long)]
    var r = 1L
    var go = true
    while (r <= 5 && go) {
      val gains = byDoc.view.mapValues(s => (s -- covered).size.toLong).toSeq
      val (wid, g) = gains.minBy { case (id, gn) => (-gn, id) }
      if (g == 0) go = false
      else {
        want += ((r, wid, g)); covered ++= byDoc(wid); r += 1
      }
    }
    assert(got == want.result())
  }
}
