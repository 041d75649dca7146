package graft.operators

import graft.SparkSpec

/** Join-view maintenance: the bilinear delta fold equals the one-shot
  * re-join, in any wave order, including groups born in the delta. */
class ViewMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().toSet

  test("delta fold equals one-shot: cross-wave pairs, delta-delta " +
      "pairs, and delta-born groups all land") {
    // A(k, g), B(k, m)
    val aOld = Seq((1L, 10L), (2L, 20L)).toDF("k", "g")
    val dA = Seq((3L, 10L), (4L, 40L)).toDF("k", "g") // 40: new group
    val bOld = Seq((1L, 5L), (3L, 7L)).toDF("k", "m") // (3,7) waits for dA
    val dB = Seq((2L, 11L), (3L, 13L), (4L, 17L)).toDF("k", "m")
    val standing = ViewMaintain.joinSum(aOld, bOld, "k", "g", "m")
    val folded = ViewMaintain.maintainJoinSum(standing, aOld, dA,
      bOld, dB, "k", "g", "m")
    val oneShot = ViewMaintain.joinSum(aOld.union(dA), bOld.union(dB),
      "k", "g", "m")
    assert(agg(folded) == agg(oneShot))
    // hand check: g=10 gets k1(5) + k3(7+13) = 25 over 3 items;
    // g=20 gets k2(11); g=40 gets k4(17)
    assert(agg(folded) == Set((10L, 3L, 25L), (20L, 1L, 11L),
      (40L, 1L, 17L)))
  }

  test("two waves fold to the same standing view in either order") {
    val a0 = Seq((1L, 1L)).toDF("k", "g")
    val w1a = Seq((2L, 1L)).toDF("k", "g")
    val w2a = Seq((3L, 2L)).toDF("k", "g")
    val b0 = Seq((1L, 2L)).toDF("k", "m")
    val w1b = Seq((2L, 3L)).toDF("k", "m")
    val w2b = Seq((3L, 5L), (1L, 7L)).toDF("k", "m")
    def fold(order: Seq[Int]) = {
      var (a, b) = (a0, b0)
      var st = ViewMaintain.joinSum(a, b, "k", "g", "m")
      order.foreach { i =>
        val (da, db) = if (i == 1) (w1a, w1b) else (w2a, w2b)
        st = ViewMaintain.maintainJoinSum(st, a, da, b, db, "k", "g", "m")
        a = a.union(da); b = b.union(db)
      }
      agg(st)
    }
    val oneShot = agg(ViewMaintain.joinSum(
      a0.union(w1a).union(w2a), b0.union(w1b).union(w2b), "k", "g", "m"))
    assert(fold(Seq(1, 2)) == oneShot)
    assert(fold(Seq(2, 1)) == oneShot)
  }
}
