package graft.operators

import graft.SparkSpec

/** Leaderboard diff classification on hand-built snapshots. */
class RankShiftSpec extends SparkSpec {
  import spark.implicits._

  test("entered/exited/up/down/stable all classify against hand ranks") {
    // old top-3: a(10) b(9) c(8); new top-3: b(10) a(9) d(8)
    val oldDf = Seq(("a", 10L), ("b", 9L), ("c", 8L), ("d", 1L))
      .toDF("item", "s")
    val newDf = Seq(("b", 10L), ("a", 9L), ("d", 8L), ("c", 1L))
      .toDF("item", "s")
    val got = RankShift.rankShift(oldDf, newDf, "item", "s", 3)
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 2L, "down", -1L),
      ("b", 2L, 1L, "up", 1L),
      ("c", 3L, -1L, "exited", 0L),
      ("d", -1L, 3L, "entered", 0L)))
  }

  test("identical snapshots are all stable") {
    val df = Seq(("a", 5L), ("b", 3L)).toDF("item", "s")
    val got = RankShift.rankShift(df, df, "item", "s", 2)
      .as[(String, Long, Long, String, Long)].collect()
    assert(got.forall(r => r._4 == "stable" && r._5 == 0L))
  }
}
