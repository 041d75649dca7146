package graft.functions

import graft.SparkSpec

/** Median/MAD outlier report: exact doubled order statistics, strict
  * cross-multiplied fence, null groups first-class. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, Long)], kNum: Long = 3,
                     kDen: Long = 1): Map[String, (Long, Long, Long, Long)] =
    RobustStats.madOutlierReport(rows.toDF("g", "x"), "g", "x", kNum, kDen)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("odd group: med2 = 2·median, mad4 = 4·MAD, fence flags the tail") {
    // {1,2,3,4,100}: median 3, devs {2,1,0,1,97}, MAD 1 → 3·MAD fence
    // flags 100 only (|100−3| = 97 > 3)
    val got = report(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L,
      "a" -> 100L))
    assert(got("a") == ((5L, 6L, 4L, 1L)))
  }

  test("even group: the two middle ranks sum exactly") {
    // {1,3,5,7}: med2 = 3+5 = 8; dev2 = {6,2,2,6}; mad4 = 2+6 = 8
    // fence 2·dev2 > 3·mad4 → 2·6=12 vs 24: none
    val got = report(Seq("b" -> 1L, "b" -> 3L, "b" -> 5L, "b" -> 7L))
    assert(got("b") == ((4L, 8L, 8L, 0L)))
  }

  test("MAD of 0 flags everything off the median (strict fence)") {
    // {5,5,5,9}: med2=10, dev2={0,0,0,8}, mad4=0 → only 9 flagged
    val got = report(Seq("c" -> 5L, "c" -> 5L, "c" -> 5L, "c" -> 9L))
    assert(got("c") == ((4L, 10L, 0L, 1L)))
  }

  test("null group reports like any other (null-safe joins)") {
    val rows = Seq((Option.empty[String], 1L), (Option.empty[String], 2L),
      (Option.empty[String], 30L), (Some("a"), 5L)).toDF("g", "x")
    val got = RobustStats.madOutlierReport(rows, "g", "x", 3, 1)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // null group {1,2,30}: med2=4, dev2={2,0,56}, mad4=4, 56·2 > 3·4 → 1
    assert(got(None) == ((3L, 4L, 4L, 1L)))
    assert(got(Some("a"))._1 == 1L)
  }

  test("winsorizedSum: clamps at the exact ceil-rank order statistics") {
    // {1..10}: p10 rank = ceil(1) = 1 -> lo=1? ceil(0.1·10)=1 -> lo=1;
    // p90 rank = ceil(9) = 9 -> hi=9; clamp only the 10 -> 54
    val rows = (1L to 10L).map(("a", _)).toDF("g", "x")
    val got = RobustStats.winsorizedSum(rows, "g", "x", 1, 9, 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 10L, 1L, 9L, 55L, 54L)))
    // heavier clamp 25/75: ranks ceil(2.5)=3, ceil(7.5)=8 -> lo=3, hi=8
    // sum = 3+3 + 3..8 + 8+8 = 6 + 33 + 16 = 55 -> 3·2+sum(3..8)+8·2
    val g2 = RobustStats.winsorizedSum(rows, "g", "x", 1, 3, 4)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(g2 == (("a", 10L, 3L, 8L, 55L, 3L + 3L + 33L + 8L + 8L)))
  }

  test("winsorizedSum: tiny groups clamp to themselves (rank floor 1)") {
    val rows = Seq(("a", 7L)).toDF("g", "x")
    val got = RobustStats.winsorizedSum(rows, "g", "x", 1, 9, 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 1L, 7L, 7L, 7L, 7L)))
  }

  test("matches a driver reference on random heavy-tailed data") {
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(300)(
      (s"g${rng.nextInt(3)}",
        if (rng.nextInt(20) == 0) rng.nextInt(10000).toLong
        else rng.nextInt(100).toLong))
    val got = report(rows, 3, 2) // k = 1.5
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val xs = grp.map(_._2).sorted
      val n = xs.length
      val med2 = xs((n + 1) / 2 - 1) + xs(n / 2)
      val devs = xs.map(x => (2 * x - med2).abs).sorted
      val mad4 = devs((n + 1) / 2 - 1) + devs(n / 2)
      val out = devs.count(d => 2 * d * 2 > 3 * mad4)
      assert(got(g) == ((n.toLong, med2, mad4, out.toLong)), s"group $g")
    }
  }
  test("nearestRankQuantiles: hand-checked ranks, min and max quantiles") {
    import spark.implicits._
    val df = (1L to 10L).map(("a", _)).toDF("g", "x")
    val got = RobustStats.nearestRankQuantiles(df, "g", "x",
        Seq((0L, 1L), (1L, 2L), (9L, 10L), (1L, 1L)))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // p=0 -> rank max(1,0)=1 -> 1; p=.5 -> rank 5 -> 5; p=.9 -> 9; p=1 -> 10
    assert(got == Set(("a", 10L, 0L, 1L, 1L), ("a", 10L, 1L, 2L, 5L),
      ("a", 10L, 9L, 10L, 9L), ("a", 10L, 1L, 1L, 10L)))
  }
}
