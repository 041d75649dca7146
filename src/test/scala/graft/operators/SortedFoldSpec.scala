package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Secondary-sort per-key folds: sessionization and integer EWMA. */
class SortedFoldSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: strict gap opens a new 1-based session per key") {
    val e = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:29:00")), // 29 min: same session
      (3L, "u1", ts("2024-01-01 10:59:00")), // exactly 30 min: SAME (strict >)
      (4L, "u1", ts("2024-01-01 11:29:01")), // 30 min 1 s: new session
      (5L, "u2", ts("2024-01-01 10:00:00"))) // other key restarts at 1
      .toDF("event_id", "user_id", "ts")
    val got = SortedFold.sessionize(e, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize orders by (ts, id): equal timestamps never split") {
    val t = ts("2024-01-01 10:00:00")
    val e = Seq((9L, "u", t), (2L, "u", t), (5L, "u", t))
      .toDF("event_id", "user_id", "ts")
    val got = SortedFold.sessionize(e, "user_id", "ts", "event_id", 0)
      .select("session_id").as[Long].collect().toSet
    assert(got == Set(1L)) // zero gaps at gapSec=0 stay one session
  }

  test("ewma: seed is the first value, then the truncating recurrence") {
    val e = Seq(("k", 1L, 100L), ("k", 2L, 200L), ("k", 3L, 50L))
      .toDF("k", "i", "xv")
    val got = SortedFold.ewma(e, "k", Seq("i"), "xv", 1, 4)
      .select("i", "ewma").as[(Long, Long)].collect().toMap
    // e1 = 100; e2 = (200 + 300)/4 = 125; e3 = (50 + 375)/4 = 106
    assert(got == Map(1L -> 100L, 2L -> 125L, 3L -> 106L))
  }

  test("ewma: truncation rounds toward zero (SQL div semantics)") {
    val e = Seq(("k", 1L, -1L), ("k", 2L, -2L)).toDF("k", "i", "xv")
    val got = SortedFold.ewma(e, "k", Seq("i"), "xv", 1, 4)
      .select("i", "ewma").as[(Long, Long)].collect().toMap
    // e2 = (-2 + 3·(-1))/4 = -5/4 → -1 (floor would give -2)
    assert(got == Map(1L -> -1L, 2L -> -1L))
  }

  test("cusum: zero seed, max(0,·) clamp, drift subtraction") {
    val e = Seq(("k", 1L, 5L), ("k", 2L, 0L), ("k", 3L, 0L),
      ("k", 4L, 0L), ("k", 5L, 4L)).toDF("k", "i", "xv")
    val got = SortedFold.cusum(e, "k", Seq("i"), "xv", drift = 2)
      .select("i", "cusum").as[(Long, Long)].collect().toMap
    // S: max(0,0+5−2)=3, 1, 0 (clamped), 0, max(0,0+4−2)=2
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 2L))
  }

  test("keys never leak state across the sorted stream") {
    // interleaved keys, many partitions: each key folds independently
    val rows = (1L to 200L).map(i => (s"k${i % 7}", i, i % 13))
    val got = SortedFold.ewma(rows.toDF("k", "i", "xv").repartition(8),
        "k", Seq("i"), "xv", 1, 2)
      .select("k", "i", "ewma").as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val want = rows.groupBy(_._1).view.mapValues { ks =>
      val xs = ks.sortBy(_._2).map(_._3)
      xs.tail.scanLeft(xs.head)((e, x) => (x + e) / 2).toSeq
    }.toMap
    assert(got == want)
  }

  test("binary keys group by VALUE, not reference") {
    // two equal digests from different array instances must be one key
    val rows = Seq((Array[Byte](1, 2), 1L, 10L), (Array[Byte](1, 2), 2L, 20L),
      (Array[Byte](9), 3L, 30L))
    val got = SortedFold.ewma(rows.toDF("k", "i", "xv"), "k", Seq("i"),
        "xv", 1, 2)
      .select("i", "ewma").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 15L, 3L -> 30L))
  }

  test("null keys group together") {
    val e = Seq((Option.empty[String], 1L, 10L),
      (Option.empty[String], 2L, 20L), (Some("a"), 3L, 30L))
      .toDF("k", "i", "xv")
    val got = SortedFold.ewma(e, "k", Seq("i"), "xv", 1, 2)
      .select("i", "ewma").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 15L, 3L -> 30L))
  }

  test("cooldownFilter: reference point is the last EMISSION, " +
      "so a just-under burst keeps sliding") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // cooldown 10s; events at 0, 9, 18, 27: 0 emits; 9 (gap 9) no;
    // 18 (gap 18 from 0) yes; 27 (gap 9 from 18) no — a fixed-window
    // dedup would emit 18 AND 27
    val e = Seq((1L, ts(0), 1L), (1L, ts(9), 2L), (1L, ts(18), 3L),
      (1L, ts(27), 4L)).toDF("k", "t", "id")
    val got = SortedFold.cooldownFilter(e, "k", "t", "id", 10)
      .select("id", "emitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("cooldownFilter: exact-gap boundary emits (>=); first row " +
      "always emits per key") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val e = Seq((1L, ts(100), 1L), (1L, ts(110), 2L),
      (2L, ts(0), 3L)).toDF("k", "t", "id")
    val got = SortedFold.cooldownFilter(e, "k", "t", "id", 10)
      .select("id", "emitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true))
  }
}
