package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1 completes view->click->buy in order; user 2 clicks BEFORE
  // viewing (chain must not complete); user 3 views only; user 4 has
  // view and click at the SAME instant (strict ordering must reject)
  val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:09:00"), "buy"),
    (2L, ts("2024-01-01 09:00:00"), "click"),
    (2L, ts("2024-01-01 09:30:00"), "view"),
    (3L, ts("2024-01-01 08:00:00"), "view"),
    (4L, ts("2024-01-01 07:00:00"), "view"),
    (4L, ts("2024-01-01 07:00:00"), "click")
  ).toDF("user_id", "ts", "etype")

  test("funnelTimes: strict ordering, earliest completion, broken chains null") {
    val t = Funnels.funnelTimes(events, "user_id", "ts", "etype",
        Seq("view", "click", "buy"))
      .orderBy("user_id")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect()
    assert(t.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val u1 = t(0)
    assert(u1._2 == ts("2024-01-01 10:00:00") &&
      u1._3.contains(ts("2024-01-01 10:05:00")) &&
      u1._4.contains(ts("2024-01-01 10:09:00")))
    // user 2: click precedes view, so step 2 never completes
    assert(t(1)._3.isEmpty && t(1)._4.isEmpty)
    assert(t(2)._3.isEmpty)
    // user 4: simultaneous view+click — strict > rejects the click
    assert(t(3)._3.isEmpty)
  }

  test("funnelTimes picks the earliest qualifying later event, not any") {
    val e = Seq(
      (9L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 09:00:00"), "click"), // before the view: ignored
      (9L, ts("2024-01-01 11:00:00"), "click"),
      (9L, ts("2024-01-01 12:00:00"), "click")
    ).toDF("user_id", "ts", "etype")
    val t = Funnels.funnelTimes(e, "user_id", "ts", "etype", Seq("view", "click"))
      .select("step_2_ts").as[Timestamp].head()
    assert(t == ts("2024-01-01 11:00:00"))
  }

  test("funnel report is non-increasing and counts per step") {
    val f = Funnels.funnel(events, "user_id", "ts", "etype",
        Seq("view", "click", "buy"))
      .orderBy("step_idx").as[(Int, String, Long)].collect()
    assert(f.toSeq == Seq((1, "view", 4L), (2, "click", 1L), (3, "buy", 1L)))
  }

  test("cohortRetention: offset 0 is cohort size; one count per active week") {
    val e = Seq(
      // user 1: first week 0, active weeks 0 and 2 (twice in week 2 —
      // must count once)
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-15 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // user 2: first week 0 only
      (2L, ts("2024-01-03 10:00:00")),
      // user 3: first week 2
      (3L, ts("2024-01-18 10:00:00"))
    ).toDF("user_id", "ts").withColumn("etype", lit("x"))
    val m = Funnels.cohortRetention(e, "user_id", "ts", "2024-01-01")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(m == Seq((0L, 0L, 2L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }
}
