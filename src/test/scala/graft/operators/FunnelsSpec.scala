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

  test("windowed funnel: per-step gap expires the chain; total window " +
      "bounds every step to step 1") {
    val e = Seq(
      // u1: gaps 5min then 4min — inside a 6min step gap, total 9min
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:09:00"), "buy"),
      // u2: click 7min after view — outside a 6min step gap; a later
      // view would re-qualify, but first-touch greedy does NOT re-anchor
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:06:30"), "view"),
      (2L, ts("2024-01-01 10:07:00"), "click"),
      // u3: steps 5min apart each (inside gap) but 10min total — a
      // 9min TOTAL window kills step 3, the 6min step gap alone does not
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:05:00"), "click"),
      (3L, ts("2024-01-01 10:10:00"), "buy")
    ).toDF("user_id", "ts", "etype")
    val steps = Seq("view", "click", "buy")
    def reached(gap: Option[Long], total: Option[Long]) =
      Funnels.funnel(e, "user_id", "ts", "etype", steps, gap, total)
        .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(reached(None, None) ==
      Seq((1, "view", 3L), (2, "click", 3L), (3, "buy", 2L)))
    assert(reached(Some(360L), None) ==
      Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 2L)))
    assert(reached(Some(360L), Some(540L)) ==
      Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)))
    // boundary is inclusive: u1's 5min gap passes a 300s gap exactly
    assert(reached(Some(300L), None).head._3 == 3L)
  }

  test("windowed funnel semantics pinned against exhaustive references " +
      "on a randomized corpus: greedy == definition for step gaps; " +
      "greedy == exhaustive chain search for the total window") {
    val rnd = new scala.util.Random(7)
    val types = Vector("a", "b", "c")
    val rows = for {
      u <- 1L to 60L
      _ <- 1 to (2 + rnd.nextInt(8))
    } yield (u, ts(f"2024-01-01 10:00:${rnd.nextInt(50)}%02d"),
      types(rnd.nextInt(types.size)))
    val df = rows.toDF("user_id", "ts", "etype")
    val byUser = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2.getTime / 1000, r._3)).sorted).toMap
    val steps = Seq("a", "b", "c")
    // greedy reference: first-touch anchor, earliest qualifying per step
    def greedy(ev: Seq[(Long, String)], gap: Option[Long],
               total: Option[Long]): Seq[Option[Long]] = {
      val t1 = ev.collectFirst { case (t, "a") => t }
      steps.indices.tail.scanLeft(t1) { (prevOpt, i) =>
        for {
          prev <- prevOpt
          anchor <- t1
          t <- ev.collectFirst { case (t, s)
            if s == steps(i) && t > prev &&
              gap.forall(g => t <= prev + g) &&
              total.forall(w => t <= anchor + w) => t }
        } yield t
      }
    }
    // exhaustive: does ANY increasing chain from the FIRST anchor finish
    // inside the total window?
    def exhaustive(ev: Seq[(Long, String)], total: Long): Boolean = {
      val t1 = ev.collectFirst { case (t, "a") => t }
      def go(i: Int, prev: Long, anchor: Long): Boolean =
        i == steps.size || ev.exists { case (t, s) =>
          s == steps(i) && t > prev && t <= anchor + total &&
            go(i + 1, t, anchor)
        }
      t1.exists(t => go(1, t, t))
    }
    for ((gap, total) <- Seq((Some(10L), None), (None, Some(15L)),
        (Some(8L), Some(20L)))) {
      val got = Funnels.funnelTimes(df, "user_id", "ts", "etype", steps,
          gap, total)
        .orderBy("user_id")
        .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
        .collect()
        .map(r => r._1 -> Seq(Some(r._2.getTime / 1000),
          r._3.map(_.getTime / 1000), r._4.map(_.getTime / 1000))).toMap
      val users = byUser.filter(_._2.exists(_._2 == "a")).keySet
      assert(got.keySet == users)
      for (u <- users) {
        assert(got(u) == greedy(byUser(u), gap, total),
          s"user $u gap=$gap total=$total: ${byUser(u)}")
        // for a TOTAL-only window, greedy completion == chain existence
        if (gap.isEmpty)
          assert(got(u).last.isDefined == exhaustive(byUser(u), total.get),
            s"user $u total=$total: ${byUser(u)}")
      }
    }
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

  test("conversionLatency: strict funnel deltas, doubled median, " +
      "non-converters excluded") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "buy"),   // 600s
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "buy"),   // 1800s
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "buy"),   // 3600s
      (4L, ts("2024-01-01 10:00:00"), "buy"),   // buy BEFORE view
      (4L, ts("2024-01-01 11:00:00"), "view"))
      .toDF("user_id", "ts", "etype")
      .withColumn("k", lit(0L))
    val got = Funnels.conversionLatency(e, "user_id", "ts", "etype",
        "view", "buy", "k")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 3 converters; med2 = 2·1800s (odd n); user 4 never converts
    assert(got == ((0L, 3L, 600000000L, 3600000000L, 3600000000L)))
  }
}
