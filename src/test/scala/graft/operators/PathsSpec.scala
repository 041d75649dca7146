package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Clickstream summaries: Markov transition counts and session paths. */
class PathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val clicks = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00"), "view"),
    (2L, "u1", ts("2024-01-01 10:01:00"), "click"),
    (3L, "u1", ts("2024-01-01 10:02:00"), "buy"),
    // 20-min silence: new session for u1
    (4L, "u1", ts("2024-01-01 10:25:00"), "view"),
    (5L, "u2", ts("2024-01-01 10:00:30"), "view"),
    (6L, "u2", ts("2024-01-01 10:01:30"), "click"),
    (7L, "u2", ts("2024-01-01 10:02:30"), "buy"))
    .toDF("event_id", "user_id", "ts", "event_type")

  test("transitionCounts: per-key lag with the ^start entry state") {
    val got = Paths.transitionCounts(clicks, "user_id",
        Seq("ts", "event_id"), "event_type")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("^start", "view") -> 2L,   // u1 and u2 both enter at view
      ("view", "click") -> 2L,
      ("click", "buy") -> 2L,
      ("buy", "view") -> 1L))     // u1's cross-session hop still counts
  }

  test("a null event type is a state, not the entry state") {
    val e = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), Option.empty[String]),
      (2L, "u", ts("2024-01-01 10:01:00"), Some("buy")))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Paths.transitionCounts(e, "user_id",
        Seq("ts", "event_id"), "event_type")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        r.getLong(2)).toMap
    // first event (null type) enters from ^start; the buy transitions
    // FROM the null state, not from ^start
    assert(got == Map(
      (Some("^start"), None) -> 1L,
      (None, Some("buy")) -> 1L))
  }

  test("lagged emits null on each key's first row, previous value after") {
    val got = SortedFold.lagged(
        Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
          .toDF("k", "i", "v"), "k", Seq("i"), "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got == Map(1L -> None, 2L -> Some(10L), 3L -> None))
  }

  test("sessionPaths joins types in (ts, id) order within the session") {
    val got = Paths.sessionPaths(clicks, "user_id", "ts", "event_id",
        "event_type", gapSec = 600)
      .select("path").as[String].collect().sorted.toSeq
    assert(got == Seq("view", "view>click>buy", "view>click>buy"))
  }

  test("topPaths counts journeys, ties break on the path string") {
    val got = Paths.topPaths(clicks, "user_id", "ts", "event_id",
        "event_type", gapSec = 600, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view>click>buy", 2L), ("view", 1L)))
  }
}
