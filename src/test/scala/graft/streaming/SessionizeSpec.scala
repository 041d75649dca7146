package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  val events = Seq(
    (1L, "2024-01-01 00:00:00", 1.0),
    (1L, "2024-01-01 00:10:00", 2.0), // same session (10 min gap)
    (1L, "2024-01-01 01:00:00", 3.0), // new session (50 min gap)
    (2L, "2024-01-01 00:00:00", 5.0))
    .toDF("user_id", "ts_s", "value")
    .select($"user_id", to_timestamp($"ts_s").as("ts"), $"value")

  test("gap-based session ids and aggregates") {
    val out = Sessionize.sessions(events, "user_id", "ts", 1800L, $"value")
      .orderBy("user_id", "session_id")
      .select($"user_id", $"session_id", $"n_events", $"total_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 5.0)))
  }

  test("gap boundary: an event EXACTLY gap after the previous one stays " +
       "in the same session in BOTH formulations") {
    // the q152 oracle restates session_window with the batch lag rule
    // (new session only when gap > gapSeconds) — this pins that Spark's
    // session merge is inclusive at next.start == prev.end
    val edge = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:30:00", 2.0), // exactly 1800s after — same session
      (1L, "2024-01-01 01:00:01", 4.0)) // 1801s after — NEW session
      .toDF("user_id", "ts_s", "value")
      .select($"user_id", to_timestamp($"ts_s").as("ts"), $"value")
    val batch = Sessionize.sessions(edge, "user_id", "ts", 1800L, $"value")
      .select($"n_events", $"total_value").orderBy($"session_start")
      .as[(Long, Double)].collect().toSeq
    val stream = Sessionize.sessionsStream(edge, "user_id", "ts",
        "30 minutes", $"value")
      .select($"n_events", $"total_value").orderBy($"session_start")
      .as[(Long, Double)].collect().toSeq
    assert(batch == Seq((2L, 3.0), (1L, 4.0)))
    assert(stream == batch)
  }

  test("session_window streaming formulation agrees on bounds and totals") {
    val out = Sessionize.sessionsStream(events, "user_id", "ts", "30 minutes", $"value")
      .orderBy("user_id", "session_start")
      .select($"user_id", $"n_events", $"total_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }
}
