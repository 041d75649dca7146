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

  test("session_window streaming formulation agrees on bounds and totals") {
    val out = Sessionize.sessionsStream(events, "user_id", "ts", "30 minutes", $"value")
      .orderBy("user_id", "session_start")
      .select($"user_id", $"n_events", $"total_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }
}
