package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.StatefulOps.UserEvent

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("keyed state accumulates across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val query = StatefulOps.startRunningTotals(input.toDS(), "user_totals")
    try {
      input.addData(UserEvent(1, "click", 1.0), UserEvent(1, "error", 2.0),
        UserEvent(2, "view", 5.0))
      query.processAllAvailable()
      val after1 = spark.table("user_totals")
        .as[StatefulOps.UserTotals].collect()
        .groupBy(_.user_id).view.mapValues(_.last).toMap
      assert(after1(1L).n_events == 2 && after1(1L).total_value == 3.0 &&
        after1(1L).n_errors == 1)
      assert(after1(2L).n_events == 1)

      // second micro-batch folds into existing state
      input.addData(UserEvent(1, "click", 4.0))
      query.processAllAvailable()
      val after2 = spark.table("user_totals")
        .as[StatefulOps.UserTotals].collect()
        .filter(_.user_id == 1L).maxBy(_.n_events)
      assert(after2.n_events == 3 && after2.total_value == 7.0)
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessions emit exactly once, on close") {
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[StatefulOps.TimedEvent]
    val query = StatefulOps.startClosedSessions(input.toDS(), gapSeconds = 60,
      "closed_sessions")
    try {
      // one burst for user 1; nothing closes while it could still continue
      input.addData(
        StatefulOps.TimedEvent(1L, ts(100), 1.0),
        StatefulOps.TimedEvent(1L, ts(130), 2.0))
      query.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0)

      // a same-batch gap crossing closes the first session immediately
      input.addData(
        StatefulOps.TimedEvent(1L, ts(400), 5.0),
        StatefulOps.TimedEvent(1L, ts(420), 1.0))
      query.processAllAvailable()
      val s1 = spark.table("closed_sessions")
        .as[StatefulOps.ClosedSession].collect().toSeq
      assert(s1.map(s => (s.user_id, s.session_start.getTime / 1000,
        s.session_end.getTime / 1000, s.n_events, s.total_value)) ==
        Seq((1L, 100L, 130L, 2L, 3.0)))

      // advancing the watermark past end+gap times the open session out
      input.addData(StatefulOps.TimedEvent(2L, ts(1000), 9.0))
      query.processAllAvailable()
      input.addData(StatefulOps.TimedEvent(2L, ts(1001), 1.0))
      query.processAllAvailable()
      val s2 = spark.table("closed_sessions")
        .as[StatefulOps.ClosedSession].collect().toSeq
        .filter(_.user_id == 1L)
      assert(s2.map(s => (s.session_start.getTime / 1000,
        s.session_end.getTime / 1000, s.n_events, s.total_value)).toSet ==
        Set((100L, 130L, 2L, 3.0), (400L, 420L, 2L, 6.0)))
    } finally query.stop()
  }

  test("dedupStream drops watermark-window duplicates with bounded state") {
    implicit val sc = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val query = EventStreams.dedupStream(
        input.toDS().toDF("dl_id", "ts"), "dl_id", "ts", "30 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      input.addData((1L, ts(100)), (1L, ts(105)), (2L, ts(110)))
      query.processAllAvailable()
      input.addData((1L, ts(112)), (3L, ts(115))) // 1 is a within-window dup
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").select("dl_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally query.stop()
  }
}
