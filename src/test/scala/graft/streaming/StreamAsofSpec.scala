package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamAsof.{AsofInput, AsofJoined}

class StreamAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** Batch reference: graft.operators.AsofJoin over the same rows. */
  private def batchAsof(rows: Seq[AsofInput]): Set[(Long, Long, Double, Option[Long], Option[Double])] = {
    val lefts = rows.filter(_.side == "l")
      .map(e => (e.key, e.ts, e.value)).toDF("key", "ts", "left_value")
    val rights = rows.filter(_.side == "r")
      .map(e => (e.key, e.ts, e.value)).toDF("key", "ts", "right_value")
    graft.operators.AsofJoin(lefts, rights, Seq("key"), "ts", Seq("right_value"))
      .select($"key", $"ts", $"left_value", $"right_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getDouble(2),
        None: Option[Long],
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
  }

  private def emitted(table: String): Set[(Long, Long, Double, Option[Long], Option[Double])] =
    spark.table(table).as[AsofJoined].collect()
      .map(j => (j.key, j.ts.getTime / 1000, j.left_value,
        None: Option[Long], j.right_value)).toSet

  test("streaming as-of equals the batch as-of join, with out-of-order input") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofInput]
    // the delay must cover the cross-batch disorder below (batch 2 carries
    // events ~55s older than batch 1's max): rows older than the watermark
    // are dropped as late BEFORE the state function — by Spark, by design
    val query = StreamAsof.start(input.toDS(), "60 seconds", "asof_out")
    try {
      val all = Seq(
        AsofInput(1L, ts(100), "r", 10.0),
        AsofInput(1L, ts(105), "l", 1.0),   // joins r@100
        AsofInput(1L, ts(110), "r", 20.0),
        AsofInput(1L, ts(108), "l", 2.0),   // out-of-order left: joins r@100
        AsofInput(1L, ts(110), "l", 3.0),   // tie: joins r@110 (inclusive)
        AsofInput(2L, ts(50), "l", 4.0),    // no right at all → null
        AsofInput(2L, ts(60), "r", 40.0),
        AsofInput(2L, ts(70), "l", 5.0))    // joins r@60

      // batch 1: events up to t=105 — nothing can finalize until the
      // watermark (max seen ts) passes the left timestamps
      input.addData(all.take(2): _*)
      query.processAllAvailable()
      // batch 2: the rest, including the out-of-order left at 108
      input.addData(all.drop(2): _*)
      query.processAllAvailable()
      // flush: advance the watermark far past every buffered left
      input.addData(AsofInput(99L, ts(1000), "r", 0.0))
      query.processAllAvailable()
      input.addData(AsofInput(99L, ts(2000), "r", 0.0))
      query.processAllAvailable()

      assert(emitted("asof_out") == batchAsof(all))
    } finally query.stop()
  }

  test("late right within the watermark delay corrects nothing already emitted — it arrives before emission") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofInput]
    val query = StreamAsof.start(input.toDS(), "10 seconds", "asof_late")
    try {
      input.addData(AsofInput(1L, ts(100), "l", 1.0),
        AsofInput(1L, ts(104), "r", 7.0))
      query.processAllAvailable()
      // watermark = 104 - 10 = 94 < 100: the left is still buffered
      assert(spark.table("asof_late").count() == 0)
      // a late right BEFORE the left's ts lands inside the delay window
      input.addData(AsofInput(1L, ts(99), "r", 9.0))
      query.processAllAvailable()
      input.addData(AsofInput(9L, ts(300), "r", 0.0))
      query.processAllAvailable()
      input.addData(AsofInput(9L, ts(400), "r", 0.0))
      query.processAllAvailable()
      val out = spark.table("asof_late").as[AsofJoined].collect()
        .filter(_.key == 1L).map(j => (j.ts.getTime / 1000, j.right_value))
      // the left at 100 joined the late right at 99, not the one at 104
      assert(out.toSeq == Seq((100L, Some(9.0))))
    } finally query.stop()
  }

  test("Spark's late filter is INCLUSIVE at the watermark — the premise of inclusive emission") {
    // asofJoin emits lefts with ts <= wm. That is only race-free if no
    // event at ts <= wm can arrive afterwards. This pins Spark's actual
    // boundary: an event arriving AT the current watermark is dropped as
    // late before reaching the state function — if this ever flips to a
    // strict < filter, emission must flip to strict < too.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofInput]
    val query = StreamAsof.start(input.toDS(), "0 seconds", "asof_boundary")
    try {
      input.addData(AsofInput(9L, ts(100), "r", 0.0))
      query.processAllAvailable() // wm := 100
      input.addData(AsofInput(1L, ts(100), "l", 1.0)) // AT the watermark
      query.processAllAvailable()
      // flush far past everything; a buffered left would emit via timeout
      input.addData(AsofInput(9L, ts(300), "r", 0.0))
      query.processAllAvailable()
      input.addData(AsofInput(9L, ts(400), "r", 0.0))
      query.processAllAvailable()
      assert(spark.table("asof_boundary").filter($"key" === 1L).count() == 0,
        "an event AT the watermark reached the state function — late filter" +
          " is no longer inclusive; make StreamAsof emission strict")
    } finally query.stop()
  }

  test("timeout emits buffered lefts when the watermark advances on other keys") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofInput]
    val query = StreamAsof.start(input.toDS(), "0 seconds", "asof_timeout")
    try {
      input.addData(AsofInput(1L, ts(100), "r", 10.0),
        AsofInput(1L, ts(105), "l", 1.0))
      query.processAllAvailable()
      // watermark only advances via a DIFFERENT key; key 1 gets no traffic
      input.addData(AsofInput(2L, ts(500), "r", 0.0))
      query.processAllAvailable()
      input.addData(AsofInput(2L, ts(600), "r", 0.0))
      query.processAllAvailable()
      val out = spark.table("asof_timeout").as[AsofJoined].collect()
        .filter(_.key == 1L)
      assert(out.map(j => (j.ts.getTime / 1000, j.right_value)).toSeq ==
        Seq((105L, Some(10.0))))
    } finally query.stop()
  }
}
