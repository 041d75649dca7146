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
}
