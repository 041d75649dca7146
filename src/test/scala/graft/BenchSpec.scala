package graft

import graft.SparkSpec

class BenchSpec extends SparkSpec {

  test("timeQuery reports a crashing query instead of a fast time") {
    val (_, err) = Bench.timeQuery(spark, "/nonexistent",
      (_, _) => throw new RuntimeException("poisoned query"))
    assert(err.exists(_.contains("poisoned query")))
  }

  test("timeQuery returns no error for a healthy query") {
    import spark.implicits._
    val (t, err) = Bench.timeQuery(spark, "unused",
      (s, _) => Seq(1, 2, 3).toDF("x"))
    assert(err.isEmpty && t > 0.0)
  }
}
