package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Union-by-schema (U1-U3) and upsert (J1) semantics. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("unionBySchema pads missing columns with null and sorts columns") {
    val v1 = Seq((1, "a")).toDF("id", "alpha")
    val v2 = Seq((2, true)).toDF("id", "beta")
    val out = UnionBySchema(Seq(v1, v2))
    assert(out.columns.toSeq == Seq("alpha", "beta", "id"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(0) == "a" && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getBoolean(1))
  }

  test("unionBySchema projects to resolved column list when given") {
    val v1 = Seq((1, "a", 9.0)).toDF("id", "alpha", "junk")
    val v2 = Seq((2, "b")).toDF("id", "alpha")
    val out = UnionBySchema(Seq(v1, v2), projectTo = Some(Seq("id", "alpha")))
    assert(out.columns.toSeq == Seq("alpha", "id"))
    assert(out.count() == 2)
  }

  test("upsert: source wins on matched keys, unmatched rows flow through") {
    val target = Seq((1, "old", 10.0), (2, "keep", 20.0)).toDF("k", "v", "amt")
    val source = Seq((1, "new", 11.0), (3, "ins", 30.0)).toDF("k", "v", "amt")
    val out = Upsert(target, source, Seq("k")).orderBy("k")
      .as[(Int, String, Double)].collect().toSeq
    assert(out == Seq((1, "new", 11.0), (2, "keep", 20.0), (3, "ins", 30.0)))
  }

  test("forLargeTarget equals the window upsert without shuffling the target") {
    val target = Seq((1, "old", 10.0), (2, "keep", 20.0), (4, "t4", 40.0))
      .toDF("k", "v", "amt")
    val source = Seq((1, "new", 11.0), (3, "ins", 30.0)).toDF("k", "v", "amt")
    val viaWindow = Upsert(target, source, Seq("k"))
      .as[(Int, String, Double)].collect().toSet
    val big = Upsert.forLargeTarget(target, source, Seq("k"))
    assert(big.as[(Int, String, Double)].collect().toSet == viaWindow)
    // the target side reaches the anti-join via broadcast, not an exchange
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"))
  }

  test("mergeColumns: per-column coalesce, null source values keep target") {
    val target = Seq((1, Some("t1"), Some(10.0))).toDF("k", "v", "amt")
    val source = Seq((1, Option.empty[String], Some(11.0))).toDF("k", "v", "amt")
    val out = Upsert.mergeColumns(target, source, Seq("k"))
      .as[(Int, String, Double)].collect().head
    assert(out == ((1, "t1", 11.0)))
  }
}
