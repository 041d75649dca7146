package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the 100 TB co-location story: two tables bucketed on the join key
  * join WITHOUT a shuffle exchange — the layout a staging→warehouse merge
  * uses so the upsert's key shuffle disappears at scale (SURVEY.md §7.4
  * item 6; Upsert Scaladoc). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero Exchange operators") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    spark.range(10000).select($"id".as("k"), ($"id" * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_fact")
    spark.range(1000).select($"id".as("k"), ($"id" % 7).as("w"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_dim")

    // disable broadcast so the co-located sort-merge path is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_fact")
        .join(spark.table("graft_bkt_dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }
}
