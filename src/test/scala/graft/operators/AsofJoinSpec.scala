package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right row at or before each left ts, per key") {
    val quotes = Seq(
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 200.0))
      .toDF("k", "ts", "quote")
    val probes = Seq(
      (1L, 5L),   // before any quote → null
      (1L, 10L),  // equal ts → inclusive match 100.0
      (1L, 25L),  // between → 110.0
      (1L, 99L),  // after all → 120.0
      (2L, 20L),  // other key → 200.0
      (3L, 50L))  // unseen key → null
      .toDF("k", "ts")
    val out = AsofJoin(probes, quotes, Seq("k"), "ts", Seq("quote"))
      .orderBy("k", "ts")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, 5L, None), (1L, 10L, Some(100.0)), (1L, 25L, Some(110.0)),
      (1L, 99L, Some(120.0)), (2L, 20L, Some(200.0)), (3L, 50L, None)))
  }

  test("matches the naive pairwise formulation on random data") {
    val rnd = new scala.util.Random(17)
    val quotes = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
      .toDF("k", "ts", "quote")
    val probes = Seq.fill(200)(
      (rnd.nextInt(6).toLong, rnd.nextInt(1100).toLong, rnd.nextInt(1 << 20).toLong))
      .toDF("k", "ts", "probe_id")
    val fast = AsofJoin(probes, quotes, Seq("k"), "ts", Seq("quote"))
      .orderBy("probe_id", "ts")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // naive: every historical pair, keep the latest — the formulation the
    // operator exists to avoid
    val q = quotes.toDF("k", "qts", "quote")
    val naive = probes.join(q, Seq("k"), "left")
      .withColumn("elig_ts", when(col("qts") <= col("ts"), col("qts")))
      .withColumn("elig_quote", when(col("qts") <= col("ts"), col("quote")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("probe_id", "k", "ts")
          .orderBy(col("elig_ts").desc_nulls_last)))
      .filter(col("_rn") === 1)
      .select(col("k"), col("ts"), col("probe_id"), col("elig_quote").as("quote"))
      .orderBy("probe_id", "ts")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(fast.toSet == naive.toSet && fast.size == naive.size)
  }
}
