package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sketches

class BottomKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"s", $"id")))
      .filter($"rk" <= k)
      .select($"g", $"id", $"s")
      .as[(String, Long, Double)].collect().toSet

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(Sketches.bottomKByScore($"id", $"s", k).as("b"))
      .select($"g", explode($"b").as("e"))
      .select($"g", $"e.id", $"e.score")
      .as[(String, Long, Double)].collect().toSet

  test("bottom_k_by_score equals the row_number window formulation " +
       "(seeded sweep over groups and k)") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(4)}", i.toLong, rnd.nextInt(200) / 7.0)
    }
    val df = rows.toDF("g", "id", "s")
    for (k <- Seq(1, 3, 10, 1000))
      assert(viaAgg(df, k) == windowed(df, k), s"k=$k")
  }

  test("result is partitioning-independent (merge path exercised)") {
    val df = (1 to 300).map(i => ("g", i.toLong, (i % 37).toDouble))
      .toDF("g", "id", "s")
    val one = viaAgg(df.coalesce(1), 5)
    assert(viaAgg(df.repartition(13), 5) == one)
    assert(one == windowed(df, 5))
  }

  test("ties break to the smaller id; best-first output order") {
    val df = Seq(("g", 30L, 2.0), ("g", 10L, 2.0), ("g", 20L, 2.0),
      ("g", 5L, 1.0)).toDF("g", "id", "s")
    val ids = df.groupBy($"g")
      .agg(Sketches.bottomKByScore($"id", $"s", 3).as("b"))
      .select(explode($"b.id")).as[Long].collect().toSeq
    assert(ids == Seq(5L, 10L, 20L))
  }

  test("null ids/scores are skipped; NaN scores raise loudly") {
    val df = Seq(
      (Some(1L), Some(3.0)), (None, Some(1.0)), (Some(2L), None),
      (Some(3L), Some(2.0)))
      .toDF("id", "s").withColumn("g", lit("g"))
    val ids = df.groupBy($"g")
      .agg(Sketches.bottomKByScore($"id", $"s", 10).as("b"))
      .select(explode($"b.id")).as[Long].collect().toSeq
    assert(ids == Seq(3L, 1L))
    val nan = Seq((1L, Double.NaN)).toDF("id", "s").withColumn("g", lit("g"))
    val e = intercept[Exception] {
      nan.groupBy($"g").agg(Sketches.bottomKByScore($"id", $"s", 2))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NaN")))
  }

  test("partial state is bounded: the aggregate plans as a (possibly " +
       "sort-based) object aggregate with map-side partials, no window") {
    val df = (1 to 200).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "s")
    val out = df.groupBy($"g")
      .agg(Sketches.bottomKByScore($"id", $"s", 5).as("b"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("bottom_k_by_score"), plan)
    // partial (merge) aggregation present on the map side
    assert(plan.linesIterator.count(_.contains("bottom_k_by_score")) >= 2,
      plan)
  }
}
