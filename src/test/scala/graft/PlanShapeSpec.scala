package graft

import org.apache.spark.sql.functions._

/** Pins the physical-plan properties the 100 TB posture depends on — a
  * passing result with a regressed plan (lost pushdown, surprise
  * broadcast of a big side) is still a failure at scale. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("filters and projection push into the parquet scan") {
    val plan = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_quantity" > 40.0)
      .select($"l_orderkey", $"l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment")) // untouched columns pruned
  }

  test("dimension joins broadcast the small side, not the fact side") {
    val plan = graft.queries.Relational.queries("q04_nation_revenue")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the broadcast exchanges sit on dimension scans (nation/region/customer
    // paths), never on lineitem
    val broadcastBlocks = plan.split("BroadcastExchange").drop(1)
    assert(broadcastBlocks.nonEmpty &&
      !broadcastBlocks.exists(b =>
        b.linesIterator.take(8).exists(_.contains("lineitem"))))
  }

  test("salted join never broadcasts the replicated side") {
    val l = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plan = graft.operators.Skew.saltedJoin(l, o, Seq("l_orderkey"),
        distCol = "l_linenumber", saltN = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"))
  }

  test("whole-stage codegen covers the text-analysis projections") {
    val df = graft.queries.TrainingData.queries("q23_quality_score")(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen nodes materialize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.linesIterator.exists(_.trim.matches("""^(\+-|:-)?\s*\*\(\d+\).*""")))
  }
}
