package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.expressions.JsonLeafKeysExpr

/** Nested-schema modelling: leaf paths, flatten/unflatten round trip,
  * keyset→schema construction, nested drift keysets. */
class NestedSpec extends SparkSpec {
  import spark.implicits._

  val nested = Seq((1L, ("x", 2.0), "top")).toDF("id", "pair", "plain")
    .select($"id",
      struct($"pair._1".as("a"), struct($"pair._2".as("deep")).as("inner"))
        .as("meta"), $"plain")

  test("leafPaths walks structs depth-first with dotted names") {
    assert(Nested.leafPaths(nested.schema) ==
      Seq("id", "meta.a", "meta.inner.deep", "plain"))
  }

  test("flatten → unflatten round-trips schema and data exactly") {
    val flat = Nested.flatten(nested)
    assert(flat.columns.toSeq ==
      Seq("id", "meta_a", "meta_inner_deep", "plain"))
    val back = Nested.unflatten(flat)
    // sibling order is sorted per level; compare field sets and values
    assert(Nested.leafPaths(back.schema).sorted ==
      Nested.leafPaths(nested.schema).sorted)
    assert(Nested.flatten(back).orderBy("id").collect().toSeq ==
      flat.orderBy("id").collect().toSeq)
  }

  test("unflatten rejects a name that is both leaf and struct prefix") {
    val bad = Seq((1, 2)).toDF("a", "a_b")
    intercept[IllegalArgumentException] { Nested.unflatten(bad) }
  }

  test("structFromPaths builds the nested all-string read schema") {
    val st = Nested.structFromPaths(Seq("meta.cust", "meta.status", "k"))
    assert(st == StructType(Seq(
      StructField("k", StringType),
      StructField("meta", StructType(Seq(
        StructField("cust", StringType), StructField("status", StringType)))))))
    intercept[IllegalArgumentException] {
      Nested.structFromPaths(Seq("a", "a.b"))
    }
  }

  test("json_leaf_keys canonicalizes nested keysets; null on malformed") {
    val df = Seq(
      """{"a": {"b": 1, "c": 2}, "d": 3}""",
      """{"d": 1, "a": {"c": 9, "b": 0}}""",
      """{"empty": {}, "arr": [1, 2], "nul": null}""",
      """not json""").toDF("rec")
    val out = df.select(JsonLeafKeysExpr.jsonLeafKeys($"rec")).collect()
      .map(r => Option(r.getString(0)))
    assert(out(0).contains("a.b,a.c,d"))
    assert(out(1).contains("a.b,a.c,d")) // key order never matters
    assert(out(2).contains("arr,empty,nul")) // arrays/empty objects = leaves
    assert(out(3).isEmpty)
  }

  test("nested drift ingest: leaf-path keysets mint versions, silver is flat") {
    val raw = Seq(
      """{"k": 1, "meta": {"cust": 10}}""",
      """{"k": 2, "meta": {"cust": 20, "status": "O"}}""",
      """{"k": 3, "meta": {"cust": 30}}""").toDF("rec")
    val result = graft.jobs.IngestPipeline.ingestNested(spark, raw, "rec")
    assert(result.registry.withoutSeed.versions.values.toSet ==
      Set(Set("k", "meta.cust"), Set("k", "meta.cust", "meta.status")))
    val silver = result.silver.orderBy("k")
    assert(silver.columns.toSeq ==
      Seq("k", "meta_cust", "meta_status", "schema_version"))
    val rows = silver.select($"k", $"meta_cust", $"meta_status")
      .as[(String, String, Option[String])].collect().toSeq
    assert(rows == Seq(("1", "10", None), ("2", "20", Some("O")),
      ("3", "30", None)))
  }
}
