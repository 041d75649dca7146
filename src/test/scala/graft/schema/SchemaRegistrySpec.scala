package graft.schema

import graft.SparkSpec

/** Pins the reference's schema-versioning semantics
  * (`utilities/utilities.py:639-704`; SURVEY.md §7.4). */
class SchemaRegistrySpec extends SparkSpec {

  test("seed is version 0 with empty keyset; withoutSeed drops it") {
    assert(SchemaRegistry.seed.versions == Map(0 -> Set.empty))
    assert(SchemaRegistry.seed.withoutSeed.versions.isEmpty)
  }

  test("keyset identity is order-insensitive, first-seen wins, ids mint monotonically") {
    val r = SchemaRegistry.seed.observe(Seq(Set("a", "b"), Set("b", "a"), Set("a", "b", "c")))
    assert(r.versionOf(Set("b", "a")).contains(1))
    assert(r.versionOf(Set("c", "b", "a")).contains(2))
    assert(r.nextId == 3)
  }

  test("observe is idempotent") {
    val r1 = SchemaRegistry.seed.observe(Seq(Set("x")))
    assert(r1.observe(Seq(Set("x"))) == r1)
  }

  test("allColumns unions every version's keyset") {
    val r = SchemaRegistry.seed.observe(Seq(Set("a", "b"), Set("b", "c")))
    assert(r.allColumns == Set("a", "b", "c"))
  }

  test("discover + assign tags rows with their keyset version") {
    import spark.implicits._
    val df = Seq(
      """{"a": 1, "b": 2}""",
      """{"b": 5, "a": 9}""",
      """{"a": 1}""").toDF("rec")
    val reg = SchemaRegistry.seed
      .observeSorted(SchemaRegistry.discoverKeysets(df, "rec"))
    val out = SchemaRegistry.assignVersions(df, "rec", reg)
      .select("schema_version").as[Int].collect().toSeq
    // sorted keysets: "a" < "a,b" → versions 1 and 2
    assert(out == Seq(2, 2, 1))
  }
}
