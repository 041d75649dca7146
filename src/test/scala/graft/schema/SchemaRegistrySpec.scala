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

  test("save/load round-trips version ids; loadOrSeed seeds when missing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reg").toString
    val path = s"$dir/FSM_Account_schemas.json"
    assert(SchemaRegistry.loadOrSeed(spark, path) == SchemaRegistry.seed)
    val r = SchemaRegistry.seed.observe(Seq(Set("b", "a"), Set("a")))
    SchemaRegistry.save(spark, r, path)
    val back = SchemaRegistry.load(spark, path)
    assert(back.contains(r))
    // a later observation on the loaded registry mints past the saved max,
    // even for a keyset sorting before the existing ones
    assert(back.get.observe(Seq(Set("0_first"))).versionOf(Set("0_first")).contains(3))
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
