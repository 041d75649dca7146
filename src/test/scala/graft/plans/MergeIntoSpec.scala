package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
import graft.SparkSpec

/** The §7.3 custom-Catalyst surface: `MERGE INTO` SQL over plain relations,
  * rewritten by GraftMergeRule into the engine's Upsert. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE INTO temp view runs the upsert and replaces the target") {
    Seq((1L, "old", 10.0), (2L, "keep", 20.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("warehouse")
    Seq((1L, "new", 11.0), (3L, "ins", 30.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("staging")
    spark.sql(
      """MERGE INTO warehouse USING staging ON warehouse.k = staging.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("warehouse").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "new", 11.0), (2L, "keep", 20.0), (3L, "ins", 30.0)))
  }

  test("MERGE INTO a saved table overwrites it with the merged rows") {
    freshTable("graft_merge_target")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "amt")
      .write.mode("overwrite").saveAsTable("graft_merge_target")
    Seq((2L, 9.0), (3L, 3.0)).toDF("k", "amt")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO graft_merge_target USING merge_src
        |ON graft_merge_target.k = merge_src.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_target").orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
    spark.sql("DROP TABLE graft_merge_target")
  }

  /** saveAsTable leaves its managed location behind when a prior run died
    * between directory creation and catalog registration — clear both. */
  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.sessionState.conf.warehousePath.stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$name"))
  }

  test("partitioned table merge rewrites ONLY the affected partitions") {
    freshTable("graft_merge_parted")
    Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"), (4L, 30, "d"))
      .toDF("k", "p", "v").write.mode("overwrite").partitionBy("p")
      .saveAsTable("graft_merge_parted")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "graft_merge_parted")).location.getPath
    def files(p: Int): Map[String, Long] = {
      val d = new java.io.File(s"$loc/p=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before20 = files(20)
    val before30 = files(30)
    assert(before20.nonEmpty && before30.nonEmpty)
    // update k=1 (stays in p=10), insert k=5 into new partition p=40
    Seq((1L, 10, "A"), (5L, 40, "e")).toDF("k", "p", "v")
      .createOrReplaceTempView("merge_part_src")
    spark.sql(
      """MERGE INTO graft_merge_parted USING merge_part_src
        |ON graft_merge_parted.k = merge_part_src.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_parted").orderBy("k")
      .select($"k", $"p", $"v").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 10, "A"), (2L, 10, "b"), (3L, 20, "c"),
      (4L, 30, "d"), (5L, 40, "e")))
    // untouched partitions: same files, same modification times
    assert(files(20) == before20)
    assert(files(30) == before30)
    spark.sql("DROP TABLE graft_merge_parted")
  }

  test("merge moving every row out of a partition drops it (no stale rows)") {
    freshTable("graft_merge_move")
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p")
      .saveAsTable("graft_merge_move")
    // k=2 moves from p=20 to p=10: p=20 becomes empty and must vanish
    Seq((2L, 10, "B")).toDF("k", "p", "v")
      .createOrReplaceTempView("merge_move_src")
    spark.sql(
      """MERGE INTO graft_merge_move USING merge_move_src
        |ON graft_merge_move.k = merge_move_src.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_move").orderBy("k")
      .select($"k", $"p", $"v").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 10, "a"), (2L, 10, "B")))
    spark.sql("DROP TABLE graft_merge_move")
  }

  test("compound keys come from the AND conjunction") {
    Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "amt")
      .createOrReplaceTempView("warehouse2")
    Seq((1L, "b", 9.0), (2L, "c", 3.0)).toDF("k1", "k2", "amt")
      .createOrReplaceTempView("staging2")
    spark.sql(
      """MERGE INTO warehouse2 USING staging2
        |ON warehouse2.k1 = staging2.k1 AND warehouse2.k2 = staging2.k2
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("warehouse2").orderBy("k1", "k2")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 1.0), (1L, "b", 9.0), (2L, "c", 3.0)))
  }

  test("WHEN MATCHED THEN DELETE removes matched rows only") {
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("del_target")
    Seq((2L, "x"), (9L, "y")).toDF("k", "v")
      .createOrReplaceTempView("del_src")
    spark.sql(
      """MERGE INTO del_target USING del_src ON del_target.k = del_src.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table("del_target").orderBy("k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (3L, "c")))
  }

  test("DELETE on a partitioned table prunes and drops emptied partitions") {
    freshTable("graft_merge_del")
    Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"), (4L, 30, "d"))
      .toDF("k", "p", "v").write.mode("overwrite").partitionBy("p")
      .saveAsTable("graft_merge_del")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "graft_merge_del")).location.getPath
    val before10 = new java.io.File(s"$loc/p=10")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    // delete k=3: partition 20 empties out and must vanish; p=10 untouched
    Seq((3L, 0, "")).toDF("k", "p", "v").createOrReplaceTempView("del_part_src")
    spark.sql(
      """MERGE INTO graft_merge_del USING del_part_src
        |ON graft_merge_del.k = del_part_src.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table("graft_merge_del").select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
    assert(new java.io.File(s"$loc/p=10")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap == before10)
    spark.sql("DROP TABLE graft_merge_del")
  }

  test("INSERT-only merge appends absent keys without touching existing files") {
    freshTable("graft_merge_ins")
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").saveAsTable("graft_merge_ins")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "graft_merge_ins")).location.getPath
    def mtimes(p: Int) = new java.io.File(s"$loc/p=$p")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val (b10, b20) = (mtimes(10), mtimes(20))
    // k=1 exists (skipped, even with a different payload); k=5 is new
    Seq((1L, 10, "CHANGED"), (5L, 20, "e")).toDF("k", "p", "v")
      .createOrReplaceTempView("ins_src")
    spark.sql(
      """MERGE INTO graft_merge_ins USING ins_src ON graft_merge_ins.k = ins_src.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_ins").orderBy("k")
      .select($"k", $"p", $"v").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 10, "a"), (2L, 20, "b"), (5L, 20, "e")))
    // append-only: every pre-existing file is byte-identical in place
    assert(mtimes(10) == b10)
    assert((mtimes(20).toSet intersect b20.toSet) == b20.toSet)
    spark.sql("DROP TABLE graft_merge_ins")
  }

  test("INT staging vs BIGINT warehouse partition column keeps rewritten partitions") {
    freshTable("graft_merge_typed")
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").saveAsTable("graft_merge_typed")
    // staging's p is INT; with p in the merge key the affected-partition
    // list comes ONLY from the source side, so without the target-type
    // cast the emptied-partition check compared boxed Int(10) to the
    // written Long(10), classified every rewritten partition as emptied,
    // and dropped it — silent data loss
    Seq((1, 10, "A"), (3, 30, "c")).toDF("k", "p", "v")
      .createOrReplaceTempView("merge_typed_src")
    spark.sql(
      """MERGE INTO graft_merge_typed USING merge_typed_src
        |ON graft_merge_typed.k = merge_typed_src.k
        |   AND graft_merge_typed.p = merge_typed_src.p
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_typed").orderBy("k")
      .select($"k", $"p", $"v").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 10L, "A"), (2L, 20L, "b"), (3L, 30L, "c")))
    spark.sql("DROP TABLE graft_merge_typed")
  }

  test("BIGINT staging vs INT warehouse partition column keeps rewritten partitions") {
    freshTable("graft_merge_narrow")
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").saveAsTable("graft_merge_narrow")
    // the REVERSE widening of the test above: the warehouse partition
    // column is INT and staging's is BIGINT, so the unionByName-coerced
    // merged frame carries p as BIGINT and the WRITTEN partition values
    // collect as Long boxes while the affected list holds Int — the
    // emptied-partition compare must stay value-based (normalized through
    // the target's types), or the rewritten partitions get dropped
    Seq((1L, 10L, "A"), (3L, 30L, "c")).toDF("k", "p", "v")
      .createOrReplaceTempView("merge_narrow_src")
    spark.sql(
      """MERGE INTO graft_merge_narrow USING merge_narrow_src
        |ON graft_merge_narrow.k = merge_narrow_src.k
        |   AND graft_merge_narrow.p = merge_narrow_src.p
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("graft_merge_narrow").orderBy("k")
      .select($"k", $"p", $"v").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 10, "A"), (2L, 20, "b"), (3L, 30, "c")))
    spark.sql("DROP TABLE graft_merge_narrow")
  }

  test("unsupported merge shapes fail loudly") {
    Seq((1L, 1.0)).toDF("k", "amt").createOrReplaceTempView("warehouse3")
    Seq((1L, 2.0)).toDF("k", "amt").createOrReplaceTempView("staging3")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO warehouse3 USING staging3 ON warehouse3.k = staging3.k
          |WHEN MATCHED AND staging3.amt > 1.0 THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("graft MERGE INTO") ||
      e.getMessage.toLowerCase.contains("merge"))
  }

  test("guard refuses a wrong-key merge loudly; right key still merges") {
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "amt")
      .createOrReplaceTempView("warehouse5")
    // keys 1001/1002: zero overlap with the warehouse — the wrong-key smell
    Seq((1001L, 9.0), (1002L, 8.0)).toDF("k", "amt")
      .createOrReplaceTempView("staging5")
    spark.conf.set("spark.graft.merge.guard", "true")
    try {
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO warehouse5 USING staging5 ON warehouse5.k = staging5.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(e.getMessage.contains("guard") ||
        Option(e.getCause).exists(_.getMessage.contains("guard")))
      // untouched: the refusal happened before any rewrite
      assert(spark.table("warehouse5").count() == 2L)

      // overlapping keys pass the guard and merge normally
      Seq((2L, 9.0), (3L, 3.0)).toDF("k", "amt")
        .createOrReplaceTempView("staging5b")
      spark.sql(
        """MERGE INTO warehouse5 USING staging5b ON warehouse5.k = staging5b.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val out = spark.table("warehouse5").orderBy("k")
        .as[(Long, Double)].collect().toSeq
      assert(out == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))

      // insert_only is exempt: a fresh batch legitimately has no overlap
      Seq((50L, 5.0)).toDF("k", "amt").createOrReplaceTempView("staging5c")
      spark.sql(
        """MERGE INTO warehouse5 USING staging5c ON warehouse5.k = staging5c.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.table("warehouse5").count() == 4L)
    } finally spark.conf.unset("spark.graft.merge.guard")
  }

  test("rule converts the logical plan shape (keys, tables)") {
    Seq((1L, 1.0)).toDF("k", "amt").createOrReplaceTempView("warehouse4")
    Seq((1L, 2.0)).toDF("k", "amt").createOrReplaceTempView("staging4")
    val parsed = spark.sessionState.sqlParser.parsePlan(
      """MERGE INTO warehouse4 USING staging4 ON warehouse4.k = staging4.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val cmd = GraftMerge.convert(parsed.asInstanceOf[MergeIntoTable])
      .asInstanceOf[GraftMergeCommand]
    assert(cmd.targetTable == "warehouse4" && cmd.sourceTable == "staging4")
    assert(cmd.keys == Seq("k"))
  }
}
