package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("one pass yields exact counts, typed bounds, and exact NDV below k") {
    val df = Seq(
      (Some(9L), Some("b")),
      (Some(10L), Some("a")),
      (Some(10L), None),
      (None, Some("a")))
      .toDF("num", "str")
    val got = TableStats.columnStats(df, Seq("num", "str"), k = 16)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    // typed min: 9 < 10 numerically (a lexicographic min over the string
    // rendering would claim "10" < "9")
    assert(got("num") == (("num", 4L, 1L, 2.0, Some("9"), Some("10"))))
    assert(got("str") == (("str", 4L, 1L, 2.0, Some("a"), Some("b"))))
  }

  test("all statistics come from a single aggregation (one scan, no rescans)") {
    val df = spark.range(1, 1001).toDF("v").withColumn("w", $"v" % 7)
    val stats = TableStats.columnStats(df, Seq("v", "w"), k = 64)
    stats.collect()
    val plan = stats.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly one scan of the input in the whole (final) plan — every
    // column's sketch/bounds ride the same aggregation
    assert(plan.split("Range \\(").length - 1 == 1, plan)
    assert(plan.split("ObjectHashAggregate").length - 1 == 2, plan) // partial+final
  }

  test("saturated NDV estimate lands near the truth") {
    val df = (1L to 20000L).toDF("v")
    val est = TableStats.columnStats(df, Seq("v"), k = 256)
      .select($"ndv_est").as[Double].collect().head
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
  }

  test("fast (xxhash64) path: identical counts/bounds, NDV within KMV " +
       "error of the portable path, exact below k") {
    val df = spark.range(1, 5001).toDF("v")
      .withColumn("w", $"v" % 37)
      .withColumn("s", concat(lit("row"), $"v" % 11))
    val portable = TableStats.columnStats(df, Seq("v", "w", "s"), k = 256)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val fast = TableStats.columnStatsFast(df, Seq("v", "w", "s"), k = 256)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    for (c <- Seq("v", "w", "s")) {
      // counts and typed bounds are hash-independent: exactly equal
      assert(fast(c).copy(_4 = 0.0) == portable(c).copy(_4 = 0.0))
    }
    // below-k columns are EXACT in both paths (sketch not saturated)
    assert(portable("w")._4 == 37.0 && fast("w")._4 == 37.0)
    assert(portable("s")._4 == 11.0 && fast("s")._4 == 11.0)
    // saturated column: both estimates inside the ~1/sqrt(k) KMV band
    assert(math.abs(portable("v")._4 - 5000.0) / 5000.0 < 0.15)
    assert(math.abs(fast("v")._4 - 5000.0) / 5000.0 < 0.15)
  }

  test("fast path agrees with portable path on null-bearing columns: " +
       "nulls are no phantom distinct value") {
    // xxhash64(null) returns the seed (non-null); a naive fast path would
    // count one phantom NDV on any nullable column. Pin both paths.
    val df = Seq(Some("a"), Some("b"), None, None, Some("a"))
      .toDF("s")
      .withColumn("allnull", lit(null).cast("string"))
    val portable = TableStats.columnStats(df, Seq("s", "allnull"), k = 16)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val fast = TableStats.columnStatsFast(df, Seq("s", "allnull"), k = 16)
      .as[(String, Long, Long, Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(portable("s") == (("s", 5L, 2L, 2.0, Some("a"), Some("b"))))
    assert(fast("s") == portable("s"))
    assert(portable("allnull")._4 == 0.0 && fast("allnull")._4 == 0.0)
    assert(fast("allnull") == portable("allnull"))
  }

  test("histogram: exact equi-width counts, complete bucket list, max " +
       "value in the last bucket, nulls excluded") {
    val df = (Seq.tabulate(100)(i => Some(i.toDouble)) :+
        None :+ Some(100.0)) // max lands IN range; one null excluded
      .toDF("v")
    val got = TableStats.histogram(df, "v", nBuckets = 10)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (0L to 9L))
    // 0..99 uniform over [0,100] → 10 per bucket, plus v=100 clamped last
    assert(got.map(_._4) == Seq(10L, 10L, 10L, 10L, 10L, 10L, 10L, 10L,
      10L, 11L))
    assert(got.head._2 == 0.0 && got.last._3 == 100.0)
  }

  test("histogram: constant column collapses to bucket 0; empty buckets " +
       "report zero") {
    val got = TableStats.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 4)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._4) == Seq(3L, 0L, 0L, 0L))
  }

  test("fileStats reports per-table file counts and flags small files; " +
       "hidden commit/checkpoint files are excluded; compaction shrinks " +
       "the report") {
    val base = java.nio.file.Files.createTempDirectory("graft_fstats")
    val frag = s"$base/frag"
    val tidy = s"$base/tidy"
    val df = spark.range(0, 1000).toDF("id")
    df.repartition(16).write.parquet(frag) // 16 small files + _SUCCESS
    df.coalesce(1).write.parquet(tidy)
    val got = TableStats.fileStats(spark, Seq(frag, tidy, s"$base/nope"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val (_, nF, totF, avgF, minF, maxF, smallF) = got(frag)
    assert(nF == 16 && smallF == 16) // every fragment is < 32 MiB
    assert(totF > 0 && avgF == totF / 16 && minF > 0 && maxF >= minF)
    assert(got(tidy)._2 == 1)
    // a missing path reports zeros rather than failing the whole sweep
    assert(got(s"$base/nope")._2 == 0)
    // after compaction the same report shows the need is gone
    assert(got(frag)._2 > got(tidy)._2)
  }

  test("fileStats hides whole HIDDEN SUBTREES like a Spark scan does, " +
       "but keeps `=`-bearing partition dirs with a _ prefix") {
    val base = java.nio.file.Files.createTempDirectory("graft_fstats2")
    def put(rel: String): Unit = {
      val p = base.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, "x".getBytes)
    }
    put("t/part-0.parquet")                 // visible
    put("t/.checkpoints/part-1.parquet")    // hidden dir → invisible
    put("t/_staging/deep/part-2.parquet")   // hidden dir, nested file
    put("t/_gbucket=3/part-3.parquet")      // partition dir → visible
    put("t/_SUCCESS")                       // hidden leaf
    val got = TableStats.fileStats(spark, Seq(s"$base/t"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._2 == 2, got) // part-0 + the _gbucket=3 file only
  }

  test("fast path stays inside whole-stage codegen (no md5 in the plan)") {
    val df = spark.range(1, 101).toDF("v")
    val fastPlan = TableStats.columnStatsFast(df, Seq("v")).queryExecution
      .executedPlan.toString
    assert(!fastPlan.contains("md5"), fastPlan)
    assert(fastPlan.contains("xxhash64"), fastPlan)
  }
}
