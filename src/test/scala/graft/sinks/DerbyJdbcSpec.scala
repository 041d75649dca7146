package graft.sinks

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** LIVE JDBC round-trip for K3/K4/S12 against embedded Derby (on the Spark
  * classpath): chunked batch insert, truncate-then-load preserving DDL,
  * schema introspection, and per-column RCA isolating a poisoned column
  * through a real JDBC failure. */
class DerbyJdbcSpec extends SparkSpec {
  import spark.implicits._

  val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("write → introspect → read-back equality (K3 + S12)") {
    val df = (1 to 137).map(i => (i.toLong, s"name$i", i * 1.5))
      .toDF("k", "v", "amt")
    // batchSize below the row count so batching is actually exercised
    Sinks.jdbcLoad(df, url, "roundtrip", SaveMode.Overwrite, batchSize = 25)
    val schema = Sinks.jdbcIntrospect(spark, url, "roundtrip")
    assert(schema.fieldNames.map(_.toLowerCase).toSeq == Seq("k", "v", "amt"))
    assert(schema("k").dataType == LongType)
    assert(schema("amt").dataType == DoubleType)
    val back = spark.read.jdbc(url, "roundtrip", new java.util.Properties())
      .select($"k", $"v", $"amt").as[(Long, String, Double)].collect().toSet
    assert(back == df.as[(Long, String, Double)].collect().toSet)
  }

  test("truncate-then-load keeps the table's DDL (K4)") {
    val first = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.jdbcLoad(first, url, "trunc_load", SaveMode.Overwrite)
    val before = Sinks.jdbcIntrospect(spark, url, "trunc_load")
    // reload with fewer rows; truncate mode must not drop/recreate
    Sinks.jdbcLoad(Seq((9L, "z")).toDF("k", "v"), url, "trunc_load",
      SaveMode.Overwrite)
    assert(Sinks.jdbcIntrospect(spark, url, "trunc_load") == before)
    val back = spark.read.jdbc(url, "trunc_load", new java.util.Properties())
      .as[(Long, String)].collect().toSeq
    assert(back == Seq((9L, "z")))
  }

  test("mssqlCompat frame survives the JDBC sink (decimals, bool text)") {
    val df = Seq((1L, Some(true), Some(2.5)), (2L, None, None))
      .toDF("k", "flag", "amt")
    Sinks.jdbcLoad(Sinks.mssqlCompat(df), url, "compat", SaveMode.Overwrite)
    val back = spark.read.jdbc(url, "compat", new java.util.Properties())
      .orderBy("k").select($"flag", $"amt".cast("string"))
      .as[(String, String)].collect().toSeq
    // sentinels landed in the database, not nulls
    assert(back == Seq(("True", "2.50"), ("", "-99.00")))
  }

  test("jdbcEvolve reconciles drift with live ALTER TABLE: new column " +
       "added once, standing rows read NULL, a SHRUNK frame loads NULL " +
       "into columns it lacks, and no-drift appends are DDL-free") {
    Sinks.jdbcLoad(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      url, "evolve_t", SaveMode.Overwrite, batchSize = 10)
    // drift: n arrives
    val added = Sinks.jdbcEvolve(
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("k", "v", "n"),
      url, "evolve_t", batchSize = 10)
    assert(added.map(_.toLowerCase) == Seq("n"))
    // no drift: append without DDL
    assert(Sinks.jdbcEvolve(Seq((5L, "e", 50L)).toDF("k", "v", "n"),
      url, "evolve_t", batchSize = 10).isEmpty)
    // a frame MISSING a column aligns with NULL (removal is never DDL'd)
    assert(Sinks.jdbcEvolve(Seq((6L, "f")).toDF("k", "v"),
      url, "evolve_t", batchSize = 10).isEmpty)
    val back = spark.read.jdbc(url, "evolve_t", new java.util.Properties())
      .select($"K".cast("long"), $"V", $"N".cast("long"))
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L)), (4L, "d", Some(40L)), (5L, "e", Some(50L)),
      (6L, "f", None)))
  }

  test("per-column RCA isolates the poisoned column via a real JDBC error (K5)") {
    // target table: 'bad' can hold at most 2 chars
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE rca_target") catch { case _: Exception => () }
      st.execute(
        "CREATE TABLE rca_target (k BIGINT, good VARCHAR(50), bad VARCHAR(2))")
      st.close()
    } finally conn.close()
    val df = Seq((1L, "fine", "way too long for varchar(2)"))
      .toDF("k", "good", "bad")
    val failures = Sinks.perColumnRca(df, Seq("k"),
      d => d.write.mode(SaveMode.Append)
        .jdbc(url, "rca_target", new java.util.Properties()))
    assert(failures.keySet == Set("bad"))
    assert(failures("bad").nonEmpty)
  }
}
