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
