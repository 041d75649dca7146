package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the reference's cleansing semantics (SURVEY.md §2.3, FIXTURES.md §4
  * edge rows). */
class CleanseSpec extends SparkSpec {
  import spark.implicits._

  test("formatColName strips newlines/brackets, dots become underscores") {
    assert(Cleanse.formatColName("FinanceCodeBlock.AccountingUnit") ==
      "FinanceCodeBlock_AccountingUnit")
    assert(Cleanse.formatColName("a\nb[c]") == "abc")
  }

  test("resolveColIssues suffixes _dupe on collisions, deterministically and collision-free") {
    val resolved = Cleanse.resolveColIssues(Seq("A.B", "A_B", "c", "A_B"))
    assert(resolved == Seq("A_B", "A_B_dupe", "c", "A_B_dupe_dupe"))
    // idempotent on already-clean names
    assert(Cleanse.resolveColIssues(Seq("x", "y")) == Seq("x", "y"))
  }

  test("dropDupeColumns removes the intentionally-lossy _dupe columns") {
    val df = Seq((1, 2, 3)).toDF("a", "a_dupe", "b")
    assert(Cleanse.dropDupeColumns(df).columns.toSeq == Seq("a", "b"))
  }

  test("dropUnknownColumns keeps only metadata-known columns") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "extra")
    assert(Cleanse.dropUnknownColumns(df, Set("A", "b")).columns.toSeq == Seq("a", "b"))
  }

  test("guardAmount: date-shaped values become 0.00, bad values null, numbers parse") {
    val out = Seq("2023-10-01", "55.5", "oops").toDF("v")
      .select(Cleanse.guardAmount($"v").as("a")).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(0.0), Some(55.5), None))
  }

  test("guardUuid: malformed ids become N/A") {
    val out = Seq("a1b2c3d4-0001-4abc-9def-000000000001", "nope").toDF("v")
      .select(Cleanse.guardUuid($"v").as("u")).as[String].collect().toSeq
    assert(out == Seq("a1b2c3d4-0001-4abc-9def-000000000001", "N/A"))
  }

  test("kvExtract pulls the value of the matching key") {
    val out = Seq("A=1,IDBudgetFundType=GF,Z=9", "A=1,Z=9").toDF("v")
      .select(Cleanse.kvExtract($"v", "IDBudgetFundType").as("k"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("GF"), None))
  }

  test("sanitizeCsv strips quotes and newlines") {
    val out = Seq("a\"b\nc").toDF("v")
      .select(Cleanse.sanitizeCsv($"v").as("s")).as[String].collect().head
    assert(out == "abc")
  }

  test("coerceDatetime: bad strings become null (pandas errors=coerce)") {
    val out = Seq("2023-01-15 00:00:00", "garbage").toDF("v")
      .select(Cleanse.coerceDatetime($"v").as("t")).collect().map(r => Option(r.get(0)))
    assert(out(0).contains(Timestamp.valueOf("2023-01-15 00:00:00")))
    assert(out(1).isEmpty)
  }

  test("sentinelFill fills -99 / -99.0 / '' / 1900-01-01 by dtype") {
    val df = Seq(
      (Some(1L), Some(1.5), Some("x"), Some(Timestamp.valueOf("2023-01-01 00:00:00"))),
      (None, None, None, None)
    ).toDF("i", "d", "s", "t")
    val row = Cleanse.sentinelFill(df).orderBy($"i".desc_nulls_last).collect()(1)
    assert(row.getLong(0) == -99L)
    assert(row.getDouble(1) == -99.0)
    assert(row.getString(2) == "")
    assert(row.getTimestamp(3) == Timestamp.valueOf("1900-01-01 00:00:00"))
  }
}
