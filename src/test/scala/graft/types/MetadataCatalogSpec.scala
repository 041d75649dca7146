package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's type-mapping table (`metadata/types.py:14-49,
  * 70-102`; FIXTURES.md §3). */
class MetadataCatalogSpec extends AnyFunSuite {

  val metaJson: String =
    """{
      |  "GLTransactionDetail":  {"type": "integer", "description": "d"},
      |  "AccountingEntity":     {"type": "string", "maxLength": 25},
      |  "TransactionAmount":    {"type": "number"},
      |  "PostingDate":          {"type": "string", "format": "date-time"},
      |  "Status":               {"type": "string", "enum": ["Posted", "Pending"]},
      |  "APPaid":               {"type": "boolean"},
      |  "Description":          {"type": "string"},
      |  "DrillBackLink":        {"type": "string", "maxLength": 9000}
      |}""".stripMargin

  lazy val metas: Seq[ColumnMeta] = MetadataCatalog.fromJson(metaJson)
  def meta(n: String): ColumnMeta = metas.find(_.name == n).get

  test("parses all properties with attributes") {
    assert(metas.size == 8)
    assert(meta("AccountingEntity").maxLength.contains(25))
    assert(meta("Status").enumValues.contains(Seq("Posted", "Pending")))
    assert(meta("PostingDate").format.contains("date-time"))
  }

  test("mssql types reproduce types.py rules") {
    assert(MetadataCatalog.mssqlType(meta("AccountingEntity")) == "varchar(25)")
    assert(MetadataCatalog.mssqlType(meta("Description")) == "varchar(MAX)")
    assert(MetadataCatalog.mssqlType(meta("DrillBackLink")) == "varchar(MAX)") // >8000
    assert(MetadataCatalog.mssqlType(meta("Status")) == "varchar(120)") // enum
    assert(MetadataCatalog.mssqlType(meta("PostingDate")) == "datetime2")
    assert(MetadataCatalog.mssqlType(meta("APPaid")) == "varchar(5)") // bool as text
    assert(MetadataCatalog.mssqlType(meta("GLTransactionDetail")) == "int")
    assert(MetadataCatalog.mssqlType(meta("TransactionAmount")) == "decimal(18,2)")
  }

  test("spark types stay native in flight") {
    assert(MetadataCatalog.sparkType(meta("PostingDate")) == TimestampType)
    assert(MetadataCatalog.sparkType(meta("APPaid")) == BooleanType)
    assert(MetadataCatalog.sparkType(meta("TransactionAmount")) == DoubleType)
    assert(MetadataCatalog.sparkType(meta("GLTransactionDetail")) == LongType)
    assert(MetadataCatalog.sparkType(meta("AccountingEntity")) == StringType)
  }

  test("varchar boundary: exactly 8000 stays sized, 8001 promotes to MAX") {
    // types.py:78-84 — the 8000-byte SQL Server varchar ceiling
    assert(MetadataCatalog.mssqlType(
      ColumnMeta("a", "string", maxLength = Some(8000))) == "varchar(8000)")
    assert(MetadataCatalog.mssqlType(
      ColumnMeta("a", "string", maxLength = Some(8001))) == "varchar(MAX)")
    // date (not just date-time) format is temporal too (types.py:66-67)
    assert(MetadataCatalog.mssqlType(
      ColumnMeta("a", "string", format = Some("date"))) == "datetime2")
    // unknown json type degrades to varchar(MAX), never throws
    assert(MetadataCatalog.mssqlType(ColumnMeta("a", "array")) == "varchar(MAX)")
  }

  test("createTableDdl emits the exact reference DDL shape (db/sql.py:7-22)") {
    val ddl = MetadataCatalog.createTableDdl("t", Seq(
      ColumnMeta("Amount", "number"), ColumnMeta("Flag", "boolean")))
    assert(ddl ==
      """CREATE TABLE [t] (
        |  [id] int IDENTITY(1,1),
        |  [Amount] decimal(18,2) NULL,
        |  [Flag] varchar(5) NULL
        |)""".stripMargin)
  }

  test("struct type and DDL include every column plus identity key") {
    val st = MetadataCatalog.toStructType(metas)
    assert(st.fieldNames.toSeq == metas.map(_.name))
    val ddl = MetadataCatalog.createTableDdl("luma_dl_gl", metas)
    assert(ddl.startsWith("CREATE TABLE [luma_dl_gl]"))
    assert(ddl.contains("[id] int IDENTITY(1,1)"))
    assert(ddl.contains("[AccountingEntity] varchar(25) NULL"))
  }
}
