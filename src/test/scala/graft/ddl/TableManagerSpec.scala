package graft.ddl

import graft.SparkSpec
import graft.types.ColumnMeta

class TableManagerSpec extends SparkSpec {

  test("create-from-metadata and drop round-trip through the catalog") {
    val metas = Seq(
      ColumnMeta("AccountingEntity", "string", maxLength = Some(25)),
      ColumnMeta("TransactionAmount", "number"),
      ColumnMeta("PostingDate", "string", format = Some("date-time")))
    TableManager.dropIfExists(spark, "graft_test_tbl")
    TableManager.createFromMetadata(spark, "graft_test_tbl", metas)
    assert(spark.catalog.tableExists("graft_test_tbl"))
    val cols = spark.table("graft_test_tbl").schema
    assert(cols("TransactionAmount").dataType.typeName == "double")
    assert(cols("PostingDate").dataType.typeName == "timestamp")
    TableManager.dropIfExists(spark, "graft_test_tbl")
    assert(!spark.catalog.tableExists("graft_test_tbl"))
  }

  test("reference naming rules") {
    assert(TableManager.warehouseTableName("luma_dl_gl_transaction_detail") ==
      "luma_gl_transaction_detail")
    assert(TableManager.mergeProcName("luma_dl_gl_transaction_detail") ==
      "gl_transaction_detail_proc")
    assert(TableManager.columnDdl(ColumnMeta("Status", "string",
      enumValues = Some(Seq("A", "B")))) == "[Status] varchar(120) NULL")
  }
}
