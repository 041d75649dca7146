package graft.ddl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.types.{ColumnMeta, MetadataCatalog}

/** Catalog DDL operators (SURVEY.md §2.9): create-from-metadata (D1),
  * drop-if-exists (D2), column DDL fragments (D3). The reference generates
  * MSSQL DDL strings (`db/sql.py:7-30`) and round-trips them over ODBC; here
  * the catalog is Spark's, and the MSSQL DDL remains available from
  * MetadataCatalog for JDBC sink provisioning.
  */
object TableManager {

  /** D1: create a managed table from ION JSON-Schema metadata. */
  def createFromMetadata(spark: SparkSession, table: String,
                         metas: Seq[ColumnMeta]): Unit =
    createFromSchema(spark, table, MetadataCatalog.toStructType(metas))

  def createFromSchema(spark: SparkSession, table: String,
                       schema: StructType): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table (${schema.toDDL}) USING parquet")

  /** D2. */
  def dropIfExists(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** D3: one column's sink DDL fragment. */
  def columnDdl(meta: ColumnMeta): String =
    s"[${meta.name}] ${MetadataCatalog.mssqlType(meta)} NULL"

  /** ANSI-standard JDBC type for a Spark type — the ADD COLUMN
    * vocabulary drift evolution needs. Derby and Postgres accept these
    * verbatim (the live q180 gate runs against Derby). MSSQL does NOT:
    * it has no BOOLEAN/DOUBLE (BIT/FLOAT) and its ALTER syntax omits
    * the COLUMN keyword — an MSSQL deployment maps through
    * [[graft.types.MetadataCatalog.mssqlType]] and its own ALTER
    * template instead of this vocabulary. */
  def jdbcType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case StringType => "VARCHAR(4000)"
      case other => throw new IllegalArgumentException(
        s"jdbcType: no ADD COLUMN mapping for ${other.simpleString}")
    }
  }

  /** Reference naming rules (`utilities/helpers/table_generator.py:52-56`):
    * warehouse table = staging minus `_dl`; merge proc name = staging minus
    * `luma_dl_` plus `_proc`. */
  def warehouseTableName(stagingTable: String): String =
    stagingTable.replace("_dl", "")

  def mergeProcName(stagingTable: String): String =
    stagingTable.replace("luma_dl_", "") + "_proc"
}
