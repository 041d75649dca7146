package graft.types

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** One column's ION JSON-Schema metadata.
  *
  * Shape per reference `metadata/datalakemetadata.py:33-36` (the catalog's
  * `schema.properties` map) and `metadata/types.py:8-11`.
  */
final case class ColumnMeta(
    name: String,
    jsonType: String,
    maxLength: Option[Int] = None,
    format: Option[String] = None,
    enumValues: Option[Seq[String]] = None,
    description: Option[String] = None) {

  /** Is this a date/datetime column? (reference `metadata/types.py:66-67`:
    * a string with any `format` is treated as temporal). */
  def isTemporal: Boolean = jsonType == "string" && format.isDefined
}

/** Metadata-driven typing: ION JSON-Schema properties → Spark `StructType`
  * (in-flight) and SQL Server DDL types (at the sink).
  *
  * Reference semantics (`metadata/types.py:14-49, 70-102`):
  *   - string + maxLength n → varchar(n); no maxLength → varchar(MAX);
  *     maxLength > 8000 → varchar(MAX); enum → varchar(120)
  *   - string + format date/date-time → datetime2 / TimestampType
  *   - boolean → varchar(5) at the sink (booleans stored as text!) but kept
  *     native BooleanType in flight
  *   - integer → int; number → decimal(18,2) at sink, DoubleType in flight
  * Every created table gets an `[id] int IDENTITY(1,1)` surrogate key
  * (reference `db/sql.py:10`).
  */
object MetadataCatalog {

  private val mapper = new ObjectMapper()

  /** Parse a `{bc}_metadata.json` properties document into column metas.
    * Input is the JSON object mapping column name → JSON-Schema property. */
  def fromJson(json: String): Seq[ColumnMeta] = {
    val root = mapper.readTree(json)
    root.properties().asScala.toSeq.map { e =>
      val (name, node) = (e.getKey, e.getValue)
      ColumnMeta(
        name = name,
        jsonType = opt(node, "type").map(_.asText).getOrElse("string"),
        maxLength = opt(node, "maxLength").map(_.asInt),
        format = opt(node, "format").map(_.asText),
        enumValues = opt(node, "enum").map(_.elements().asScala.map(_.asText).toSeq),
        description = opt(node, "description").map(_.asText))
    }
  }

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field))

  /** In-flight Spark type (native; sink-lossy conversions happen at write). */
  def sparkType(m: ColumnMeta): DataType = m.jsonType match {
    case "string" if m.isTemporal => TimestampType
    case "string"                 => StringType
    case "boolean"                => BooleanType
    case "integer"                => LongType
    case "number"                 => DoubleType
    case _                        => StringType
  }

  /** SQL Server sink type, reproducing `metadata/types.py:88-102` exactly. */
  def mssqlType(m: ColumnMeta): String = m.jsonType match {
    case "string" if m.isTemporal => "datetime2"
    case "string" =>
      val len = m.enumValues match {
        case Some(_) => "120"
        case None => m.maxLength match {
          case Some(n) if n > 8000 => "MAX"
          case Some(n)             => n.toString
          case None                => "MAX"
        }
      }
      s"varchar($len)"
    case "boolean" => "varchar(5)"
    case "integer" => "int"
    case "number"  => "decimal(18,2)"
    case _         => "varchar(MAX)"
  }

  def toStructType(metas: Seq[ColumnMeta]): StructType =
    StructType(metas.map(m => StructField(m.name, sparkType(m), nullable = true)))

  /** CREATE TABLE DDL with the reference's surrogate identity key
    * (`db/sql.py:7-22`). Column names are bracket-quoted like the
    * reference's SQL-safe quoting (`lambda_function.py:177-181`). */
  def createTableDdl(table: String, metas: Seq[ColumnMeta]): String = {
    val cols = "  [id] int IDENTITY(1,1)" +: metas.map(m => s"  [${m.name}] ${mssqlType(m)} NULL")
    s"CREATE TABLE [$table] (\n${cols.mkString(",\n")}\n)"
  }
}
