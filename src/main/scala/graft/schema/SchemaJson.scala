package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Codec between the reference's JSON schema representation and Spark
  * StructType (≙ get_schema_from_json, bq.py:263-273; field repr
  * `{name, type, mode, fields}` with modes NULLABLE/REQUIRED/REPEATED).
  *
  * Type mapping per SURVEY.md §1: INTEGER→LONG, FLOAT/FLOAT64→DOUBLE,
  * NUMERIC→DECIMAL(38,9), RECORD→STRUCT, REPEATED mode→ARRAY of the
  * field type.
  */
object SchemaJson {

  private val mapper = new ObjectMapper()

  private val typeMap: Map[String, DataType] = Map(
    "STRING" -> StringType,
    "INTEGER" -> LongType, "INT64" -> LongType,
    "FLOAT" -> DoubleType, "FLOAT64" -> DoubleType,
    "BOOLEAN" -> BooleanType, "BOOL" -> BooleanType,
    "TIMESTAMP" -> TimestampType,
    "DATE" -> DateType,
    "BYTES" -> BinaryType,
    "NUMERIC" -> DecimalType(38, 9))

  def fromJson(json: String): StructType = {
    val root = mapper.readTree(json)
    require(root.isArray, "schema JSON must be an array of field objects")
    StructType(root.elements().asScala.map(field).toSeq)
  }

  private def field(n: JsonNode): StructField = {
    val name = n.get("name").asText()
    val typ = n.get("type").asText().toUpperCase
    val mode = Option(n.get("mode")).map(_.asText().toUpperCase).getOrElse("NULLABLE")
    val base: DataType =
      if (typ == "RECORD" || typ == "STRUCT")
        StructType(n.get("fields").elements().asScala.map(field).toSeq)
      else typeMap.getOrElse(typ,
        throw new IllegalArgumentException(s"unsupported type $typ for field $name"))
    mode match {
      case "REPEATED" => StructField(name, ArrayType(base, containsNull = true), nullable = true)
      case "REQUIRED" => StructField(name, base, nullable = false)
      case _ => StructField(name, base, nullable = true)
    }
  }

  def toJson(schema: StructType): String = {
    def one(f: StructField): String = {
      val (typ, mode, inner) = f.dataType match {
        case ArrayType(e, _) => (typeName(e), "REPEATED", fieldsOf(e))
        case dt => (typeName(dt), if (f.nullable) "NULLABLE" else "REQUIRED", fieldsOf(dt))
      }
      val fieldsPart = inner.map(fs => s""","fields":[${fs.map(one).mkString(",")}]""").getOrElse("")
      s"""{"name":"${f.name}","type":"$typ","mode":"$mode"$fieldsPart}"""
    }
    s"[${schema.fields.map(one).mkString(",")}]"
  }

  private def typeName(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType | IntegerType | ShortType => "INTEGER"
    case DoubleType | FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BYTES"
    case _: DecimalType => "NUMERIC"
    case _: StructType => "RECORD"
    case other => throw new IllegalArgumentException(s"unsupported Spark type $other")
  }

  private def fieldsOf(dt: DataType): Option[Seq[StructField]] = dt match {
    case s: StructType => Some(s.fields.toSeq)
    case _ => None
  }
}
