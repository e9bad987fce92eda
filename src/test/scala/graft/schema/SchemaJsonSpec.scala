package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaJsonSpec extends SparkSpec {

  private val jsonRepr =
    """[{"name":"id","type":"INTEGER","mode":"REQUIRED"},
      |{"name":"name","type":"STRING","mode":"NULLABLE"},
      |{"name":"tags","type":"STRING","mode":"REPEATED"},
      |{"name":"meta","type":"RECORD","mode":"NULLABLE","fields":[
      |  {"name":"ok","type":"BOOLEAN"},
      |  {"name":"score","type":"FLOAT","mode":"NULLABLE"}]}]""".stripMargin

  private val structRepr = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("meta", StructType(Seq(
      StructField("ok", BooleanType, nullable = true),
      StructField("score", DoubleType, nullable = true))), nullable = true)))

  test("fromJson maps the reference field repr to StructType (≙ bq.py:263-273)") {
    assert(SchemaJson.fromJson(jsonRepr) == structRepr)
  }

  test("toJson → fromJson round-trips") {
    assert(SchemaJson.fromJson(SchemaJson.toJson(structRepr)) == structRepr)
  }

  test("missing mode defaults to NULLABLE; unsupported type raises") {
    val s = SchemaJson.fromJson("""[{"name":"x","type":"DATE"}]""")
    assert(s.head == StructField("x", DateType, nullable = true))
    intercept[IllegalArgumentException] {
      SchemaJson.fromJson("""[{"name":"x","type":"GEOGRAPHY"}]""")
    }
  }

  test("NUMERIC maps to DECIMAL(38,9); TIMESTAMP and BYTES map natively") {
    val s = SchemaJson.fromJson(
      """[{"name":"a","type":"NUMERIC"},{"name":"b","type":"TIMESTAMP"},
        |{"name":"c","type":"BYTES"}]""".stripMargin)
    assert(s("a").dataType == DecimalType(38, 9))
    assert(s("b").dataType == TimestampType)
    assert(s("c").dataType == BinaryType)
  }
}
