package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaInferenceSpec extends SparkSpec {

  test("golden fixture A1: heterogeneous nested records, first-seen order, all nullable") {
    val records = Seq(
      """{"id": 1}""",
      """{"id": 2, "json_col": {"col1": 1}}""",
      """{"id": 3, "json_col": {"col2": true}}""",
      """{"json_col": {"col3": "abc"}}""")
    val expected = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("json_col", StructType(Seq(
        StructField("col1", LongType, nullable = true),
        StructField("col2", BooleanType, nullable = true),
        StructField("col3", StringType, nullable = true))), nullable = true)))
    assert(SchemaInference.inferFromJson(records) == expected)
  }

  test("conflict: bool vs quoted string raises (≙ test_bq.py:353-359)") {
    intercept[InferenceConflictException] {
      SchemaInference.inferFromJson(Seq("""{"a": true}""", """{"a": "TRUE"}"""))
    }
  }

  test("quoted numbers stay strings; never unify with native ints") {
    intercept[InferenceConflictException] {
      SchemaInference.inferFromJson(Seq("""{"a": 1}""", """{"a": "2"}"""))
    }
  }

  test("int widens to double when mixed with float") {
    val s = SchemaInference.inferFromJson(Seq("""{"x": 1}""", """{"x": 1.5}"""))
    assert(s == StructType(Seq(StructField("x", DoubleType, nullable = true))))
  }

  test("keep_nulls: null-only field kept as string column") {
    val s = SchemaInference.inferFromJson(Seq("""{"a": null}""", """{"a": null}"""))
    assert(s == StructType(Seq(StructField("a", StringType, nullable = true))))
  }

  test("arrays unify element types (REPEATED mode)") {
    val s = SchemaInference.inferFromJson(Seq("""{"xs": [1, 2]}""", """{"xs": [3]}"""))
    assert(s == StructType(Seq(
      StructField("xs", ArrayType(LongType, containsNull = true), nullable = true))))
  }

  test("field order is first-seen across records") {
    val s = SchemaInference.inferFromJson(Seq("""{"b": 1}""", """{"a": 2, "b": 3}"""))
    assert(s.fieldNames.toSeq == Seq("b", "a"))
  }
}
