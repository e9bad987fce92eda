package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Irreconcilable type conflict during inference (≙ reference raising on
  * e.g. bool vs quoted "TRUE" — bq.py:302-318, test_bq.py:353-359). */
final class InferenceConflictException(msg: String) extends RuntimeException(msg)

/** JSON-record schema inference reproducing the reference's
  * bigquery-schema-generator semantics (bq.py:302-318):
  *
  *   - `keep_nulls=True`: fields seen only as null keep a (string) column;
  *   - `quoted_values_are_strings=True`: "123"/"TRUE" stay strings — a
  *     quoted value never unifies with a native number/bool (conflict);
  *   - `preserve_input_sort_order=True`: field order = first-seen order;
  *   - nested objects → StructType with recursive field union
  *     (test_bq.py:211-249); arrays → ArrayType of unified element type;
  *   - int widens to double when mixed with float; any other cross-kind
  *     mix raises [[InferenceConflictException]].
  *
  * Spark's own `spark.read.json` inference differs on every one of those
  * points (it coerces conflicts to StringType, sorts fields, widens
  * aggressively), hence this bespoke sampler. It runs driver-side over a
  * sample: at 100 TB you infer from a bounded sample (e.g. first N records
  * per file via `limit`), never the full corpus, then enforce the frozen
  * schema on the distributed read — which is exactly the reference's
  * create-then-strict-insert flow.
  */
object SchemaInference {

  private val mapper = new ObjectMapper()

  /** Internal inferred type lattice. */
  private sealed trait T
  private case object TNull extends T
  private case object TLong extends T
  private case object TDouble extends T
  private case object TBool extends T
  private case object TString extends T
  private final case class TArr(elem: T) extends T
  /** LinkedHashMap keeps first-seen order. */
  private final case class TObj(fields: scala.collection.mutable.LinkedHashMap[String, T]) extends T

  def inferFromJson(records: Seq[String]): StructType =
    toStruct(records.foldLeft(TObj(scala.collection.mutable.LinkedHashMap.empty[String, T])) {
      (acc, rec) => unify(acc, ofNode(mapper.readTree(rec)), "$").asInstanceOf[TObj]
    })

  private def ofNode(n: JsonNode): T = n.getNodeType match {
    case JsonNodeType.NULL | JsonNodeType.MISSING => TNull
    case JsonNodeType.BOOLEAN => TBool
    case JsonNodeType.NUMBER => if (n.isIntegralNumber) TLong else TDouble
    case JsonNodeType.STRING => TString // quoted values stay strings
    case JsonNodeType.ARRAY =>
      TArr(n.elements().asScala.map(ofNode).foldLeft(TNull: T)((a, b) => unify(a, b, "[]")))
    case JsonNodeType.OBJECT =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, T]
      n.fields().asScala.foreach(e => m += e.getKey -> ofNode(e.getValue))
      TObj(m)
    case other => throw new InferenceConflictException(s"unsupported JSON node: $other")
  }

  private def unify(a: T, b: T, path: String): T = (a, b) match {
    case (TNull, x) => x
    case (x, TNull) => x
    case (x, y) if x == y => x
    case (TLong, TDouble) | (TDouble, TLong) => TDouble
    case (TObj(fa), TObj(fb)) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, T]
      fa.foreach { case (k, v) => m += k -> v }
      fb.foreach { case (k, v) =>
        m += k -> (if (m.contains(k)) unify(m(k), v, s"$path.$k") else v)
      }
      TObj(m)
    case (TArr(ea), TArr(eb)) => TArr(unify(ea, eb, s"$path[]"))
    case (x, y) =>
      throw new InferenceConflictException(s"conflicting types at $path: $x vs $y")
  }

  private def toDataType(t: T): DataType = t match {
    case TNull | TString => StringType // keep_nulls: null-only → STRING
    case TLong => LongType
    case TDouble => DoubleType
    case TBool => BooleanType
    case TArr(e) => ArrayType(toDataType(e), containsNull = true)
    case o: TObj => toStruct(o)
  }

  private def toStruct(o: TObj): StructType =
    StructType(o.fields.map { case (k, v) =>
      StructField(k, toDataType(v), nullable = true) // all NULLABLE, ≙ fixture A1
    }.toSeq)
}
