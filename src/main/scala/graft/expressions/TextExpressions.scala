package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition).
  *
  * Spark has no normalization builtin, and the UDF route would box every
  * row out of Tungsten. Implemented as a codegen'd unary expression
  * instead: the generated code calls one static helper, so the expression
  * stays inside the surrounding WholeStageCodegen stage.
  *
  * The helper quick-checks first — `Normalizer.isNormalized` is O(n) with
  * no allocation for already-NFC text (including all ASCII), which is the
  * overwhelming hot path of a web corpus; only strings that actually
  * contain decomposed sequences pay the normalize-and-copy.
  */
object NfcNorm {
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd expression wrapper for [[NfcNorm]] — `graft_nfc(text)`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    NfcNorm.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.NfcNorm.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
