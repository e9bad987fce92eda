package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, …))` — evaluates its
  * lambda per element in the interpreter (higher-order functions don't
  * participate in whole-stage codegen), which costs ~100 ns/element; over a
  * near-dup pair join (pairs × dims) that dominates the query. This
  * expression compiles to a tight Java loop inside the surrounding
  * WholeStageCodegen stage instead: measured ~20× faster on the
  * embedding near-dup benchmark at sf0.1.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_long_dot"
}

/** Registration for graft's native expressions.
  *
  * Preferred route: `spark.sql.extensions=graft.expressions.GraftExtensions`
  * (injectFunction). [[GraftFunctions.register]] is the runtime fallback for
  * sessions created without the conf (e.g. the driver harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.longDotDescriptor)
}

object GraftFunctions {
  val longDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_long_dot"),
      (children: Seq[Expression]) => LongDot(children.head, children(1)))

  /** Idempotent session-level registration. */
  def register(spark: SparkSession): Unit = {
    val (fid, info, builder) = longDotDescriptor
    if (!spark.sessionState.functionRegistry.functionExists(fid)) {
      spark.sessionState.functionRegistry.registerFunction(fid, info, builder)
    }
  }
}
