package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Allocation-free loop over two numeric arrays (float or double elements),
  * shared by interpreted eval and generated code. */
object VecMath extends Serializable {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** dot(a, b) as a native Catalyst expression (SURVEY preference order (b):
  * custom `Expression` before UDF). The higher-order
  * `aggregate(zip_with(a, b, *), …)` formulation allocates a fresh
  * intermediate array per row — on an all-pairs similarity join that is
  * millions of boxed arrays; this loops over the unsafe array data in place
  * (bench: dd_embed_cosine 28s → see BENCH.md). Accumulates in double. */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == FloatType || a == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_dot needs two array<float> or two array<double>, " +
            s"got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (elemType == FloatType) VecMath.dotFF(x, y) else VecMath.dotDD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemType == FloatType) "dotFF" else "dotDD"
    // addReferenceObj (not a MODULE$ static path): janino resolves the
    // forwarder class, which has no MODULE$ field — a static reference there
    // failed to compile and silently dropped the whole stage to interpreted
    // eval (round-1 bench tail error).
    val ref = ctx.addReferenceObj("vecMath", VecMath, VecMath.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def dot(a: Column, b: Column): Column =
    columnOf(ArrayDot(expressionOf(a), expressionOf(b)))

  /** cosine(a, b) = dot/(|a||b|); null-safe, 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val d = dot(a, b)
    val na = sqrt(dot(a, a)); val nb = sqrt(dot(b, b))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }
}
