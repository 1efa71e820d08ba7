package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen'd Morton (Z-order) interleave of the low 16 bits of two
  * INT columns: bit i of x lands at position 2i, bit i of y at 2i+1. Used
  * by [[graft.operators.ZOrder]] to lay out files so that BOTH columns'
  * per-file min/max ranges stay narrow — the multi-dimensional
  * data-skipping layout (a linear sort keeps only its leading column's
  * ranges narrow). Registered in SQL as `interleave_bits` via
  * [[GraftExtensions]].
  */
case class InterleaveBitsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects (INT, INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    InterleaveBits.morton(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.InterleaveBits.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 16 bits of v to even positions (magic-mask dilation). */
  private def spread(v: Int): Long = {
    var x = (v & 0xffff).toLong
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code over the low 16 bits of each input (a 32-bit Z value). */
  def morton(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)
}
