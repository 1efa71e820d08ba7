package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen'd Hilbert-curve index of the low 16 bits of two INT
  * columns — the stronger sibling of [[InterleaveBitsExpression]] for
  * multi-dimensional file layout: the Hilbert curve visits every cell of
  * the 2¹⁶×2¹⁶ grid with EVERY step adjacent (Morton's Z jumps across the
  * plane at quadrant seams), so sorting by it keeps per-file min/max
  * ranges of both columns strictly tighter on average. Standard xy→d
  * transform (Hilbert 1891; iterative quadrant-rotation formulation):
  * 16 rounds of rotate-and-accumulate, branch-free enough to inline in
  * whole-stage codegen. Registered in SQL as `hilbert_index` via
  * [[GraftExtensions]].
  */
case class HilbertExpression(left: Expression, right: Expression,
                             order: Int = 16)
    extends BinaryExpression {

  require(order >= 1 && order <= 16, s"order must be in [1, 16], got $order")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (INT, INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(x.asInstanceOf[Int], y.asInstanceOf[Int], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Hilbert.xy2d($a, $b, $order)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {
  /** Hilbert d-index of (x, y) over the low `order` bits of each input
    * (a 2·order-bit curve position). Top-down quadrant walk: at scale s the
    * quadrant (rx, ry) contributes s²·((3·rx) XOR ry) curve cells, then
    * the frame rotates/reflects so the child quadrant is re-oriented. */
  def xy2d(x0: Int, y0: Int, order: Int): Long = {
    val n = 1 << order
    val mask = n - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate/reflect so the child quadrant's sub-curve is upright
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
