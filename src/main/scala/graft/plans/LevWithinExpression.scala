package graft.plans

import graft.functions.BoundedLev
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd bounded edit distance `lev_within(a, b)` with compile-time
  * bound `k`: exact levenshtein when ≤ k, else k+1 (see
  * [[graft.functions.BoundedLev]] for the banded algorithm). The built-in
  * `levenshtein` computes the full O(n·m) DP even when the caller only
  * thresholds the result — in a candidates→verify fuzzy join the verify
  * predicate is the hot loop, so the band matters at vocabulary scale. */
case class LevWithinExpression(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev_within expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_within"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BoundedLev.within(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BoundedLev.within($a.toString(), $b.toString(), $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
