package graft.plans

import graft.functions.EncodeWord
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference `encode`
  * (`WorkerSender.java:129-148`) — the codegen'd alternative to the boxed
  * Scala UDF in [[graft.functions.EncodeWord]]: participates in whole-stage
  * codegen (no UDF serialization, no Row boxing), which is the preferred
  * extension tier for hot-path scalar functions (SURVEY.md §7).
  */
case class EncodeWordExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"encode_word expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "encode_word"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      EncodeWord.encode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.EncodeWord.encode($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
