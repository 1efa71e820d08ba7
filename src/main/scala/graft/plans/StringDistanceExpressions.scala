package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd `jaro_winkler(a, b)` — DuckDB-bit-compatible Jaro-Winkler
  * similarity (see [[graft.functions.StringDistances]] for the pinned
  * conventions). Spark has no built-in; the nearest native alternatives
  * (`levenshtein`, soundex) answer different questions. Fuzzy-alignment
  * queries threshold this value in the hot loop, so it stays inside
  * whole-stage codegen rather than a deserializing UDF. */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringDistances.jaroWinkler(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistances.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd `damerau_lev(a, b)` — FULL (unrestricted) Damerau-Levenshtein
  * distance, DuckDB-bit-compatible (`damerau_lev('ca','abc') = 2`; the
  * common optimal-string-alignment restriction would answer 3). Spark's
  * built-in `levenshtein` has no transposition edit, which makes
  * adjacent-char swaps — the dominant human typo class — cost 2 and fall
  * outside a distance-1 candidate net. */
case class DamerauLevExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_lev expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_lev"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringDistances.damerauLev(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistances.damerauLev($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
