package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared Euclidean distance over two ARRAY<BIGINT>
  * columns — the k-means / IVF assignment kernel, the [[IntVecDotExpression]]
  * sibling for the `(x − y)²` sum (same rationale: the higher-order
  * spelling is CodegenFallback with an intermediate array; this is one
  * fused primitive loop inside whole-stage codegen).
  *
  * Semantics match `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L,
  * (acc, t) -> acc + t)` exactly: BIGINT differences squared and summed
  * (exact for quantized coordinates — order-free), mismatched lengths or
  * any null element yield NULL. Registered in SQL as `ivec_sqdist` via
  * [[GraftExtensions]].
  */
case class IntVecSqDistExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ivec_sqdist expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "ivec_sqdist"

  // ALWAYS nullable: mismatched lengths yield NULL even when both inputs
  // are non-nullable — without this override, codegen would treat isNull
  // as the constant "false" and the fallback branch could not compile
  // (observed: janino "not an rvalue" → silent interpreted fallback).
  override def nullable: Boolean = true

  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[ArrayData]
    val b = y.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |boolean $bad = ($n != $b.numElements());
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
