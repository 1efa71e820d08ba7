package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer-vector dot product over two ARRAY<BIGINT>
  * columns — the hot kernel of the whole ANN / embedding-dedup family
  * (exact quantized cosine: `dot / sqrt(na*nb)`).
  *
  * Why native: the composable spelling
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0L, (acc, v) -> acc + v)`
  * runs on Spark's higher-order-function path, which is CodegenFallback —
  * every element pays an interpreted lambda invocation AND zip_with
  * materializes the intermediate products array. This expression is one
  * fused primitive loop inside whole-stage codegen: no intermediate
  * array, no boxing, no per-element virtual calls (measured TimeQuery
  * medians at sf0.1: q_ann_multiprobe 3.38 → 2.07 s, q_isotropy 0.86 →
  * 0.60 s — the swap is value-identical, 18/18 family oracle rows green;
  * see SCALE.md round-9 notes).
  *
  * Semantics match the composed spelling exactly: BIGINT products summed
  * left-to-right into a BIGINT (exact for the quantized |q| ≤ ~10⁴,
  * 64-dim vectors — order-free), mismatched lengths or any null element
  * yield NULL (zip_with pads with null and `acc + null` is null).
  * Registered in SQL as `ivec_dot` via [[GraftExtensions]].
  */
case class IntVecDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ivec_dot expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "ivec_dot"

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
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |boolean $bad = ($n != $b.numElements());
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
