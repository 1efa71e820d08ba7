package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Generator (the UDTF extension tier): emits the sampled
  * char k-grams of a string — one output row per shingle position, the
  * row-generating shape `explode(transform(sequence(...)))` spells as
  * three nested expressions. A Generator plans as a single GenerateExec
  * with no intermediate array materialization: the per-row output arrays
  * the HOF spelling allocates (length/stride elements each) never exist.
  *
  * Strings shorter than k produce no rows (same contract as the dedup
  * pipeline's `WHERE length(text) >= k`). Position arithmetic is by
  * CODEPOINT (matching Spark's `substring`/`length` SQL semantics and the
  * DuckDB oracle), so non-BMP text cannot diverge and surrogate pairs are
  * never split. Registered in SQL as
  * `char_shingles(text, k, stride)` via [[GraftExtensions]] (k, stride
  * must be INT literals). CodegenFallback: Generate nodes sit at
  * whole-stage-codegen boundaries anyway, so the fallback costs one
  * virtual call per input row, not a broken pipeline.
  */
case class ShingleGenerator(child: Expression, k: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0 && stride > 0, s"char_shingles: k=$k, stride=$stride must be > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects STRING, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    StructType(StructField("sh", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val s = t.asInstanceOf[UTF8String].toString
      // codepoint start offsets (identity on ASCII, surrogate-safe beyond)
      val off = {
        val b = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
        var ci = 0
        while (ci < s.length) { b += ci; ci += Character.charCount(s.codePointAt(ci)) }
        b += s.length
        b
      }
      val ncp = off.length - 1
      if (ncp < k) Nil
      else (0 to ncp - k by stride).iterator.map(i =>
        InternalRow(UTF8String.fromString(s.substring(off(i), off(i + k)))))
    }
  }

  override def prettyName: String = "char_shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
