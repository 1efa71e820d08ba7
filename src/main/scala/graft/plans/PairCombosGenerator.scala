package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** All C(n,2) index-ordered element pairs of an ARRAY<BIGINT>, as a
  * native Catalyst Generator: for input a of length n, emits one row
  * (p = a(i), q = a(j)) per 0 <= i < j < n. Pass a `sort_array`'d input
  * to get value-ordered (p < q) pairs.
  *
  * This is the wedge-enumeration primitive for common-neighbor scores
  * (Adamic-Adar, q_adamic_adar): per center vertex z, the neighbor pairs
  * ARE the wedges through z. The round-11 shape self-joined the
  * weighted adjacency on z with a p < q filter — a sort-merge join that
  * shuffles the adjacency TWICE and streams deg(z)² joined rows per
  * center before the filter keeps C(deg,2) of them (~4× the honest
  * wedge volume through the join, plus a separate degree build with two
  * more joins). Collecting each center's neighbor list (ONE shuffle —
  * degrees are basket-capped per the partEdges contract, so lists are
  * small) and generating pairs inline emits exactly the wedge volume,
  * which is the algorithm's true output size at any scale.
  *
  * Emission is a LAZY iterator — C(deg,2) rows are streamed into the
  * consuming pipeline, never materialized per input row. CodegenFallback:
  * Generate nodes sit at whole-stage-codegen boundaries anyway (same
  * trade as [[ShingleGenerator]]/[[WinnowGenerator]]).
  *
  * Registered in SQL as `pair_combos(arr)` via [[GraftExtensions]].
  */
case class PairCombosGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combos expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(
    StructField("p", LongType, nullable = false) ::
    StructField("q", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) return Nil
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { vals(i) = arr.getLong(i); i += 1 }
    new Iterator[InternalRow] {
      private var ii = 0
      private var jj = 1
      override def hasNext: Boolean = ii < n - 1
      override def next(): InternalRow = {
        // fresh row per emission: downstream operators may buffer
        val r = InternalRow(vals(ii), vals(jj))
        jj += 1
        if (jj >= n) { ii += 1; jj = ii + 1 }
        r
      }
    }
  }

  override def prettyName: String = "pair_combos"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
