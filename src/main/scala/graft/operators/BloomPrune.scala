package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

/** Bloom-filter join pruning: when the build side is too big to broadcast
  * as a hash relation but the probe side is huge, broadcast a Bloom filter
  * of the build keys and pre-filter the probe side before the shuffle —
  * rows that can't match never enter the exchange. False positives only
  * cost wasted shuffle rows; the join itself re-checks exactly, so results
  * are identical (see JoinsSpec).
  *
  * This is the classic 100 TB semi-join reduction: a 10^9-key dimension is
  * a few hundred MB as a 1% Bloom filter vs tens of GB as a hash relation.
  */
object BloomPrune {

  /** @param expectedItems sizing for the filter; when None (the default)
    *   it is derived from `dim.count()` — one cheap count action. A fixed
    *   guess here is a silent failure mode: undersizing by 1000× pushes
    *   the realized FPP toward 1 and the "prune" degrades to a no-op
    *   (still correct, but the operator's point evaporates). */
  def preFilter(fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String,
                expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    // explicit contract: long keys only. A mistyped key column would be
    // implicitly cast under the Long-typed UDF and silently filter
    // everything out instead of erroring.
    val lt = org.apache.spark.sql.types.LongType
    require(fact.schema(factKey).dataType == lt &&
      dim.schema(dimKey).dataType == lt,
      s"BloomPrune.preFilter requires BIGINT keys; got " +
        s"$factKey: ${fact.schema(factKey).dataType.catalogString}, " +
        s"$dimKey: ${dim.schema(dimKey).dataType.catalogString}")
    val items = expectedItems.getOrElse(math.max(dim.count(), 1L))
    val bf = dim.stat.bloomFilter(dimKey, items, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    // named so plan tests (and humans reading .explain) can see the prune
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
      .withName("bloom_might_contain")
    fact.where(mightContain(col(factKey)))
  }
}
