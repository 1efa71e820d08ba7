package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting is the
  * deterministic fallback when one key dominates so heavily that a single
  * post-split partition still overflows — the classic 100 TB failure mode.
  */
object Skew {

  /** Salted equi-join on a shared key column `key`: the left side is split
    * into `numSalts` sub-partitions by a deterministic hash of
    * `leftSaltSrc` (pick a high-cardinality column, e.g. the row id), and
    * the right side is replicated once per salt, so a hot key's rows fan
    * out over `numSalts` reducers instead of one. Result is row-identical
    * to `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 numSalts: Int, leftSaltSrc: Column): DataFrame = {
    require(numSalts > 0)
    val l = left.withColumn("__salt", pmod(hash(leftSaltSrc), lit(numSalts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
