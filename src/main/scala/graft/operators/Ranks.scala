package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed within-key ranking WITHOUT a per-key window sort: the
  * building block under [[Percentiles]] (exact selection) and the mixture
  * sampler — anywhere a "row_number() over (partition by key order by …)"
  * would put a whole (possibly huge) key on one task.
  *
  * Shape: range-partition by (key, orderCols) so a big key SPANS
  * partitions; per-(partition, key) chunk counts (≤ parts × |keys| rows —
  * metadata) prefix-sum into chunk offsets over that tiny table; global
  * rank = offset + row_number within the bounded chunk. The range
  * Exchange feeds both branches and is deduplicated by ReuseExchange, so
  * the data shuffles once (plus the (pid, key) hash Exchange for the
  * chunk-local window).
  *
  * == High-cardinality-key guard ==
  * The offsets table is parts × |distinct keys| rows. For the operator's
  * current callers (percentile keys, languages, cluster ids) that is tiny
  * and a broadcast join is ideal — but as a GENERAL primitive a
  * high-cardinality key would make a forced broadcast an executor/driver
  * memory bomb. `graft.ranks.offsetsBroadcast` picks the join strategy:
  *
  *  - `auto` (default): NO static hint — AQE measures the offsets
  *    aggregate at runtime and broadcasts iff it fits
  *    `spark.sql.adaptive.autoBroadcastJoinThreshold`; past that it falls
  *    back to a shuffled join. The fallback is cheap by construction: the
  *    data side is ALREADY hash-partitioned and sorted by (pid, key) for
  *    the chunk-local window, so only the offsets (metadata) side gets a
  *    new Exchange.
  *  - `force`: always hint `broadcast(offs)` (the pre-round-5 behavior —
  *    for callers that KNOW the key is low-cardinality and want the plan
  *    pinned without AQE stats).
  *  - `off`: force a non-broadcast join (`merge` hint) — for tests and
  *    for deployments where the offsets side is known-huge.
  */
object Ranks {

  val OffsetsBroadcastConf = "graft.ranks.offsetsBroadcast"

  /** Adds a 1-based `rk` column: the rank of each row within its
    * `keyCol` group under the total order `orderCols` (pass a unique
    * tie-breaker as the last order column — ranks of exact ties are
    * otherwise partition-dependent). */
  def withinKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
                parts: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val ordCols = orderCols.map(col)
    val parted = df.repartitionByRange(parts, (col(keyCol) +: ordCols): _*)
      .withColumn("__pid", spark_partition_id())
    val offs = parted.groupBy("__pid", keyCol).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        sum(col("__c")).over(Window.partitionBy(keyCol).orderBy("__pid"))
          - col("__c"))
      .drop("__c")
    parted
      .withColumn("__lrk", row_number().over(
        Window.partitionBy(col("__pid"), col(keyCol)).orderBy(ordCols: _*)))
      .join(maybeBroadcast(offs), Seq("__pid", keyCol))
      .withColumn("rk", col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }

  /** Apply the [[OffsetsBroadcastConf]] policy to a small-by-construction
    * metadata side of a join (shared with [[Percentiles]]'s rank list). */
  private[operators] def maybeBroadcast(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(OffsetsBroadcastConf, "auto") match {
      case "force" => broadcast(df)
      case "off"   => df.hint("merge")
      case _       => df // AQE sizes the aggregate at runtime
    }
}
