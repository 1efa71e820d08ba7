package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Fixed-iteration HITS (Kleinberg '99) over a directed edge list — hub
  * and authority scores as two alternating [[PageRank]]-shaped passes per
  * round: auth'(v) = Σ_{u→v} hub(u), then hub'(u) = Σ_{u→v} auth'(v),
  * each followed by MAX-normalization (the L∞ variant: an L2 norm would
  * put a cross-engine sqrt in the loop; max keeps the recurrence inside
  * the house float discipline — decimal-summed contributions, one
  * correctly-rounded IEEE division per vertex, 8-decimal re-round).
  *
  * Shuffle profile per round: two edge⋈scores equi-joins with map-side
  * partial aggregation plus one 1-row max aggregate (broadcast) — at
  * 100 TB the per-round cost is the two O(|E|) joins, the same envelope
  * as PageRank; per-round `.ckpt()` keeps lineage flat (the
  * ConnectedComponents discipline).
  */
object Hits {

  /** @param edges0 (src, dst) BIGINT pairs, mass flows src→dst.
    * @return (v, kind, score): kind = 'hub' for source-side vertices,
    *   'auth' for destination-side, after `iters` rounds. */
  def run(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1, 10], got $iters")
    val edges = edges0.select(col("src"), col("dst")).distinct().ckpt()
    val srcs = edges.select(col("src").as("v")).distinct().ckpt()
    var hub = srcs.withColumn("s", lit(1.0))
    var auth: DataFrame = null
    def normalize(raw: DataFrame): DataFrame = {
      val mx = broadcast(raw.agg(max(col("sm")).as("mx")))
      raw.crossJoin(mx).select(col("v"),
        expr("CAST(round(CAST(sm AS DOUBLE) / CAST(mx AS DOUBLE), 8) AS DOUBLE)")
          .as("s"))
    }
    for (_ <- 1 to iters) {
      auth = normalize(
        edges.join(hub.withColumnRenamed("v", "src"), "src")
          .select(col("dst").as("v"),
            expr("CAST(s AS DECIMAL(28,10))").as("c"))
          .groupBy("v").agg(sum(col("c")).as("sm"))).ckpt()
      hub = normalize(
        edges.join(auth.withColumnRenamed("v", "dst"), "dst")
          .select(col("src").as("v"),
            expr("CAST(s AS DECIMAL(28,10))").as("c"))
          .groupBy("v").agg(sum(col("c")).as("sm"))).ckpt()
    }
    hub.select(col("v"), lit("hub").as("kind"), col("s").as("score"))
      .unionByName(auth.select(col("v"), lit("auth").as("kind"),
        col("s").as("score")))
  }
}
