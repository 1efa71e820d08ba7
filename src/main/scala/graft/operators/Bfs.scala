package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Bounded-round multi-source BFS over an edge list — shortest hop
  * distance from a seed set, the graph primitive behind link-distance
  * quality priors (docs N hops from a trusted seed site) and blast-radius
  * queries. Same unrolled-Pregel shape as [[PageRank]] but with integer
  * min-distance state, so results are exact in both engines with no
  * floating point anywhere.
  *
  * Each round expands ONLY the previous round's frontier, not the whole
  * settled set: a vertex first reached at round i is reachable from some
  * vertex first reached at round i-1 (else it would have been reached
  * earlier), so frontier-only expansion loses nothing while keeping the
  * per-round join |frontier|×deg instead of |settled|×deg — the difference
  * between O(E·rounds) and O(E·diameter) total work on a 100 TB graph.
  *
  * State is kept as one materialized LEVEL per round, not a re-aggregated
  * whole: a vertex's min distance IS the first level it appears in, so
  * "new this round" = candidates anti-joined against the union of prior
  * levels (all small LogicalRDDs), and the union of levels is the answer.
  * This replaces the naive per-round union + min-regroup + re-checkpoint
  * of the ENTIRE settled set — O(Σ|settled|) materialized bytes across
  * the loop — with O(Σ|frontier|) = O(|reached|): each vertex is written
  * exactly once, which is what keeps a deep traversal affordable when the
  * settled set is most of a 100 TB graph.
  *
  * Fixed round count (not fixpoint-tested): hop-distance consumers want a
  * bounded neighborhood (≤ k hops from seeds), and the unrolled loop gives
  * the DuckDB oracle an exact twin — one UNION + min-regroup per round.
  */
object Bfs {

  /** @param edges0 (src, dst) BIGINT pairs, already in the direction(s)
    *   reachability should flow (pass both directions for undirected).
    * @param seeds  (v) — distance-0 vertices.
    * @return (v, dist): min hop distance from any seed, for every vertex
    *   reached within `rounds` hops (unreached vertices are absent). */
  def run(edges0: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    // edges feed every round: truncate lineage once (PageRank discipline)
    val edges = edges0.select(col("src"), col("dst")).ckpt()
    var frontier = seeds.select(col("v")).distinct()
      .withColumn("dist", lit(0L)).ckpt()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    for (i <- 1 to rounds) {
      // candidate dedup + settled-membership test FUSED into ONE shuffle:
      // union the tagged settled set under the raw candidates and keep
      // keys whose max tag is 0 (never settled). The partial aggregate
      // collapses duplicate candidates map-side exactly as distinct()
      // would, and the same reduce answers the membership test — where
      // distinct + left_anti paid a second full sort-merge-join shuffle
      // over the deduped frontier and the settled union.
      val settled = levels.map(_.select("v")).reduce(_ unionByName _)
      frontier = frontier
        .join(edges, col("v") === col("src"))
        .select(col("dst").as("v"), lit(0).as("tag"))
        .unionByName(settled.withColumn("tag", lit(1)))
        .groupBy("v").agg(max(col("tag")).as("mt"))
        .where(col("mt") === 0)
        .select(col("v"), lit(i.toLong).as("dist"))
        .ckpt()
      levels += frontier
    }
    levels.reduce(_ unionByName _)
  }

  /** Per-source BFS: like [[run]] but each seed keeps its OWN distance
    * field — state rows are (seed, v, dist), the shape centrality
    * computations need. All seeds advance in the SAME per-round join
    * (one frontier×edges equi-join regardless of |seeds|) — batching k
    * BFS traversals into one job instead of k, which is what makes
    * k-source centrality affordable on a big graph. State size is
    * Σ per-seed reachable sets; callers bound it with `rounds` and the
    * seed count.
    *
    * @return (seed, v, dist): min hop distance of v from THAT seed, one
    *   row per (seed, reached vertex) within `rounds` hops. */
  def perSource(edges0: DataFrame, seeds: DataFrame, rounds: Int): DataFrame =
    perSourceLevels(edges0, seeds, rounds).reduce(_ unionByName _)

  /** [[perSource]] with the per-round levels exposed (index = hop
    * distance; each level is a materialized LogicalRDD of
    * (seed, v, dist) rows) — consumers that sweep the levels again, such
    * as [[Betweenness]]'s backward pass, read each level directly instead
    * of re-filtering one big state table per sweep step. */
  def perSourceLevels(edges0: DataFrame, seeds: DataFrame, rounds: Int)
      : Seq[DataFrame] = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    val edges = edges0.select(col("src"), col("dst")).ckpt()
    var frontier = seeds.select(col("seed")).distinct()
      .select(col("seed"), col("seed").as("v"), lit(0L).as("dist"))
      .ckpt()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    for (i <- 1 to rounds) {
      // same fused single-shuffle dedup + membership as [[run]]
      val settled = levels.map(_.select("seed", "v")).reduce(_ unionByName _)
      frontier = frontier
        .join(edges, col("v") === col("src"))
        .select(col("seed"), col("dst").as("v"), lit(0).as("tag"))
        .unionByName(settled.withColumn("tag", lit(1)))
        .groupBy("seed", "v").agg(max(col("tag")).as("mt"))
        .where(col("mt") === 0)
        .select(col("seed"), col("v"), lit(i.toLong).as("dist"))
        .ckpt()
      levels += frontier
    }
    levels.toSeq
  }
}
