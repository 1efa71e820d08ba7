package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Bounded-round single/multi-source shortest paths over a WEIGHTED edge
  * list — the weighted generalization of [[Bfs]] (min hop → min summed
  * weight), i.e. `rounds` synchronous Bellman-Ford relaxation sweeps.
  * Positive integral weights keep every distance an exact BIGINT, so the
  * DuckDB oracle (which unrolls the same rounds as full relaxations) is
  * bit-equal with no floating point anywhere.
  *
  * Scale shape: each round relaxes ONLY out of the previous round's
  * improved set, not the whole settled table. A relaxation out of an
  * unchanged vertex was already applied (with the identical candidate
  * distance) in the round after that vertex last improved, and the
  * min-regroup keeps its result — so frontier-only expansion computes
  * exactly the full-relaxation fixpoint prefix d_R(v) = min cost of any
  * ≤R-edge path, while the per-round join is |frontier|×deg instead of
  * |V|×deg. Candidates partial-aggregate map-side before the one shuffle
  * per round; lineage is truncated on alternating rounds (the
  * [[PageRank]] discipline).
  */
object Sssp {

  /** @param edges0 (src, dst, w) with w a POSITIVE integral weight (cast
    *   to long; rejected at runtime otherwise), in the direction(s) travel
    *   should flow (pass both directions for undirected).
    * @param seeds  (v) — distance-0 vertices.
    * @return (v, dist): min weight of any path of ≤ `rounds` edges from a
    *   seed, for every vertex so reachable (others absent). */
  def run(edges0: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    val edges = edges0
      .select(col("src"), col("dst"),
        when(col("w").cast("long") > 0, col("w").cast("long"))
          .otherwise(raise_error(concat(lit("Sssp: non-positive weight "),
            col("w").cast("string"))).cast("long")).as("w"))
      .ckpt()
    var dist = seeds.select(col("v")).distinct()
      .withColumn("dist", lit(0L)).ckpt()
    // seeds start at 0 and weights are positive, so the full seed set IS
    // round 0's improved set
    var frontier = dist
    for (i <- 1 to rounds) {
      // candidate min-aggregation, improvement detection, and the dist
      // regroup FUSED into ONE shuffle (the Bfs/Betweenness discipline):
      // old dist rows ride the same groupBy tagged 1; per vertex the
      // merged min IS the new dist, and "improved" = the candidate min
      // beats the (possibly absent) old min — where the join-based
      // spelling paid a second and third shuffle per round.
      val merged0 = frontier
        .join(edges, col("v") === col("src"))
        .select(col("dst").as("v"), (col("dist") + col("w")).as("dist"),
          lit(0).as("tag"))
        .unionByName(dist.select(col("v"), col("dist"), lit(1).as("tag")))
        .groupBy("v")
        .agg(min(col("dist")).as("dist"),
          min(when(col("tag") === 1, col("dist"))).as("old"),
          min(when(col("tag") === 0, col("dist"))).as("cand"))
      // truncate lineage on alternating rounds, ON THE SHARED FRAME (both
      // dist and frontier project from it); the FINAL round skips the
      // checkpoint — its consumer evaluates the last regroup directly, so
      // a materialization pass over |V| rows is saved
      val merged = if (i % 2 == 0 && i != rounds) merged0.ckpt() else merged0
      dist = merged.select(col("v"), col("dist"))
      frontier = merged
        .where(col("cand").isNotNull &&
          (col("old").isNull || col("cand") < col("old")))
        .select(col("v"), col("cand").as("dist"))
    }
    dist
  }
}
