package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Deterministic "random" walks over an edge list: at step i from vertex
  * v, the next vertex is argmin over out-neighbors n of the keyed PRF
  * md5("v|i|n") — pseudo-random neighbor choice with NO RNG state, so the
  * walk corpus is reproducible run-to-run, engine-to-engine, and under
  * any partitioning (the node2vec/DeepWalk corpus-generation shape; a
  * different hash key per step keeps consecutive choices decorrelated).
  *
  * Scale shape: one walk step = one equi join frontier⋈edges plus one
  * partial-agg'd min(struct(hash, nbr)) per walker — never a per-vertex
  * neighbor sort, never a collected adjacency list; a hub vertex's
  * million-edge candidate set reduces map-side. Walkers at a dead-end
  * vertex (no out-edges) simply stop emitting.
  */
object RandomWalk {

  /** @param edges0 (src, dst) directed edges (pass both directions for
    *   undirected).
    * @param seeds  (v) walk origins — one walker per distinct seed.
    * @return (seed, step, v) for step 0 (the seed itself) through the
    *   last step each walker reached, ≤ `steps`. */
  def run(edges0: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 20, s"steps must be in [1, 20], got $steps")
    val edges = edges0.select(col("src"), col("dst")).distinct()
      .ckpt()
    var cur = seeds.select(col("v")).distinct()
      .select(col("v").as("seed"), col("v")).ckpt()
    var out = cur.withColumn("step", lit(0L)).select("seed", "step", "v")
    for (i <- 1 to steps) {
      cur = cur.join(edges, col("v") === col("src"))
        .select(col("seed"), col("dst"),
          md5(concat_ws("|", col("v").cast("string"), lit(i.toString),
            col("dst").cast("string"))).as("h"))
        .groupBy("seed").agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("seed"), col("m.dst").as("v"))
      if (i % 2 == 0 && i != steps) cur = cur.ckpt()
      out = out.unionByName(
        cur.withColumn("step", lit(i.toLong)).select("seed", "step", "v"))
    }
    out
  }
}
