package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection): every vertex
  * starts labeled with its own id; each round it adopts the most frequent
  * label among its neighbors, ties to the SMALLEST label. The synchronous
  * sweep with a deterministic tie-break makes the algorithm a pure
  * function of the graph — no randomized update order — so a DuckDB
  * oracle can unroll the identical rounds (the usual async LPA is
  * order-dependent and unverifiable).
  *
  * Per round: one equi join (edge ⋈ labels on dst, shuffles the edge
  * list) + two aggregations with map-side partials ((src, lbl) counts,
  * then the per-src argmax as a single min/max-struct — never a window
  * over a vertex's whole neighborhood on one task). Fixed iterations and
  * localCheckpoint per round, same discipline as [[PageRank]] /
  * [[ConnectedComponents]]. Isolated vertices (no edges) keep their own
  * label by construction (vertices are derived from the edge list).
  */
object LabelProp {

  /** @param edges0 (src, dst) BIGINT pairs, treated as UNDIRECTED (both
    *   directions are added internally, parallel edges collapse).
    * @return (v, lbl) after `iters` synchronous rounds. */
  def run(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val e = edges0.select(col("src"), col("dst"))
      .unionByName(edges0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = e.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint()
    for (_ <- 1 to iters) {
      val nbr = e.join(labels.select(col("v").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): max of (c, -lbl) structs —
      // a plain aggregate, no per-vertex window sort
      labels = nbr
        .groupBy(col("src").as("v"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint()
    }
    labels
  }
}
