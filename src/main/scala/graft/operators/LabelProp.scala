package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

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
  * then the per-src argmax as a single min-struct — never a window
  * over a vertex's whole neighborhood on one task). Fixed iterations,
  * localCheckpoint every SECOND round (lineage spans at most two rounds
  * — bounded — while halving the per-round materialization constant that
  * dominated the round-4 bench on small graphs; at scale the edge join
  * dominates either way). Isolated vertices (no edges) keep their own
  * label by construction (vertices are derived from the edge list).
  *
  * The argmax encodes (count desc, label asc) as min(struct(-c, lbl)):
  * the COUNT is negated (always safe — counts are small non-negative
  * numbers), never the label, so any BIGINT label including
  * Long.MinValue tie-breaks correctly.
  */
object LabelProp {

  /** @param edges0 (src, dst) BIGINT pairs, treated as UNDIRECTED (both
    *   directions are added internally, parallel edges collapse).
    * @return (v, lbl) after `iters` synchronous rounds. */
  def run(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val e = edges0.select(col("src"), col("dst"))
      .unionByName(edges0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().ckpt()
    var labels = e.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v")).ckpt()
    for (r <- 1 to iters) {
      val nbr = e.join(labels.select(col("v").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc): min of (-c, lbl) structs —
      // a plain aggregate, no per-vertex window sort; the negation is on
      // the count (never near Long.MinValue), not the label
      val next = nbr
        .groupBy(col("src").as("v"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("m"))
        .select(col("v"), col("m.lbl").as("lbl"))
      labels = if (r % 2 == 0 || r == iters) next.ckpt() else next
    }
    labels
  }
}
