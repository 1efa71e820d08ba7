package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Bounded-round k-core peeling over an undirected edge list: repeatedly
  * delete vertices of degree < k (each deletion lowers neighbors' degrees,
  * which is why peeling iterates). After enough rounds the survivors are
  * exactly the k-core — the standard density filter for graph curation
  * (spam/link-farm pruning keeps the dense core, PPI/citation analysis
  * drops the sparse fringe).
  *
  * Fixed round count, not fixpoint-tested: like [[Bfs]]/[[Sssp]] the
  * unrolled loop gives the DuckDB oracle an exact twin (degree-count +
  * two semi joins per round), and callers pick `rounds` ≥ the peeling
  * depth they care about (each round strictly shrinks the graph or is a
  * no-op, so extra rounds are cheap idempotent passes).
  *
  * Scale shape: per round one partial-agg'd degree count over the live
  * edge set plus two LeftSemi joins to drop edges touching peeled
  * vertices — all equi joins on the vertex id, no broadcast of anything
  * data-sized, lineage truncated on alternating rounds. Total work is
  * O(E · rounds), the same as the synchronous peeling literature.
  */
object KCore {

  /** @param edges0 (src, dst) BIGINT pairs treated as UNDIRECTED (both
    *   directions added internally, parallel edges and self-loops
    *   collapse/drop).
    * @return (v, deg) for vertices still alive after `rounds` peeling
    *   sweeps, with their degree in the surviving subgraph. */
  def run(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1, 20], got $rounds")
    var e = edges0.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .unionByName(edges0.select(col("dst").as("src"), col("src").as("dst"))
        .where(col("src") =!= col("dst")))
      .distinct().ckpt()
    for (r <- 1 to rounds) {
      // symmetrized edge list ⇒ out-degree == undirected degree
      val keep = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("v")
      e = e
        .join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
      // alternating-round lineage truncation; the final round flows
      // straight into the consumer's degree aggregation unmaterialized
      if (r % 2 == 0 && r != rounds) e = e.ckpt()
    }
    e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
  }
}
