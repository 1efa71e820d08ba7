package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Distributed minimum spanning forest — Borůvka's algorithm (1926; the
  * textbook distributed MST, e.g. GraphX's `minSpanningTree` lineage),
  * the remaining classic graph primitive the operator family lacked
  * (alongside [[ConnectedComponents]], [[Bfs]], [[Scc]], PageRank, …).
  *
  * Per Borůvka round over the current component partition:
  *
  *  1. every CROSS-component edge nominates itself to both endpoint
  *     components with the totally ordered key (w, u, v) — so ties in w
  *     break deterministically and the chosen forest is the unique MST
  *     of the (w, u, v)-perturbed weights (a valid minimum spanning
  *     forest of the raw weights, identical in any engine / partitioning);
  *  2. each component keeps its MIN key (one partial-agg'd shuffle — no
  *     sorting), and the distinct chosen edges join the forest;
  *  3. components merge along the chosen edges: the component-level
  *     graph feeds [[ConnectedComponents.labels]] (O(log) hooking
  *     convergence), and vertex labels relabel through one join.
  *
  * Components at least HALVE per round (every component hooks to a
  * neighbor), so the loop is O(log V) rounds of O(E)-shuffle work with
  * O(V) label state — the 100 TB shape. Terminates when no
  * cross-component edge remains (a spanning forest of every connected
  * piece); the `maxRounds` bound is a loud contract like [[Scc]]'s.
  */
object Mst {

  /** @param edges0 (src, dst, w) — undirected weighted edges, BIGINT ids
    *   and weight. Self-loops drop; parallel edges collapse to min w.
    * @param maxRounds Borůvka round bound (≥ log₂ V; loud failure).
    * @return (u, v, w) — the canonical (u < v) edges of the minimum
    *   spanning forest under the deterministic (w, u, v) total order. */
  def run(edges0: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 40,
      s"maxRounds must be in [1, 40], got $maxRounds")
    val edges = edges0
      .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v", "w")
      .where(col("u") =!= col("v"))
      .groupBy("u", "v").agg(min("w").as("w"))
      .ckpt()
    var comp = edges.select(explode(array(col("u"), col("v"))).as("x"))
      .distinct().select(col("x").as("vx"), col("x").as("c")).ckpt()
    val forest = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    while (!done) {
      round += 1
      require(round <= maxRounds,
        s"Boruvka did not converge in $maxRounds rounds")
      val ec = edges
        .join(comp.select(col("vx").as("u"), col("c").as("cu")), "u")
        .join(comp.select(col("vx").as("v"), col("c").as("cv")), "v")
        .where(col("cu") =!= col("cv"))
        .ckpt() // emptiness probe + both nomination sides
      if (ec.isEmpty) done = true
      else {
        val chosen = ec
          .select(col("cu").as("comp"), struct(col("w"), col("u"), col("v")).as("k"))
          .unionByName(ec
            .select(col("cv").as("comp"), struct(col("w"), col("u"), col("v")).as("k")))
          .groupBy("comp").agg(min("k").as("k"))
          .select(col("k.u").as("u"), col("k.v").as("v"), col("k.w").as("w"))
          .distinct()
          .ckpt() // forest output + the merge graph
        forest += chosen
        // merge: chosen edges connect component LABELS; CC over that
        // (component-count-sized) graph gives the new partition
        val cedges = chosen
          .join(comp.select(col("vx").as("u"), col("c").as("a")), "u")
          .join(comp.select(col("vx").as("v"), col("c").as("b")), "v")
          .select("a", "b")
        // requireConverged: a PARTIAL merge would leave two already-
        // connected components under distinct labels, letting a later
        // round nominate an edge between them — a silent cycle in the
        // "forest". Fail loudly instead (the operator's own maxRounds
        // contract).
        val (lbl, _) = ConnectedComponents.labels(cedges,
          requireConverged = true)
        comp = comp
          .join(lbl.select(col("v").as("c"), col("l")), Seq("c"), "left_outer")
          .select(col("vx"), coalesce(col("l"), col("c")).as("c"))
          .ckpt()
      }
    }
    if (forest.isEmpty) edges.select("u", "v", "w").where(lit(false))
    else forest.reduce(_ unionByName _).distinct()
  }
}
