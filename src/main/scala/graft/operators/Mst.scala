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
  def run(edges0: DataFrame, maxRounds: Int = 20): DataFrame =
    boruvka(edges0, maxRounds, requireDone = true)
      .select("u", "v", "w").distinct()

  /** Exactly-`rounds` Borůvka rounds, each chosen edge tagged with the
    * round that picked it — the bounded-round view whose per-round
    * selections are deterministic min-(w, u, v) picks, so an engine
    * without a driver loop (the DuckDB oracle of q_mst) can replay them
    * as `rounds` unrolled CTE stages (the q_matching precedent). Early
    * exit on an already-spanning forest cannot change the output.
    * @return (u, v, w, round) — a PARTIAL forest if the graph needs more
    *   rounds; [[run]] is the converged full-forest contract. */
  def runRounds(edges0: DataFrame, rounds: Int): DataFrame =
    boruvka(edges0, rounds, requireDone = false)

  private def boruvka(edges0: DataFrame, bound: Int,
                      requireDone: Boolean): DataFrame = {
    require(bound >= 1 && bound <= 40,
      s"round bound must be in [1, 40], got $bound")
    val edges = edges0
      .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v", "w")
      .where(col("u") =!= col("v"))
      .groupBy("u", "v").agg(min("w").as("w"))
      .ckpt()
    var comp = edges.select(explode(array(col("u"), col("v"))).as("x"))
      .distinct().select(col("x").as("vx"), col("x").as("c")).ckpt()
    def crossEdges(): DataFrame = edges
      .join(comp.select(col("vx").as("u"), col("c").as("cu")), "u")
      .join(comp.select(col("vx").as("v"), col("c").as("cv")), "v")
      .where(col("cu") =!= col("cv"))
      .ckpt() // emptiness probe + both nomination sides
    val forest = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    while (!done && round < bound) {
      round += 1
      val ec = crossEdges()
      if (ec.isEmpty) done = true
      else {
        val chosen = ec
          .select(col("cu").as("comp"), struct(col("w"), col("u"), col("v")).as("k"))
          .unionByName(ec
            .select(col("cv").as("comp"), struct(col("w"), col("u"), col("v")).as("k")))
          .groupBy("comp").agg(min("k").as("k"))
          .select(col("k.u").as("u"), col("k.v").as("v"), col("k.w").as("w"))
          .distinct()
          .withColumn("round", lit(round.toLong))
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
    // a bound hit with cross-component edges still present is only legal
    // for the bounded-round (runRounds) contract
    if (requireDone && !done)
      require(crossEdges().isEmpty,
        s"Boruvka did not converge in $bound rounds")
    if (forest.isEmpty)
      edges.select("u", "v", "w")
        .withColumn("round", lit(1L)).where(lit(false))
    else forest.reduce(_ unionByName _)
  }
}
