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
  *  3. components merge along the chosen edges: every choosing component
  *     points across its chosen edge — a FUNCTIONAL graph whose only
  *     cycles are mutual-pick 2-cycles (with a total edge order, any
  *     longer pick-cycle would contain a non-minimal incident edge) — so
  *     the merge partition comes from pointer doubling + a min-per-tree
  *     regroup, and vertex labels relabel through one join.
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
        // each component's min-(w, u, v) pick, with BOTH endpoint labels
        // carried through the struct (for a fixed (w, u, v) the labels are
        // functionally determined, so they can't perturb the min)
        val nom = ec
          .select(col("cu").as("comp"), struct(col("w"), col("u"), col("v"),
            col("cu").as("cu"), col("cv").as("cv")).as("k"))
          .unionByName(ec
            .select(col("cv").as("comp"), struct(col("w"), col("u"), col("v"),
              col("cu").as("cu"), col("cv").as("cv")).as("k")))
          .groupBy("comp").agg(min("k").as("k"))
          .select(col("comp"),
            col("k.u").as("u"), col("k.v").as("v"), col("k.w").as("w"),
            when(col("k.cu") === col("comp"), col("k.cv"))
              .otherwise(col("k.cu")).as("p"))
          .ckpt() // forest output + the parent graph
        // lazy: a cheap distinct over the ckpt'd nom, consumed once at the
        // end — no per-round materialization job
        forest += nom.select("u", "v", "w").distinct()
          .withColumn("round", lit(round.toLong))
        // merge: every choosing component points at the label across its
        // chosen edge — a FUNCTIONAL graph (out-degree 1), so the merge
        // partition comes from pointer doubling instead of a general CC
        // fixpoint (the chosen edges form conjoined trees whose only
        // cycles are mutual-pick 2-cycles; break those toward the smaller
        // label, then p := p(p) collapses depth geometrically). Jumping
        // to the root alone would label trees by their root, not their
        // min member — a final min-per-tree regroup restores the min-label
        // contract the oracle unrolls. Measured vs the previous
        // ConnectedComponents.labels merge: q_mst 5.97 → 5.62 s median at
        // sf0.1 (q_single_linkage unchanged at ~7.9 — its cost is the
        // cold projection + total fixpoint-round scheduling, not the
        // merge; stage profile: projection 7.8 s cold / mst loop 6.3 /
        // final CC 2.7).
        var par = nom.as("x")
          .join(nom.select(col("comp").as("p2"), col("p").as("pp")),
            col("x.p") === col("p2"))
          .select(col("x.comp").as("c"),
            when(col("pp") === col("x.comp"),
              least(col("x.comp"), col("x.p"))).otherwise(col("x.p")).as("p"))
          .ckpt()
        var jumping = true
        var jumps = 0
        while (jumping) {
          jumps += 1
          // loud bound: depth halves per jump, so 64 jumps ≫ any real
          // component count; a cycle that survived the 2-cycle break
          // would otherwise spin here forever
          require(jumps <= 64,
            s"Boruvka merge pointer doubling exceeded 64 jumps (round $round)")
          val nxt = par.as("x")
            .join(par.select(col("c").as("p"), col("p").as("pp")), "p")
            .select(col("x.c").as("c"), col("pp").as("p"),
              (col("x.p") === col("pp")).as("stable"))
            .ckpt()
          jumping = nxt.where(!col("stable")).count() > 0
          par = nxt.select("c", "p")
        }
        val minl = par.groupBy("p").agg(min(col("c")).as("l"))
        val lbl = par.join(minl, "p").select(col("c"), col("l"))
        comp = comp
          .join(lbl.select(col("c"), col("l")), Seq("c"), "left_outer")
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
