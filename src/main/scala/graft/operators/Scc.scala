package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** User-scale strongly connected components — forward/backward
  * reachability peeling (the FW-BW / coloring family: Fleischer-Hendrickson-
  * Pinar '00, restated as synchronous label propagation), the algorithm the
  * `q_scc` contract comment promises for graphs too big for closure by
  * doubling (doubling materializes the reachability RELATION — Θ(V²) rows
  * on a dense condensation — where peeling only ever holds one label per
  * vertex).
  *
  * Outer peeling round over the ACTIVE subgraph:
  *
  *  1. FORWARD min-label propagation to fixpoint: f(v) = min vertex id
  *     that reaches v (own id included). Each round is one edges join +
  *     min-regroup over the active subgraph; fixpoint detection is a
  *     changed-row count on the just-materialized frame (free — `.ckpt()`
  *     already ran the job). Vertices with f(v) = v are ROOTS: nothing
  *     smaller reaches them.
  *  2. BACKWARD flag propagation from the roots along REVERSED edges,
  *     restricted to edges whose endpoints share the SAME f-label. Within
  *     one label region there is exactly one root, so a flag is
  *     unambiguous: flagged v means v →* root, and f(v) = root already
  *     means root →* v — so the flagged set of a region IS the root's
  *     SCC (Fleischer et al. Thm 1: SCC(r) = F(r) ∩ B(r), here F = the
  *     f-label region, B = the backward-flagged set). Frontier-only
  *     expansion with the fused single-shuffle dedup (the [[Bfs]]
  *     discipline).
  *  3. Settle every flagged vertex with scc = f(v); remove from active.
  *     Each outer round settles at least every current root's SCC, so the
  *     round count is bounded by the longest root-chain in the
  *     condensation, not |V|.
  *
  * Determinism: labels are integer ids, min/max algebra only — no floats,
  * no randomness; output is engine- and partitioning-invariant.
  *
  * SCALE CONTRACT: per-round state is ONE (v, f) row per active vertex
  * (O(V)), each propagation round is one partial-agg'd shuffle over the
  * active edge set (O(E)), and work SHRINKS as components settle — the
  * shape that survives a 1000-executor graph. The iteration bounds are
  * the caller's declared contract (like [[Bfs]]/[[LabelProp]] rounds):
  * the operator fails loudly via `require` if the graph needs more, it
  * never returns a silently-wrong partial answer.
  *
  * @see `queries/Wave26.scala` `q_scc` — the dimension-scale (≤25-node)
  *      closure-by-doubling twin this operator replaces at user scale.
  */
object Scc {

  /** @param edges0 (src, dst) BIGINT pairs, DIRECTED. Self-loops and
    *   duplicates are dropped.
    * @param maxOuter peeling-round bound (≥ longest root-chain in the
    *   condensation; fails loudly if exceeded).
    * @param maxProp per-fixpoint propagation bound (≥ active-subgraph
    *   reachability diameter; fails loudly if exceeded).
    * @return (v, scc): scc = min vertex id of v's strongly connected
    *   component, one row per vertex that appears in any edge. */
  def run(edges0: DataFrame, maxOuter: Int = 10, maxProp: Int = 60)
      : DataFrame = {
    require(maxOuter >= 1 && maxOuter <= 50,
      s"maxOuter must be in [1, 50], got $maxOuter")
    require(maxProp >= 1 && maxProp <= 200,
      s"maxProp must be in [1, 200], got $maxProp")
    val edges = edges0.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().ckpt()
    var active = edges.select(col("src").as("v"))
      .unionByName(edges.select(col("dst").as("v"))).distinct().ckpt()
    val settled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (outer < maxOuter && !active.isEmpty) {
      outer += 1
      val ae = edges
        .join(active.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(active.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .ckpt()
      // 1. forward min-label fixpoint over the active subgraph
      var lbl = active.select(col("v"), col("v").as("f")).ckpt()
      var changed = 1L
      var prop = 0
      while (changed > 0) {
        prop += 1
        require(prop <= maxProp,
          s"forward propagation exceeded $maxProp rounds (outer $outer)")
        val nxt = lbl.join(ae, col("v") === col("src"))
          .select(col("dst").as("v"), col("f"))
          .unionByName(lbl.select("v", "f"))
          .groupBy("v").agg(min("f").as("f")).ckpt()
        changed = nxt.join(lbl.select(col("v"), col("f").as("of")), "v")
          .where(col("f") < col("of")).count()
        lbl = nxt
      }
      // 2. backward flag propagation from roots, within equal f-label
      val rev = ae
        .join(lbl.select(col("v").as("src"), col("f").as("fs")), "src")
        .join(lbl.select(col("v").as("dst"), col("f").as("fd")), "dst")
        .where(col("fs") === col("fd"))
        .select(col("dst").as("rsrc"), col("src").as("rdst")).ckpt()
      var frontier = lbl.where(col("v") === col("f")).select("v").ckpt()
      val flagged = scala.collection.mutable.ArrayBuffer(frontier)
      prop = 0
      while (!frontier.isEmpty) {
        prop += 1
        require(prop <= maxProp,
          s"backward propagation exceeded $maxProp rounds (outer $outer)")
        val seen = flagged.map(_.select("v")).reduce(_ unionByName _)
        frontier = frontier.join(rev, col("v") === col("rsrc"))
          .select(col("rdst").as("v"), lit(0).as("tag"))
          .unionByName(seen.withColumn("tag", lit(1)))
          .groupBy("v").agg(max(col("tag")).as("mt"))
          .where(col("mt") === 0).select("v")
          .ckpt()
        if (!frontier.isEmpty) flagged += frontier
      }
      // 3. settle flagged vertices with scc = f
      val just = flagged.reduce(_ unionByName _)
        .join(lbl, "v").select(col("v"), col("f").as("scc")).ckpt()
      settled += just
      active = active.join(just.select("v"), Seq("v"), "left_anti").ckpt()
    }
    require(active.isEmpty,
      s"SCC peeling did not converge in $maxOuter outer rounds")
    if (settled.isEmpty) // no non-self-loop edges → no vertices
      active.select(col("v"), col("v").as("scc"))
    else settled.reduce(_ unionByName _)
  }
}
