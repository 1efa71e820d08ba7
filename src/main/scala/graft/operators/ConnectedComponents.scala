package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Distributed connected components over an edge list — the union-find view
  * of near-dup clustering (LlmOps.q_dedup_components), usable on any
  * (a, b) edge DataFrame.
  *
  * Algorithm: Shiloach–Vishkin-style min-label convergence. Each round
  * every vertex takes the min of
  *   - its neighbors' labels (1-hop spread),
  *   - its label's label (pointer jumping: path halving), and
  *   - HOOKING — for every edge (a, b), label(a) itself receives
  *     label(b) as a candidate: the min label crosses between label-TREES
  *     through any edge connecting them, in one round, regardless of how
  *     far the edge is from either tree's root.
  * The hook term is what makes this O(log) rather than O(diameter): with
  * only neighbor-min + jumping, the component minimum spreads as a 1-hop
  * wave through id-plateaus (measured live: a 1,839-cell grid blob was
  * still moving at round 60), whereas hooking contracts the tree-adjacency
  * graph so the per-component label count collapses geometrically — the
  * same grid converges in 12 rounds, and DedupScaleSpec's adversarial
  * 1000-link duplicate chain stays ≤ 12 rounds.
  *
  * Per round: two chained edge⋈label joins + one label self-join + one
  * aggregation, then a stats-truncating checkpoint ([[Ckpt]] — plain
  * localCheckpoint compounds estimated Statistics across self-joining
  * rounds until the planner hangs multiplying million-digit BigInts). The
  * convergence test rides the SAME aggregation: the previous label is
  * carried through as `lo` into the checkpointed result, so "changed" is a
  * column compare over materialized blocks — no second join re-running the
  * propagation, no driver-side plan growth.
  *
  * A hard `maxRounds` cap (default 50 ≫ log₂ of any real graph) bounds the
  * loop on any input; hitting it logs a bailout and returns the partial
  * labels rather than spinning.
  */
object ConnectedComponents {

  /** @param edges (a, b) pairs, either direction, BIGINT vertex ids.
    * @param requireConverged when true, hitting the round cap with labels
    *   still moving THROWS instead of warning — for callers that build on
    *   the labels (e.g. [[Mst]], where a partial merge would let a later
    *   Borůvka round silently close a cycle).
    * @return (labels DataFrame with columns (v, l) — l = component min —
    *         and the number of propagation rounds run). */
  def labels(edges: DataFrame, maxRounds: Int = 50,
             requireConverged: Boolean = false): (DataFrame, Int) = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .ckpt()
    var cur = sym.select(col("a").as("v")).distinct()
      .withColumn("l", col("v")).ckpt()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      round += 1
      // (a, la, lb) per symmetric edge: one shuffle join per endpoint
      val withLb = sym.join(cur, col("b") === col("v"))
        .select(col("a"), col("l").as("lb"))
      val withBoth = withLb.join(cur, col("a") === col("v"))
        .select(col("a"), col("l").as("la"), col("lb"))
      val nbr = withBoth.select(col("a").as("v"), col("lb").as("l"),
        lit(false).as("self"))
      // hooking: the label vertex la hears lb (and lb hears la via the
      // mirrored symmetric edge)
      val hook = withBoth.select(col("la").as("v"), col("lb").as("l"),
        lit(false).as("self"))
      val ptr = cur.as("x").join(cur.as("y"), col("x.l") === col("y.v"))
        .select(col("x.v").as("v"), col("y.l").as("l"), lit(false).as("self"))
      val next = nbr
        .unionByName(hook)
        .unionByName(ptr)
        .unionByName(cur.select(col("v"), col("l"), lit(true).as("self")))
        .groupBy("v")
        .agg(min(col("l")).as("l"),
          min(when(col("self"), col("l"))).as("lo"))
        .ckpt()
      // cheap scan over the just-materialized blocks — not a recompute
      changed = next.where(col("l") =!= col("lo")).count()
      cur = next.select("v", "l")
    }
    if (changed > 0) {
      if (requireConverged)
        throw new IllegalStateException(
          s"ConnectedComponents did not converge in $maxRounds rounds " +
            s"($changed labels still moving)")
      System.err.println(
        s"[graft] ConnectedComponents: round cap $maxRounds hit with " +
          s"$changed labels still moving — returning partial labels")
    }
    (cur, round)
  }

  /** Labels of `edges` given the CONVERGED labels of a SUBGRAPH of it
    * (the q_percolation nested-threshold / q_robustness hub-cut case):
    * rather than seeding the full-size fixpoint — which still pays
    * whole-edge-set rounds just to detect convergence — CONTRACT the
    * graph by the seed partition (the [[Mst]] merge trick), run the
    * fixpoint on the component-count-sized contracted graph, and relabel
    * through one join. Seed labels must each lie inside their vertex's
    * own component of `edges` (guaranteed when the seed is a converged
    * labeling of any edge-subset); then the result is IDENTICAL to a
    * cold `labels(edges)` run — min vertex id per component — at
    * O(E) contraction + O(components) fixpoint cost.
    *
    * @param seed (v, l) converged subgraph labels; vertices of `edges`
    *   absent from the seed start as their own singleton.
    * @return (labels (v, l), inner fixpoint rounds). */
  def refine(edges: DataFrame, seed: DataFrame,
             maxRounds: Int = 50): (DataFrame, Int) = {
    val verts = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v"))).distinct()
    val vl = verts
      .join(seed.select(col("v"), col("l").as("sl")), Seq("v"), "left_outer")
      .select(col("v"), coalesce(col("sl"), col("v")).as("l0"))
      .ckpt() // consumed by the contraction join AND the final relabel
    val cedges = edges
      .join(vl.select(col("v").as("a"), col("l0").as("la")), "a")
      .join(vl.select(col("v").as("b"), col("l0").as("lb")), "b")
      .where(col("la") =!= col("lb"))
      .select(col("la").as("a"), col("lb").as("b")).distinct()
    // requireConverged: a round-cap bailout here would return silently
    // partial labels, breaking the documented "identical to a cold
    // labels() run" contract that q_percolation/q_robustness hash-gates
    // build on — fail loudly instead.
    val (clbl, rounds) = labels(cedges, maxRounds, requireConverged = true)
    val out = vl
      .join(clbl.select(col("v").as("l0"), col("l")), Seq("l0"), "left_outer")
      .select(col("v"), coalesce(col("l"), col("l0")).as("l"))
      .ckpt()
    (out, rounds)
  }
}
