package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the union-find view
  * of near-dup clustering (LlmOps.q_dedup_components), usable on any
  * (a, b) edge DataFrame.
  *
  * Algorithm: min-label propagation with POINTER DOUBLING (hash-to-min
  * family). Each round every vertex takes the min of
  *   - its neighbors' labels (1-hop spread), and
  *   - its label's label (label-of-label: path halving),
  * so label distance-to-minimum at least doubles per round: a diameter-d
  * component converges in O(log d) rounds, not O(d) — an adversarial
  * duplicate CHAIN (d1≈d2≈…≈dn, each adjacent pair over threshold) takes
  * ~log₂(n) rounds where plain propagation takes n (the round-2 weak spot;
  * DedupScaleSpec pins a 1000-link chain at ≤ 12 rounds).
  *
  * Per round: two shuffled joins + one aggregation, then localCheckpoint to
  * truncate lineage. The convergence test rides the SAME aggregation: the
  * previous label is carried through as `lo` into the checkpointed result,
  * so "changed" is a column compare over materialized blocks — no second
  * join re-running the propagation, no driver-side plan growth. (An
  * `observe` metric would read the count with zero extra jobs, but
  * eager checkpoint materializes through an RDD action that fires no
  * QueryExecutionListener — Observation.get would block forever.)
  *
  * A hard `maxRounds` cap (default 50 ≈ diameter 2⁵⁰) bounds the loop on
  * any input; hitting it logs a bailout and returns the partial labels
  * rather than spinning.
  */
object ConnectedComponents {

  /** @param edges (a, b) pairs, either direction, BIGINT vertex ids.
    * @return (labels DataFrame with columns (v, l) — l = component min —
    *         and the number of propagation rounds run). */
  def labels(edges: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var cur = sym.select(col("a").as("v")).distinct()
      .withColumn("l", col("v")).localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      round += 1
      val nbr = sym.join(cur, col("b") === col("v"))
        .select(col("a").as("v"), col("l"), lit(false).as("self"))
      val ptr = cur.as("x").join(cur.as("y"), col("x.l") === col("y.v"))
        .select(col("x.v").as("v"), col("y.l").as("l"), lit(false).as("self"))
      val next = nbr
        .unionByName(ptr)
        .unionByName(cur.select(col("v"), col("l"), lit(true).as("self")))
        .groupBy("v")
        .agg(min(col("l")).as("l"),
          min(when(col("self"), col("l"))).as("lo"))
        .localCheckpoint()
      // cheap scan over the just-materialized blocks — not a recompute
      changed = next.where(col("l") =!= col("lo")).count()
      cur = next.select("v", "l")
    }
    if (changed > 0)
      System.err.println(
        s"[graft] ConnectedComponents: round cap $maxRounds hit with " +
          s"$changed labels still moving — returning partial labels")
    (cur, round)
  }
}
