package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Bounded-seed Brandes betweenness centrality (Brandes '01) — the
  * "which vertices sit on the most shortest paths" primitive, restated
  * as the two unrolled Pregel sweeps the algorithm actually is:
  *
  *  1. FORWARD (path counting): per round, the frontier joins the edge
  *     list once and σ(seed, v) = Σ σ over in-neighbors at the previous
  *     level accumulates as an exact BIGINT; the settled set drops
  *     re-reached vertices with one anti-join (a vertex's shortest-path
  *     predecessors are all exactly one level shallower, so level
  *     sets ARE the shortest-path DAG).
  *  2. BACKWARD (dependency accumulation): for levels ℓ = depth−1 … 1,
  *     δ(v) = Σ over successors w at level ℓ+1 of (σv/σw)·(1 + δw).
  *     Each per-edge term is one correctly-rounded division + multiply
  *     rounded to 8 decimals from identical inputs in both engines, then
  *     decimal-summed and re-rounded — so δ is partition- and
  *     engine-invariant all the way up the DAG.
  *
  * Betweenness(v) = Σ over seeds of δ_seed(v), v ≠ seed.
  *
  * SCALE CONTRACT (same as q_closeness): per-seed state is the seed's
  * ≤depth-hop ball, so the seed set must be a CONSTANT (top-k by degree,
  * caller-chosen) — k·|ball| state, one frontier×edges join per round
  * regardless of k. Exact all-pairs betweenness is O(V·E) and belongs to
  * sampling estimators (Riondato-Kornaropoulos), not this operator.
  */
object Betweenness {

  /** @param edges (src, dst) BIGINT pairs, both directions for undirected.
    * @param seeds (seed) — the bounded source set.
    * @param depth forward rounds (shortest-path DAG truncated at this
    *   many hops — the documented contract, as in [[Bfs]]).
    * @return (v, bc): Σ-over-seeds dependency of every non-seed vertex
    *   on some truncated shortest path, 8-decimal deterministic. */
  def run(edges0: DataFrame, seeds: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 6, s"depth must be in [1, 6], got $depth")
    // Hash-repartition BEFORE the ckpt (r11, JobBreakdown finding): the
    // caller's edge list often arrives AQE-coalesced to a handful of
    // partitions (it is small in BYTES), but every forward round probes
    // it under a broadcast frontier join whose output — the σ-candidate
    // expansion, the biggest frame this operator touches — INHERITS the
    // probe side's partitioning. At 8 inherited partitions the round-3
    // expand+partial-agg ran 8-wide on a 32-core box (measured 1.3 s for
    // a 67 MB shuffle write); one cheap up-front shuffle of the edge
    // list restores full parallelism to every round.
    // explicit partition count: a column-only repartition is an exchange
    // AQE may re-coalesce (it did — right back to 8); the session's
    // shuffle-partition setting pinned explicitly is exempt
    val nPart = edges0.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val edges = edges0.select(col("src"), col("dst"))
      .repartition(nPart, col("src")).ckpt()
    // forward: one materialized LEVEL of (seed, v, sig) per round —
    // "first reached this round" = σ-candidates anti-joined against the
    // union of prior levels (the Bfs level discipline: each (seed, v) is
    // materialized exactly once, never re-aggregated as a whole state)
    var frontier = seeds.select(col("seed")).distinct()
      .select(col("seed"), col("seed").as("v"), lit(1L).as("sig"))
      .ckpt()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    // ckpt CADENCE (the LabelProp discipline, LabelProp.scala:52): an
    // eager ckpt is a full job barrier, and at small depth each
    // intermediate level is consumed only a handful of times — so odd
    // non-terminal levels (forward σ frames AND backward δ frames alike)
    // get a LAZY persist (first consumer materializes, the rest read
    // cache; worst case a racing stage duplicates a tiny deterministic
    // frame) and only even + terminal levels pay the eager barrier that
    // truncates lineage. Every persisted frame is tracked and unpersisted
    // once the final union has materialized — lazy caches must not
    // accumulate across repeated run() invocations in one session.
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def lazyPersist(df: DataFrame): DataFrame = {
      val p = df.persist(); persisted += p; p
    }
    // per-round TRANSITIONS (seed, pred@ℓ-1, v-candidate, σ_pred) — the
    // frontier×edges expansion the round computes anyway. Lazily
    // persisted (r11): the backward sweep's contribution join needs
    // exactly these rows (levels(ℓ-1)⋈edges ≡ trans(ℓ)), so caching
    // them here replaces one frontier×edges re-join PER BACKWARD LEVEL
    // with a cache read. Cache-vs-recompute: |trans| = Σ deg over the
    // frontier — the same rows the σ-groupBy streams through, so the
    // marginal cost is one in-memory copy, released with the rest of
    // the lazy persists after the final union materializes. trans(1) is
    // never consumed twice (backward stops at lvl 1 reading trans(2)),
    // so it skips the cache.
    val trans = new Array[DataFrame](depth + 1)
    for (i <- 1 to depth) {
      val t = frontier
        .join(edges, col("v") === col("src"))
        .select(col("seed"), col("v").as("pred"), col("dst").as("v"),
          col("sig"))
      trans(i) = if (i >= 2) lazyPersist(t) else t
      // σ-aggregation and settled-membership FUSED into ONE shuffle (the
      // Bfs discipline): settled rows ride the same groupBy tagged 1 with
      // a zero σ contribution; keys whose max tag is 0 are genuinely new
      // and their sum IS σ — where agg + left_anti paid a second full
      // sort-merge-join shuffle per round.
      val settled = levels.map(_.select("seed", "v")).reduce(_ unionByName _)
      val next = trans(i)
        .select(col("seed"), col("v"), col("sig"), lit(0).as("tag"))
        .unionByName(settled
          .select(col("seed"), col("v"), lit(0L).as("sig"), lit(1).as("tag")))
        .groupBy("seed", "v")
        .agg(sum(col("sig")).as("sig"), max(col("tag")).as("mt"))
        .where(col("mt") === 0)
        .select(col("seed"), col("v"), col("sig"))
      // terminal level included in the lazy cadence (r11): L_depth has
      // bounded consumers (δ_depth projection, the lvl depth-1 succ join,
      // the final union), so a lazy persist serves them from cache
      // without the extra eager barrier the old `i == depth` forced.
      frontier = if (i % 2 == 0) next.ckpt() else lazyPersist(next)
      levels += frontier
    }
    // backward: δ at the deepest level is 0; walk levels depth-1 … 1.
    // Each level's δ is its own materialized frame (index = dist) — the
    // sweep at lvl reads exactly levels(lvl), levels(lvl+1), and the
    // just-computed δ(lvl+1), never a growing union.
    val deltas = new Array[DataFrame](depth + 1)
    deltas(depth) = levels(depth)
      .select(col("seed"), col("v"), lit(0.0).as("delta"))
    for (lvl <- (depth - 1) to 1 by -1) {
      val fr = levels(lvl)
      val succ = levels(lvl + 1)
        .select(col("seed").as("sseed"), col("v").as("w"), col("sig").as("sigw"))
        .join(deltas(lvl + 1).select(col("seed").as("sseed"),
          col("v").as("w"), col("delta").as("dw")), Seq("sseed", "w"))
      // DAG edges level ℓ → ℓ+1 are exactly the forward transitions of
      // round ℓ+1 restricted to vertices that LANDED at level ℓ+1 (the
      // succ inner join does the restriction; trans.pred ∈ level ℓ by
      // construction) — reading the cached trans replaces the
      // fr×edges re-expansion the sweep used to pay per level.
      val contrib = trans(lvl + 1)
        .join(succ, col("seed") === col("sseed") && col("v") === col("w"))
        .withColumn("c", expr(
          "round((CAST(sig AS DOUBLE) / CAST(sigw AS DOUBLE)) * (1.0 + dw), 8)"))
      val d = fr.join(
          contrib.groupBy("seed", "pred")
            .agg(graft.queries.dsum(col("c"), 8).as("s"))
            .select(col("seed"), col("pred").as("v"), col("s")),
          Seq("seed", "v"), "left_outer")
        .select(col("seed"), col("v"),
          expr("round(coalesce(s, 0.0), 8)").as("delta"))
      // δ(lvl) has ≤2 consumers (the next sweep's succ side + the final
      // union); δ(1) exactly one — same cadence: eager barrier on even
      // levels only, lazy persist on odd (none at all for δ(1))
      deltas(lvl) =
        if (lvl % 2 == 0) d.ckpt() else if (lvl > 1) lazyPersist(d) else d
    }
    // bc(v) = Σ over seeds of δ; the seed row itself (dist 0) never
    // enters delta, so no v = seed exclusion is needed. The final union
    // is ckpt'd (eagerly materialized — it is ball-sized, tiny) so every
    // lazily persisted σ/δ frame can be released HERE: their last
    // consumer is this union, and without the unpersist the cached
    // blocks would pile up on executors across run() invocations.
    val out = (1 to depth).map(deltas).reduce(_ unionByName _).groupBy("v")
      .agg(count(lit(1)).as("n_seeds"),
        expr("round(CAST(sum(CAST(delta AS DECIMAL(18,8))) AS DOUBLE), 6)")
          .as("bc"))
      .ckpt()
    persisted.foreach(_.unpersist(blocking = false))
    out
  }
}
