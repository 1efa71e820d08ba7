package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-7 additions: the rank-statistics / privacy corner of a curation
  * pipeline — Spearman rank correlation and the Mann-Whitney U test (the
  * two standard nonparametric "did this data change distribution?"
  * gates), a differentially-private histogram release, and the Hill tail
  * index (the heavy-tail exponent behind "is activity power-law enough
  * to need skew handling?").
  *
  * Determinism: every rank is a [[graft.operators.Ranks]] global rank
  * under a TOTAL order (unique tie-breaker last), floats are quantized
  * to integer cents before anything ranks or sums them, ln goes through
  * the house round-8 discipline, and each query ends in a bounded,
  * totally-ordered result — so the DuckDB oracles replay bit-for-bit.
  *
  * Scale notes per query inline; none of these carries a whole-corpus
  * window or an uncapped join.
  */
object Wave7 {

  /** Integer-cents quantization of the events `value` double — the house
    * floor(x·100 + 0.5) spelling, identical in both engines, so ranks
    * and sums are exact-integer everywhere. */
  private val CentsSpark =
    "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"
  private def centsSql = "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"

  /** q_hill_tail: number of top order statistics the estimator uses. */
  private val HillK = 100

  /** q_dp_hist: Laplace scale b = Δf/ε = 1/0.5 (count sensitivity 1,
    * ε = 0.5) — inlined as the literal 2.0 in both engines. */
  private val DpEps = "2.0"

  /** q_betweenness: constant seed-set size (the q_closeness contract —
    * per-seed state is the seed's ball, so |seeds| must not grow with
    * the graph) and forward depth. */
  private val BetwSeedK = 8
  private val BetwDepth = 3

  /** q_sprt: H0/H1 Bernoulli rates, their per-observation log-likelihood
    * ratio terms pre-rounded to 8 decimals AT CATALOG BUILD TIME and
    * inlined as DECIMAL literals in both engines — the whole walk is then
    * exact decimal arithmetic (counts × 8-decimal constants), no float
    * until the display column. Thresholds ±ln(19) (α = β = 0.05). */
  private val SprtP0 = 0.10
  private val SprtP1 = 0.12
  private def r8(x: Double): String =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toString
  private val SprtC1 = r8(math.log(SprtP1 / SprtP0))           // y = 1 term
  private val SprtC0 = r8(math.log((1 - SprtP1) / (1 - SprtP0))) // y = 0 term
  private val SprtA = r8(math.log(19.0))

  val queries: Map[String, Q] = strictMap(

    // SPEARMAN rank correlation between two per-user metrics (event
    // count vs total spend): ρ = 1 − 6·Σd²/(n·(n²−1)) over GLOBAL ranks
    // from the distributed Ranks selection — no whole-table window, so a
    // popular metric value never lands on one task. Ranks are
    // row_number-style under the total order (metric, user_id): a pinned
    // deterministic contract (midranks for ties would need a second
    // aggregation; the tie-broken variant is partition- and
    // engine-invariant, which is what the gate needs). Σd² is an exact
    // BIGINT (≤ n³/3 — exact in double to n ≈ 2·10⁵ users, DECIMAL(38,0)
    // past that; the one terminal float chain is spelled identically in
    // both engines).
    "q_spearman" -> ((s, dir) => {
      val ux = table(s, dir, "events")
        .selectExpr("user_id", s"$CentsSpark AS cents")
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))
        .withColumn("k", lit(1))
      val rx = graft.operators.Ranks
        .withinKey(ux, "k", Seq("x", "user_id"))
        .select(col("user_id"), col("rk").as("rx"))
      val ry = graft.operators.Ranks
        .withinKey(ux, "k", Seq("y", "user_id"))
        .select(col("user_id"), col("rk").as("ry"))
      rx.join(ry, "user_id")
        .select(((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("d2"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd2"))
        .selectExpr("n", "sd2",
          "round(1.0 - 6.0 * CAST(sd2 AS DOUBLE) / " +
            "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)" +
            " - CAST(n AS DOUBLE)), 6) AS rho")
    }),

    // MANN-WHITNEY U (rank-sum) test: do click and purchase event values
    // come from the same distribution? Pooled global rank over integer
    // cents (total order (cents, event_id) — the tie-broken contract, as
    // in q_spearman), R₁ and U₁ = R₁ − n₁(n₁+1)/2 exact BIGINTs, then
    // the normal-approximation z in one identically-spelled float chain.
    // ONE rank pass over the pooled sample + one metadata aggregate —
    // the same cost envelope as any global Ranks consumer.
    "q_mannwhitney" -> ((s, dir) => {
      val p = table(s, dir, "events")
        .where(col("event_type").isin("click", "purchase"))
        .selectExpr("event_type", s"$CentsSpark AS cents", "event_id")
        .withColumn("k", lit(1))
      graft.operators.Ranks.withinKey(p, "k", Seq("cents", "event_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n2"),
          sum(when(col("event_type") === "click", col("rk"))
            .otherwise(0L)).as("r1"))
        // DIV, not `/`: the Column `/` is DOUBLE division, which would
        // ship u1 as a float while the oracle's `//` yields BIGINT —
        // the exact representation-drift class the driver hash catches
        .withColumn("u1", expr("r1 - n1 * (n1 + 1) DIV 2"))
        .selectExpr("n1", "n2", "r1", "u1",
          "round((CAST(u1 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)" +
            " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
            " * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0), 6) AS z")
    }),

    // DIFFERENTIALLY-PRIVATE histogram release of the documents
    // lang × source contingency table (ε = 0.5, sensitivity 1): Laplace
    // noise derived DETERMINISTICALLY per cell from an md5-uniform —
    // u = (2j+1)/2·10⁶ with j the first 8 md5 hex chars mod 10⁶, noise =
    // −b·sign(u−½)·ln(1−2|u−½|) — so both engines draw the IDENTICAL
    // noise (a seeded PRF, the replayable-release pattern; real
    // deployments swap the md5 for a keyed PRF). The ln argument is an
    // exact rational a/10⁶ (a ≥ 1 — never log 0) and ln rides the house
    // round-8; the grid is |langs|×|sources| metadata, the only
    // data-scale stage one partial-agg'd count shuffle.
    "q_dp_hist" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .withColumn("j", expr(
          "CAST(conv(substring(md5(concat('dp:', lang, ':', source)), 1, 8)," +
            " 16, 10) AS BIGINT) % 1000000"))
        .withColumn("a", expr("1000000 - abs(2*j + 1 - 1000000)"))
        .withColumn("noise", expr(
          s"-$DpEps * (CASE WHEN 2*j + 1 > 1000000 THEN 1.0 ELSE -1.0 END)" +
            " * round(ln(CAST(a AS DOUBLE) / 1000000.0), 8)"))
        .selectExpr("lang", "source", "n",
          "round(CAST(n AS DOUBLE) + noise, 4) AS noisy_n")
        .orderBy("lang", "source")),

    // HILL tail-index estimator of per-user total spend: α̂ = k / Σ_{i≤k}
    // ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top k+1 order statistics — the "how
    // heavy is the tail" diagnostic run before choosing skew salting.
    // Top-(k+1) selects via TakeOrderedAndProject (never a global sort);
    // the boundary row is the argmin under the same total order
    // (min-struct — no second pass); ln(xᵢ/xₖ₊₁) is one correctly-rounded
    // division + house round-8, decimal-summed. Guard: s = 0 (all top
    // values tied) yields NULL alpha identically in both engines.
    "q_hill_tail" -> ((s, dir) => {
      val ux = table(s, dir, "events")
        .selectExpr("user_id", s"$CentsSpark AS cents")
        .groupBy("user_id").agg(sum(col("cents")).as("x"))
      val top = ux.orderBy(desc("x"), asc("user_id")).limit(HillK + 1)
      val b = top.agg(min(struct(col("x"), (-col("user_id")).as("nid"))).as("m"))
        .select(col("m.x").as("xk1"), (-col("m.nid")).as("bid"))
      top.crossJoin(broadcast(b))
        .where(!(col("x") === col("xk1") && col("user_id") === col("bid")))
        .groupBy("xk1")
        .agg(count(lit(1)).as("k"),
          dsum(expr("round(ln(CAST(x AS DOUBLE) / CAST(xk1 AS DOUBLE)), 8)"), 8)
            .as("s"))
        .selectExpr("k", "xk1", "round(s, 8) AS lnsum",
          "CASE WHEN s > 0 THEN round(CAST(k AS DOUBLE) / s, 6) END AS alpha")
    }),

    // BETWEENNESS centrality (operators.Betweenness — bounded-seed
    // Brandes): shortest-path dependency of every vertex on the truncated
    // shortest-path DAGs of the BetwSeedK highest-degree trusted
    // suppliers, on the same part↔supplier bipartite graph as
    // q_closeness. Forward σ path counts are exact BIGINTs; backward δ
    // accumulation follows the house float discipline (per-edge term
    // rounded 8 from identical inputs, decimal-summed, re-rounded), so
    // the DuckDB oracle unrolls both sweeps exactly. Constant seed set =
    // k·|ball| state (the q_closeness scale contract); top-20 by
    // dependency via TakeOrderedAndProject.
    "q_betweenness" -> ((s, dir) => {
      // ckpt before mirroring: `pairs` feeds the union twice plus the
      // seed derivation — un-materialized that triples the lineitem
      // scan + distinct (the round-10 mirrored-union fix)
      import graft.operators.Ckpt._
      val pairs = table(s, dir, "lineitem")
        .select(col("l_partkey").as("p"),
          (col("l_suppkey") + 1000000L).as("sv"))
        .distinct().ckpt()
      val edges = pairs.select(col("p").as("src"), col("sv").as("dst"))
        .unionByName(pairs.select(col("sv").as("src"), col("p").as("dst")))
      val seeds = pairs.where(col("sv") % 7 === 0)
        .groupBy("sv").agg(count(lit(1)).as("dg"))
        .orderBy(desc("dg"), asc("sv")).limit(BetwSeedK)
        .select(col("sv").as("seed"))
      graft.operators.Betweenness.run(edges, seeds, BetwDepth)
        .orderBy(desc("bc"), asc("v")).limit(20)
        .select(col("v").cast("long").as("v"), col("n_seeds"), col("bc"))
    }),

    // GROUP-SEQUENTIAL SPRT (Wald's sequential probability ratio test at
    // daily interim analyses — the "stop the A/B test early" procedure):
    // per variant, the cumulative log-likelihood ratio of H1 (p = 12%)
    // vs H0 (p = 10%) purchase rates walks day by day; the first day the
    // walk leaves (−ln 19, ln 19) decides. Scale shape: ONE partial-agg'd
    // (variant, day) count shuffle over the events, then every window
    // rides the |days|-row aggregate (calendar-bounded — never a
    // whole-corpus window); the walk itself is exact DECIMAL (counts ×
    // 8-decimal literal constants), so the crossing day is
    // engine-invariant with no epsilon anywhere.
    "q_sprt" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr("user_id % 2 AS variant",
          "unix_micros(ts) DIV 86400000000 AS day",
          "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y")
        .groupBy("variant", "day")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("conv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("variant").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val walk = daily
        .withColumn("llr", expr(
          s"conv * CAST($SprtC1 AS DECIMAL(10,8))" +
            s" + (n - conv) * CAST($SprtC0 AS DECIMAL(10,8))"))
        .withColumn("cum", sum(col("llr")).over(w))
        .withColumn("cumn", sum(col("n")).over(w))
      val crossed = walk.where(
          col("cum") >= expr(s"CAST($SprtA AS DECIMAL(10,8))") ||
          col("cum") <= expr(s"CAST(-$SprtA AS DECIMAL(10,8))"))
        .groupBy("variant")
        .agg(min(struct(col("day"), col("cum"), col("cumn"))).as("m"))
      daily.groupBy("variant")
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total_obs"))
        .join(crossed, Seq("variant"), "left_outer")
        .selectExpr("variant", "n_days", "total_obs",
          "m.day AS dec_day", "m.cumn AS n_obs",
          "CASE WHEN m IS NULL THEN 'continue'" +
            " WHEN m.cum > 0 THEN 'H1' ELSE 'H0' END AS decision",
          "round(CAST(m.cum AS DOUBLE), 6) AS llr_at")
        .orderBy("variant")
    }),
  )

  /** Unrolled Brandes replay (oracle twin of
    * [[graft.operators.Betweenness]] at depth [[BetwDepth]]): forward
    * f0…f3 (σ accumulation, settled-set anti-joins), then backward
    * levels 2 and 1 with the identical per-edge round-8 / decimal-sum /
    * re-round spelling. Ends with CTE `alldelta` = (seed, v, delta) over
    * levels 1..3. */
  private lazy val BetwCtes: String = {
    // every f_i is referenced 2× by f_{i+1} and the final f another ~7×
    // by the backward sweep — DuckDB's default CTE INLINING re-executes
    // each reference, which compounds to an exponential plan (observed:
    // 100+ GB grinding at sf0.01). MATERIALIZED pins one execution per
    // CTE, which is also exactly the engine's ckpt-per-round shape.
    val fwd = (1 to BetwDepth).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT f.seed, e.dst AS v, CAST(sum(f.sig) AS BIGINT) AS sig
         |  FROM f${i - 1} f JOIN e ON f.v = e.src
         |  WHERE f.dist = ${i - 1} GROUP BY 1, 2
         |),
         |f$i AS MATERIALIZED (
         |  SELECT * FROM f${i - 1}
         |  UNION ALL
         |  SELECT n$i.seed, n$i.v, CAST($i AS BIGINT) AS dist, n$i.sig
         |  FROM n$i ANTI JOIN f${i - 1}
         |    ON n$i.seed = f${i - 1}.seed AND n$i.v = f${i - 1}.v
         |)""".stripMargin
    }.mkString(",\n")
    val last = s"f$BetwDepth"
    val bwd = ((BetwDepth - 1) to 1 by -1).map { lvl =>
      val prevDelta = if (lvl == BetwDepth - 1) s"b${BetwDepth}" else s"b${lvl + 1}"
      s"""c$lvl AS MATERIALIZED (
         |  SELECT x.seed, x.v,
         |    round(CAST(sum(CAST(round(
         |      (CAST(x.sig AS DOUBLE) / CAST(w.sig AS DOUBLE)) * (1.0 + b.delta),
         |      8) AS DECIMAL(18,8))) AS DOUBLE), 8) AS delta
         |  FROM $last x JOIN e ON x.v = e.src
         |  JOIN $last w ON w.seed = x.seed AND w.v = e.dst
         |    AND w.dist = ${lvl + 1}
         |  JOIN $prevDelta b ON b.seed = x.seed AND b.v = e.dst
         |  WHERE x.dist = $lvl
         |  GROUP BY x.seed, x.v
         |),
         |b$lvl AS MATERIALIZED (
         |  SELECT x.seed, x.v, coalesce(c$lvl.delta, 0.0) AS delta
         |  FROM $last x LEFT JOIN c$lvl
         |    ON c$lvl.seed = x.seed AND c$lvl.v = x.v
         |  WHERE x.dist = $lvl
         |)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to BetwDepth)
      .map(l => s"SELECT seed, v, delta FROM b$l").mkString("\n  UNION ALL ")
    s"""pairs AS (
       |  SELECT DISTINCT l_partkey AS p, l_suppkey + 1000000 AS sv
       |  FROM lineitem
       |),
       |e AS MATERIALIZED (SELECT p AS src, sv AS dst FROM pairs
       |      UNION ALL SELECT sv, p FROM pairs),
       |f0 AS MATERIALIZED (
       |  SELECT sv AS seed, sv AS v, CAST(0 AS BIGINT) AS dist,
       |         CAST(1 AS BIGINT) AS sig
       |  FROM (SELECT sv, count(*) AS dg FROM pairs WHERE sv % 7 = 0
       |        GROUP BY sv ORDER BY dg DESC, sv LIMIT $BetwSeedK)
       |),
       |$fwd,
       |b$BetwDepth AS (
       |  SELECT seed, v, CAST(0.0 AS DOUBLE) AS delta
       |  FROM $last WHERE dist = $BetwDepth
       |),
       |$bwd,
       |alldelta AS (
       |  $unionAll
       |)""".stripMargin
  }

  val oracle: Map[String, String] = strictMap(

    "q_spearman" ->
      s"""WITH ux AS (
         |  SELECT user_id, count(*) AS x, CAST(sum($centsSql) AS BIGINT) AS y
         |  FROM events GROUP BY user_id
         |),
         |r AS (
         |  SELECT row_number() OVER (ORDER BY x, user_id) AS rx,
         |         row_number() OVER (ORDER BY y, user_id) AS ry
         |  FROM ux
         |)
         |SELECT count(*) AS n,
         |  CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sd2,
         |  round(1.0 - 6.0 * CAST(sum((rx - ry) * (rx - ry)) AS DOUBLE) /
         |    (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         |     * CAST(count(*) AS DOUBLE) - CAST(count(*) AS DOUBLE)), 6) AS rho
         |FROM r""".stripMargin,

    "q_mannwhitney" ->
      s"""WITH p AS (
         |  SELECT event_type, $centsSql AS cents, event_id
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |),
         |r AS (
         |  SELECT event_type,
         |         row_number() OVER (ORDER BY cents, event_id) AS rk
         |  FROM p
         |),
         |a AS (
         |  SELECT
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN rk ELSE 0 END) AS BIGINT) AS r1
         |  FROM r
         |)
         |SELECT n1, n2, r1, r1 - n1 * (n1 + 1) // 2 AS u1,
         |  round((CAST(r1 - n1 * (n1 + 1) // 2 AS DOUBLE)
         |         - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
         |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         |           * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0), 6) AS z
         |FROM a""".stripMargin,

    "q_dp_hist" ->
      s"""WITH g AS (
         |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
         |),
         |u AS (
         |  SELECT lang, source, n,
         |    ${hex2longSql("md5('dp:' || lang || ':' || source)", 1)} % 1000000 AS j
         |  FROM g
         |),
         |w AS (
         |  SELECT lang, source, n, j,
         |    1000000 - abs(2*j + 1 - 1000000) AS a
         |  FROM u
         |)
         |SELECT lang, source, n,
         |  round(CAST(n AS DOUBLE)
         |    + (-$DpEps * (CASE WHEN 2*j + 1 > 1000000 THEN 1.0 ELSE -1.0 END)
         |       * round(ln(CAST(a AS DOUBLE) / 1000000.0), 8)), 4) AS noisy_n
         |FROM w ORDER BY lang, source""".stripMargin,

    "q_hill_tail" ->
      s"""WITH ux AS (
         |  SELECT user_id, CAST(sum($centsSql) AS BIGINT) AS x
         |  FROM events GROUP BY user_id
         |),
         |top AS (
         |  SELECT user_id, x FROM ux ORDER BY x DESC, user_id LIMIT ${HillK + 1}
         |),
         |b AS (
         |  SELECT x AS xk1, user_id AS bid FROM top
         |  ORDER BY x, user_id DESC LIMIT 1
         |),
         |h AS (
         |  SELECT t.x, b.xk1 FROM top t CROSS JOIN b
         |  WHERE NOT (t.x = b.xk1 AND t.user_id = b.bid)
         |),
         |agg AS (
         |  SELECT xk1, count(*) AS k,
         |    CAST(sum(CAST(round(ln(CAST(x AS DOUBLE) / CAST(xk1 AS DOUBLE)), 8)
         |             AS DECIMAL(18,8))) AS DOUBLE) AS s
         |  FROM h GROUP BY xk1
         |)
         |SELECT CAST(k AS BIGINT) AS k, xk1, round(s, 8) AS lnsum,
         |  CASE WHEN s > 0 THEN round(CAST(k AS DOUBLE) / s, 6) END AS alpha
         |FROM agg""".stripMargin,

    "q_betweenness" ->
      s"""WITH $BetwCtes
         |SELECT CAST(v AS BIGINT) AS v, count(*) AS n_seeds,
         |  round(CAST(sum(CAST(delta AS DECIMAL(18,8))) AS DOUBLE), 6) AS bc
         |FROM alldelta GROUP BY v
         |ORDER BY bc DESC, v LIMIT 20""".stripMargin,

    "q_sprt" ->
      s"""WITH daily AS (
         |  SELECT user_id % 2 AS variant, epoch_us(ts) // 86400000000 AS day,
         |    count(*) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conv
         |  FROM events GROUP BY 1, 2
         |),
         |walk AS (
         |  SELECT variant, day, n, conv,
         |    sum(conv * CAST($SprtC1 AS DECIMAL(10,8))
         |        + (n - conv) * CAST($SprtC0 AS DECIMAL(10,8)))
         |      OVER (PARTITION BY variant ORDER BY day
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(n) OVER (PARTITION BY variant ORDER BY day
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
         |  FROM daily
         |),
         |crossed AS (
         |  SELECT variant, day, cum, cumn,
         |    row_number() OVER (PARTITION BY variant ORDER BY day) AS rn
         |  FROM walk
         |  WHERE cum >= CAST($SprtA AS DECIMAL(10,8))
         |     OR cum <= CAST(-$SprtA AS DECIMAL(10,8))
         |),
         |first AS (SELECT variant, day, cum, cumn FROM crossed WHERE rn = 1),
         |tot AS (
         |  SELECT variant, count(*) AS n_days, CAST(sum(n) AS BIGINT) AS total_obs
         |  FROM daily GROUP BY variant
         |)
         |SELECT tot.variant, tot.n_days, tot.total_obs,
         |  first.day AS dec_day, CAST(first.cumn AS BIGINT) AS n_obs,
         |  CASE WHEN first.variant IS NULL THEN 'continue'
         |       WHEN first.cum > 0 THEN 'H1' ELSE 'H0' END AS decision,
         |  round(CAST(first.cum AS DOUBLE), 6) AS llr_at
         |FROM tot LEFT JOIN first ON tot.variant = first.variant
         |ORDER BY tot.variant""".stripMargin,
  )
}
