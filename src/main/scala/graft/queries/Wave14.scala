package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-14 additions: experimentation-platform guardrails and
  * distribution-balancing primitives —
  *
  *  - iterative proportional fitting (raking) of the lang × source-
  *    parity cell grid to target marginals — the post-stratification
  *    weighting that balances a training mix to a target joint when
  *    only the margins are prescribed (the survey-weighting classic,
  *    and exactly the "hit the lang margin AND the source margin"
  *    corpus-assembly step),
  *  - Wasserstein-1 (earth-mover) distance between two event-value
  *    distributions on the bucketed ECDF — the drift statistic that
  *    sees HOW FAR mass moved where KS (q_ks_test) only sees the
  *    single worst gap,
  *  - Benjamini-Hochberg FDR control across per-cohort rate tests,
  *    run ENTIRELY in the log domain: Hoeffding-bound p-values
  *    ln p = −2nδ² (exact arithmetic, a documented conservative
  *    contract) against thresholds ln(k·q/m) — no exp/erf at all, so
  *    no cross-engine transcendental hazard,
  *  - daily sample-ratio-mismatch audit (the A/B trust check run
  *    before ANY metric is read): per-day χ² of the 50/50 split from
  *    exact integer counts, flagged against the 1-df critical value.
  *
  * Determinism: every statistic reduces to exact BIGINT counts off
  * one partial-agg'd shuffle; metadata-grid float chains are the
  * house per-term round-8 → decimal sum → terminal round spelling;
  * the only transcendental is round-8 ln of exact rationals.
  */
object Wave14 {

  private val DayUs = 24L * 3600L * 1000000L

  /** IPF rounds (each = one row-scale + one column-scale step),
    * unrolled identically in the oracle. */
  private val IpfRounds = 3

  /** BH target FDR q. */
  private val BhQ = 0.05

  /** χ² 1-df critical value at α = 0.05 for the SRM flag. */
  private val SrmCrit = 3.841

  val queries: Map[String, Q] = strictMap(

    // ITERATIVE PROPORTIONAL FITTING (raking): scale the observed
    // lang × source-parity joint to a uniform lang margin and a
    // 50/50 parity margin, IpfRounds alternating row/column steps
    // (round-8 cells, decimal-summed margins — the Sinkhorn/IPF
    // classic). Output: observed cell, fitted cell, and the raking
    // weight w = fitted/observed a sampler would apply. ONE count
    // shuffle; the grid is |langs|·2 rows — metadata at any scale,
    // ckpt'd once so the rounds don't re-execute the corpus scan.
    "q_ipf_raking" -> ((s, dir) => {
      val cell = table(s, dir, "documents")
        .select(col("lang"),
          expr("CAST(substring(source, 4) AS INT) % 2").cast("long")
            .as("par"))
        .groupBy("lang", "par").agg(count(lit(1)).as("n"))
        .ckpt()
      val tot = cell.agg(sum("n").cast("long").as("nn"))
      val kl = cell.select("lang").distinct()
        .agg(count(lit(1)).cast("long").as("k"))
      var p = cell.crossJoin(broadcast(tot))
        .selectExpr("lang", "par", "n",
          "round(CAST(n AS DOUBLE) / nn, 8) AS p")
        .crossJoin(broadcast(kl))
      // ckpt each half-step: p feeds its margin agg AND the scale join
      // (2 consumers per step) — unmaterialized, the round lineage
      // multiplies 4× per round (plan audit: 225 Exchanges before, the
      // q_markov_stationary lesson)
      for (_ <- 1 to IpfRounds) {
        val rs = p.groupBy("lang").agg(dsum(col("p"), 8).as("rs"))
        val rowStep = p.join(broadcast(rs), "lang")
          .selectExpr("lang", "par", "n", "k",
            "round(p * round(1.0 / k, 8) / rs, 8) AS p")
          .ckpt()
        val cs = rowStep.groupBy("par").agg(dsum(col("p"), 8).as("cs"))
        p = rowStep.join(broadcast(cs), "par")
          .selectExpr("lang", "par", "n", "k",
            "round(p * 0.5 / cs, 8) AS p")
          .ckpt()
      }
      p.crossJoin(broadcast(tot))
        .selectExpr("lang", "par", "n",
          "round(p, 6) AS p_fit",
          "round(p * nn / n, 6) AS w")
        .orderBy("lang", "par")
    }),

    // WASSERSTEIN-1 (earth-mover) distance between the value
    // distributions of purchase vs click events, on unit floor(value)
    // buckets: W₁ = ∫|F₀ − F₁| = Σ_b |c₀·n₁ − c₁·n₀|·gap(b) / (n₀·n₁)
    // with the cross-multiplied numerator EXACT BIGINT (the q_ks_test
    // discipline — no rate floats inside the sum), summed in
    // DECIMAL(38,0) (the q_chi2 overflow lesson: the scaled gap can
    // reach n²·|buckets|), and ONE terminal division. gap(b) weights
    // each present bucket by the distance to the next — absent
    // buckets carry the unchanged ECDF gap. One count shuffle; the
    // cumulative windows run on the ≤ |buckets|-row grid.
    "q_wasserstein1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = table(s, dir, "events")
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), expr("CAST(floor(value) AS BIGINT)").as("b"))
        .groupBy("b")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("d0"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("d1"))
        // ckpt: the bucket grid feeds the totals AND the ECDF windows
        .ckpt()
      val tot = broadcast(g.agg(sum(col("d0")).cast("long").as("n0"),
        sum(col("d1")).cast("long").as("n1")))
      val w = Window.orderBy("b")
      g.withColumn("c0", sum(col("d0")).over(w))
        .withColumn("c1", sum(col("d1")).over(w))
        .withColumn("gap", coalesce(lead(col("b"), 1).over(w) - col("b"),
          lit(0L)))
        .crossJoin(tot)
        .withColumn("term", expr(
          // 128-bit BEFORE the multiply: c·n alone wraps int64 once both
          // sides pass ~3e9 rows (the q_chi2 overflow lesson)
          "abs(CAST(c0 AS DECIMAL(38,0)) * n1 - CAST(c1 AS DECIMAL(38,0))" +
            " * n0) * gap"))
        .agg(sum(col("term")).as("sterm"), max(col("n0")).as("n0"),
          max(col("n1")).as("n1"), count(lit(1)).cast("long").as("n_buckets"))
        .selectExpr("n0", "n1", "n_buckets",
          "round(CAST(sterm AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)" +
            " AS w1")
    }),

    // BENJAMINI-HOCHBERG FDR control across 50 per-cohort purchase-
    // rate tests, entirely in the LOG domain: the Hoeffding bound
    // gives ln p_i = −2·n_i·δ_i² (δ = |rate_i − rate_global|, a
    // DOCUMENTED conservative p-value contract — no erf), and the BH
    // step-up compares ln p_(k) ≤ ln(k·q/m) — ln of exact rationals,
    // round-8, no exp anywhere. k* = the largest passing rank;
    // cohorts with rank ≤ k* are rejected (their rate genuinely
    // drifts). One count shuffle; ranking and thresholds live on the
    // m-row cohort grid.
    "q_bh_fdr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = table(s, dir, "events")
        .select((col("user_id") % 50).cast("long").as("cohort"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("y").as("x"))
        // ckpt: feeds the totals AND the scored grid
        .ckpt()
      val tot = broadcast(c.agg(sum("n").cast("long").as("nn"),
        sum("x").cast("long").as("xx"),
        count(lit(1)).cast("long").as("m")))
      val scored = c.crossJoin(tot)
        .withColumn("delta", expr(
          "round(abs(CAST(x AS DOUBLE) / n - CAST(xx AS DOUBLE) / nn), 8)"))
        .withColumn("lnp",
          expr("round(-2.0 * n * delta * delta, 8)"))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("lnp"), col("cohort"))))
        .withColumn("thr",
          expr(s"round(ln(rk * $BhQ / m), 8)"))
        .withColumn("pass", col("lnp") <= col("thr"))
        // ckpt: feeds k_star AND the final projection
        .ckpt()
      val kstar = scored
        .agg(coalesce(max(when(col("pass"), col("rk"))), lit(0))
          .cast("long").as("k_star"))
      scored.crossJoin(broadcast(kstar))
        .selectExpr("cohort", "n", "x", "lnp", "CAST(rk AS BIGINT) AS rk",
          "thr", "CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS BIGINT)" +
            " AS rejected", "k_star")
        .orderBy("rk")
    }),

    // DAILY SAMPLE-RATIO-MISMATCH audit of the user_id-parity split:
    // per day, χ² against the expected 50/50 = (o₀−o₁)²/n from exact
    // BIGINT counts (the 2-cell goodness-of-fit closed form), flagged
    // at the 1-df α=0.05 critical value; the month-level pooled χ²
    // rides along as a scalar. The trust gate every experimentation
    // platform runs before reading ANY metric. One (day) shuffle;
    // the grid is |days| rows.
    "q_srm_check" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) / DayUs).cast("long").as("day"))
      val d0 = e.agg(min("day").as("d0"))
      val daily = e.crossJoin(broadcast(d0))
        .select((col("day") - col("d0")).as("day"),
          (col("user_id") % 2).cast("long").as("arm"))
        .groupBy("day")
        .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("o0"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("o1"))
        // square in DOUBLE: a BIGINT (o0−o1)² wraps once the daily
        // imbalance passes ~3e9 rows
        .withColumn("chi2", expr(
          "round(CAST(o0 - o1 AS DOUBLE) * CAST(o0 - o1 AS DOUBLE)" +
            " / (o0 + o1), 6)"))
        .withColumn("srm_flag",
          expr(s"CAST(CASE WHEN chi2 > $SrmCrit THEN 1 ELSE 0 END" +
            " AS BIGINT)"))
        // ckpt: the daily grid feeds the pooled row AND the final rows
        .ckpt()
      val pooled = daily
        .agg(sum("o0").cast("long").as("t0"), sum("o1").cast("long").as("t1"))
        .selectExpr(
          "round(CAST(t0 - t1 AS DOUBLE) * CAST(t0 - t1 AS DOUBLE)" +
            " / (t0 + t1), 6) AS chi2_total")
      daily.crossJoin(broadcast(pooled))
        .selectExpr("day", "o0", "o1", "chi2", "srm_flag", "chi2_total")
        .orderBy("day")
    }),
  )

  /** One unrolled IPF round (row-scale to uniform lang margin, then
    * column-scale to the 50/50 parity margin). */
  private def ipfRoundSql(r: Int): String =
    s"""rs$r AS (
       |  SELECT lang, ${dsumSql("p", 8)} AS rs FROM p${r - 1} GROUP BY lang
       |),
       |row$r AS (
       |  SELECT p.lang, p.par, p.n, p.k,
       |    round(p.p * round(1.0 / p.k, 8) / rs$r.rs, 8) AS p
       |  FROM p${r - 1} p JOIN rs$r ON rs$r.lang = p.lang
       |),
       |cs$r AS (
       |  SELECT par, ${dsumSql("p", 8)} AS cs FROM row$r GROUP BY par
       |),
       |p$r AS (
       |  SELECT r.lang, r.par, r.n, r.k, round(r.p * 0.5 / cs$r.cs, 8) AS p
       |  FROM row$r r JOIN cs$r ON cs$r.par = r.par
       |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_ipf_raking" ->
      s"""WITH cell AS (
         |  SELECT lang, CAST(CAST(substr(source, 4) AS INT) % 2 AS BIGINT)
         |    AS par, count(*) AS n
         |  FROM documents GROUP BY 1, 2
         |),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cell),
         |kl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS k FROM cell),
         |p0 AS (
         |  SELECT lang, par, CAST(n AS BIGINT) AS n, kl.k,
         |    round(CAST(n AS DOUBLE) / tot.nn, 8) AS p
         |  FROM cell CROSS JOIN tot CROSS JOIN kl
         |),
         |${(1 to IpfRounds).map(ipfRoundSql).mkString(",\n")}
         |SELECT lang, par, n, round(p, 6) AS p_fit,
         |  round(p * (SELECT nn FROM tot) / n, 6) AS w
         |FROM p$IpfRounds ORDER BY lang, par""".stripMargin,

    "q_wasserstein1" ->
      """WITH g AS (
        |  SELECT CAST(floor(value) AS BIGINT) AS b,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS d0,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d1
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(sum(d0) AS BIGINT) AS n0, CAST(sum(d1) AS BIGINT) AS n1
        |  FROM g
        |),
        |c AS (
        |  SELECT b, sum(d0) OVER (ORDER BY b) AS c0,
        |    sum(d1) OVER (ORDER BY b) AS c1,
        |    coalesce(lead(b, 1) OVER (ORDER BY b) - b, 0) AS gap
        |  FROM g
        |)
        |SELECT tot.n0, tot.n1, CAST(count(*) AS BIGINT) AS n_buckets,
        |  round(CAST(sum(abs(CAST(c0 AS DECIMAL(38,0)) * tot.n1
        |    - CAST(c1 AS DECIMAL(38,0)) * tot.n0) * gap) AS DOUBLE)
        |    / (CAST(tot.n0 AS DOUBLE) * tot.n1), 6) AS w1
        |FROM c CROSS JOIN tot
        |GROUP BY tot.n0, tot.n1""".stripMargin,

    "q_bh_fdr" ->
      s"""WITH c AS (
         |  SELECT CAST(user_id % 50 AS BIGINT) AS cohort, count(*) AS n,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
         |  FROM events GROUP BY 1
         |),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx,
         |    CAST(count(*) AS BIGINT) AS m
         |  FROM c
         |),
         |scored AS (
         |  SELECT cohort, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
         |    round(-2.0 * n * round(abs(CAST(x AS DOUBLE) / n
         |      - CAST(xx AS DOUBLE) / nn), 8)
         |      * round(abs(CAST(x AS DOUBLE) / n
         |      - CAST(xx AS DOUBLE) / nn), 8), 8) AS lnp,
         |    m
         |  FROM c CROSS JOIN tot
         |),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY lnp, cohort) AS rk,
         |    round(ln(row_number() OVER (ORDER BY lnp, cohort)
         |      * $BhQ / m), 8) AS thr
         |  FROM scored
         |),
         |ks AS (
         |  SELECT CAST(coalesce(max(CASE WHEN lnp <= thr THEN rk END), 0)
         |    AS BIGINT) AS k_star
         |  FROM rk
         |)
         |SELECT cohort, n, x, lnp, CAST(rk AS BIGINT) AS rk, thr,
         |  CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS BIGINT)
         |    AS rejected, k_star
         |FROM rk CROSS JOIN ks ORDER BY rk""".stripMargin,

    "q_srm_check" ->
      s"""WITH e AS (
         |  SELECT user_id, CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day
         |  FROM events
         |),
         |d0 AS (SELECT min(day) AS d0 FROM e),
         |daily AS (
         |  SELECT day - (SELECT d0 FROM d0) AS day,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS o0,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS o1
         |  FROM e GROUP BY 1
         |),
         |f AS (
         |  SELECT *,
         |    round(CAST(o0 - o1 AS DOUBLE) * CAST(o0 - o1 AS DOUBLE)
         |      / (o0 + o1), 6) AS chi2
         |  FROM daily
         |),
         |pooled AS (
         |  SELECT round(CAST(sum(o0) - sum(o1) AS DOUBLE)
         |    * CAST(sum(o0) - sum(o1) AS DOUBLE)
         |    / (sum(o0) + sum(o1)), 6) AS chi2_total
         |  FROM daily
         |)
         |SELECT day, o0, o1, chi2,
         |  CAST(CASE WHEN chi2 > $SrmCrit THEN 1 ELSE 0 END AS BIGINT)
         |    AS srm_flag,
         |  chi2_total
         |FROM f CROSS JOIN pooled ORDER BY day""".stripMargin,
  )
}
