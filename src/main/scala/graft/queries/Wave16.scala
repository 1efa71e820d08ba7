package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-16 additions: robust effect sizes, uncertainty-aware ranking,
  * causal panels, and forecast benchmarking —
  *
  *  - Cliff's delta between two event-value distributions, computed
  *    EXACTLY from the bucketed cross-multiply (Σ d₀·cum d₁ — never
  *    the O(n₀·n₁) pairwise form): the ordinal effect size that stays
  *    meaningful when t-test assumptions fail,
  *  - Wilson-score lower-bound ranking of cohort conversion rates —
  *    the "sort by rating" fix for small-sample cohorts outranking
  *    solid ones (naive-rate vs Wilson rank inversions surfaced
  *    side-by-side),
  *  - difference-in-differences over the (treat × post) panel — the
  *    workhorse causal read-out when randomization is absent,
  *  - seasonal forecast skill: MAE of the seasonal-naive (t−7)
  *    forecast over the naive (t−1) baseline on the daily series —
  *    the M-competition sanity benchmark every forecasting pipeline
  *    reports before anything fancier.
  *
  * Determinism: counts and absolute-error sums exact BIGINTs; money
  * in ×100 cents; products that pass int64 in DECIMAL(38,0); one
  * identical terminal float chain per statistic.
  */
object Wave16 {

  private val DayUs = 24L * 3600L * 1000000L

  /** Wilson z for the 95% lower bound. */
  private val WilsonZ = 1.96

  val queries: Map[String, Q] = strictMap(

    // CLIFF'S DELTA between purchase and click value distributions on
    // the floor(value) bucket grid (bucket-level equality counts as a
    // tie — the same bucketed contract as q_ks_test): #(x>y) =
    // Σ_b d₀(b)·cumd₁(<b) and #(x<y) = Σ_b d₀(b)·(n₁−cumd₁(≤b)),
    // exact in DECIMAL(38,0) (d·cum wraps int64 past ~3e9 rows/side),
    // δ = (gt−lt)/(n₀n₁) one terminal chain. One count shuffle; the
    // cumulative runs on the ≤ |buckets|-row grid.
    "q_cliffs_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = table(s, dir, "events")
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_type"),
          expr("CAST(floor(value) AS BIGINT)").as("b"))
        .groupBy("b")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("d0"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("d1"))
        // ckpt: the bucket grid feeds the totals AND the cumulative pass
        .ckpt()
      val tot = broadcast(g.agg(sum("d0").cast("long").as("n0"),
        sum("d1").cast("long").as("n1")))
      val w = Window.orderBy("b")
      g.withColumn("c1", sum(col("d1")).over(w))
        .crossJoin(tot)
        .withColumn("gt", expr(
          "CAST(d0 AS DECIMAL(38,0)) * (c1 - d1)"))
        .withColumn("lt", expr(
          "CAST(d0 AS DECIMAL(38,0)) * (n1 - c1)"))
        .withColumn("tie", expr("CAST(d0 AS DECIMAL(38,0)) * d1"))
        .agg(sum("gt").as("sgt"), sum("lt").as("slt"), sum("tie").as("stie"),
          max("n0").as("n0"), max("n1").as("n1"))
        .selectExpr("n0", "n1",
          "round(CAST(sgt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)" +
            " AS p_gt",
          "round(CAST(slt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)" +
            " AS p_lt",
          "round(CAST(stie AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)" +
            " AS p_tie",
          "round(CAST(sgt - slt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)" +
            " AS delta")
    }),

    // WILSON-SCORE LOWER-BOUND ranking of per-cohort purchase rates:
    // lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n) —
    // the uncertainty-penalized score that stops a 3-of-5 cohort
    // outranking a 300-of-600 one. Exact integer (n, x) per cohort;
    // the naive-rate rank and the Wilson rank ride side by side so
    // the inversions are visible. One count shuffle; ranking on the
    // m-row cohort grid.
    "q_wilson_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val z = WilsonZ
      table(s, dir, "events")
        .select((col("user_id") % 20).cast("long").as("cohort"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("y").as("x"))
        .withColumn("rate", expr("round(CAST(x AS DOUBLE) / n, 6)"))
        .withColumn("lb", expr(
          s"round((CAST(x AS DOUBLE) / n + $z * $z / (2.0 * n)" +
            s" - $z * sqrt((CAST(x AS DOUBLE) / n" +
            s" * (1.0 - CAST(x AS DOUBLE) / n) + $z * $z / (4.0 * n)) / n))" +
            s" / (1.0 + $z * $z / n), 6)"))
        .withColumn("rank_naive", row_number()
          .over(Window.orderBy(desc("rate"), asc("cohort"))).cast("long"))
        .withColumn("rank_wilson", row_number()
          .over(Window.orderBy(desc("lb"), asc("cohort"))).cast("long"))
        .selectExpr("cohort", "n", "x", "rate", "lb", "rank_naive",
          "rank_wilson")
        .orderBy("rank_wilson")
    }),

    // DIFFERENCE-IN-DIFFERENCES on the (treat = user parity) ×
    // (post = second half of the month) panel, outcome = mean event
    // value in EXACT ×100 cents: DiD = (m₁₁−m₁₀) − (m₀₁−m₀₀) with
    // cell means round-8 from exact integer sums. The 2×2 panel is
    // metadata after one partial-agg'd shuffle.
    "q_diff_in_diff" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) / DayUs).cast("long").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val d0 = e.agg(min("day").as("d0"))
      val cell = e.crossJoin(broadcast(d0))
        .select((col("user_id") % 2).cast("long").as("treat"),
          when(col("day") - col("d0") >= 15, 1L).otherwise(0L).as("post"),
          col("cents"))
        .groupBy("treat", "post")
        .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        .withColumn("mean_cents",
          expr("round(CAST(sc AS DOUBLE) / n, 8)"))
        // ckpt: the 2×2 panel feeds the DiD pick AND the final rows
        .ckpt()
      // per-cell max PICKS (not a float sum over cells — a 4-term
      // double sum is partial-agg order-dependent in the last ulp)
      val did = cell.agg(
          max(when(col("treat") === 1L && col("post") === 1L,
            col("mean_cents"))).as("m11"),
          max(when(col("treat") === 1L && col("post") === 0L,
            col("mean_cents"))).as("m10"),
          max(when(col("treat") === 0L && col("post") === 1L,
            col("mean_cents"))).as("m01"),
          max(when(col("treat") === 0L && col("post") === 0L,
            col("mean_cents"))).as("m00"))
        .selectExpr("round(m11 - m10 - (m01 - m00), 6) AS did_cents")
      cell.crossJoin(broadcast(did))
        .selectExpr("treat", "post", "n", "sc", "mean_cents", "did_cents")
        .orderBy("treat", "post")
    }),

    // SEASONAL FORECAST SKILL on the daily event-count series: MAE of
    // the seasonal-naive forecast x̂_t = x_{t−7} over the naive
    // x̂_t = x_{t−1}, both absolute-error sums EXACT BIGINTs over the
    // common scored window (t ≥ 8th day), skill = MAE_s/MAE_n — the
    // "does weekly seasonality even exist" gate a forecasting
    // pipeline runs before fitting anything. One daily-count shuffle;
    // lags on the |days|-row grid.
    "q_forecast_skill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = table(s, dir, "events")
        .select((unix_micros(col("ts")) / DayUs).cast("long").as("day"))
        .groupBy("day").agg(count(lit(1)).as("x"))
      val w = Window.orderBy("day")
      daily
        .withColumn("l1", lag(col("x"), 1).over(w))
        .withColumn("l7", lag(col("x"), 7).over(w))
        .where(col("l7").isNotNull)
        .agg(count(lit(1)).cast("long").as("n_scored"),
          sum(abs(col("x") - col("l1"))).cast("long").as("ae_naive"),
          sum(abs(col("x") - col("l7"))).cast("long").as("ae_snaive"))
        .selectExpr("n_scored", "ae_naive", "ae_snaive",
          "CASE WHEN ae_naive > 0 THEN" +
            " round(CAST(ae_snaive AS DOUBLE) / ae_naive, 6)" +
            " ELSE CAST(0.0 AS DOUBLE) END AS skill")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_cliffs_delta" ->
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
        |  SELECT b, d0, d1, sum(d1) OVER (ORDER BY b) AS c1 FROM g
        |),
        |s AS (
        |  SELECT sum(CAST(d0 AS DECIMAL(38,0)) * (c1 - d1)) AS sgt,
        |    sum(CAST(d0 AS DECIMAL(38,0)) * (tot.n1 - c1)) AS slt,
        |    sum(CAST(d0 AS DECIMAL(38,0)) * d1) AS stie,
        |    max(tot.n0) AS n0, max(tot.n1) AS n1
        |  FROM c CROSS JOIN tot
        |)
        |SELECT n0, n1,
        |  round(CAST(sgt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6) AS p_gt,
        |  round(CAST(slt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6) AS p_lt,
        |  round(CAST(stie AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)
        |    AS p_tie,
        |  round(CAST(sgt - slt AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1), 6)
        |    AS delta
        |FROM s""".stripMargin,

    "q_wilson_rank" ->
      s"""WITH c AS (
         |  SELECT CAST(user_id % 20 AS BIGINT) AS cohort, count(*) AS n,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
         |  FROM events GROUP BY 1
         |),
         |w AS (
         |  SELECT cohort, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
         |    round(CAST(x AS DOUBLE) / n, 6) AS rate,
         |    round((CAST(x AS DOUBLE) / n + $WilsonZ * $WilsonZ / (2.0 * n)
         |      - $WilsonZ * sqrt((CAST(x AS DOUBLE) / n
         |      * (1.0 - CAST(x AS DOUBLE) / n)
         |      + $WilsonZ * $WilsonZ / (4.0 * n)) / n))
         |      / (1.0 + $WilsonZ * $WilsonZ / n), 6) AS lb
         |  FROM c
         |),
         |r AS (
         |  SELECT *,
         |    CAST(row_number() OVER (ORDER BY rate DESC, cohort) AS BIGINT)
         |      AS rank_naive,
         |    CAST(row_number() OVER (ORDER BY lb DESC, cohort) AS BIGINT)
         |      AS rank_wilson
         |  FROM w
         |)
         |SELECT cohort, n, x, rate, lb, rank_naive, rank_wilson
         |FROM r ORDER BY rank_wilson""".stripMargin,

    "q_diff_in_diff" ->
      s"""WITH e AS (
         |  SELECT user_id, CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events
         |),
         |d0 AS (SELECT min(day) AS d0 FROM e),
         |cell AS (
         |  SELECT CAST(user_id % 2 AS BIGINT) AS treat,
         |    CAST(CASE WHEN day - (SELECT d0 FROM d0) >= 15
         |      THEN 1 ELSE 0 END AS BIGINT) AS post,
         |    count(*) AS n, CAST(sum(cents) AS BIGINT) AS sc
         |  FROM e GROUP BY 1, 2
         |),
         |m AS (
         |  SELECT treat, post, CAST(n AS BIGINT) AS n, sc,
         |    round(CAST(sc AS DOUBLE) / n, 8) AS mean_cents
         |  FROM cell
         |),
         |did AS (
         |  SELECT round(
         |    max(CASE WHEN treat = 1 AND post = 1 THEN mean_cents END)
         |    - max(CASE WHEN treat = 1 AND post = 0 THEN mean_cents END)
         |    - (max(CASE WHEN treat = 0 AND post = 1 THEN mean_cents END)
         |    - max(CASE WHEN treat = 0 AND post = 0 THEN mean_cents END)),
         |    6) AS did_cents
         |  FROM m
         |)
         |SELECT treat, post, n, sc, mean_cents, did.did_cents
         |FROM m CROSS JOIN did ORDER BY treat, post""".stripMargin,

    "q_forecast_skill" ->
      s"""WITH daily AS (
         |  SELECT CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day,
         |    count(*) AS x
         |  FROM events GROUP BY 1
         |),
         |l AS (
         |  SELECT day, x, lag(x, 1) OVER (ORDER BY day) AS l1,
         |    lag(x, 7) OVER (ORDER BY day) AS l7
         |  FROM daily
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_scored,
         |  CAST(sum(abs(x - l1)) AS BIGINT) AS ae_naive,
         |  CAST(sum(abs(x - l7)) AS BIGINT) AS ae_snaive,
         |  CASE WHEN sum(abs(x - l1)) > 0 THEN
         |    round(CAST(sum(abs(x - l7)) AS DOUBLE) / sum(abs(x - l1)), 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS skill
         |FROM l WHERE l7 IS NOT NULL""".stripMargin,
  )
}
