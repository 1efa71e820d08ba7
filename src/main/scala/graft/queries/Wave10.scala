package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-10 additions: the remaining nonparametric-testing family plus a
  * second differential-privacy release — Wilcoxon signed-rank (the
  * PAIRED "did the metric move?" test completing the
  * Mann-Whitney/Kruskal set), Friedman's blocked rank test (k
  * treatments judged within each calendar-day block — the "same panel,
  * many variants" design), and a differentially-private median via the
  * exponential mechanism with replayable PRF Gumbel noise (pairs with
  * q_dp_hist's Laplace release).
  *
  * Determinism: ranks are [[graft.operators.Ranks]] global ranks under
  * tie-broken total orders (or block-local row_numbers over
  * constant-size blocks), every statistic's integer core is exact, the
  * DP score is an exact dyadic multiple (×0.125) of an integer utility
  * plus round-8 PRF noise, and every query ends totally ordered.
  */
object Wave10 {

  /** Integer-cents quantization of the events `value` double. */
  private val CentsSpark =
    "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"
  private def centsSql = "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"

  /** Micros-per-day (q_sprt day bucketing). */
  private val DayUs = "86400000000"

  /** q_dp_quantile: bucket grid (fixed — every post-count stage is
    * metadata) and bucket width in cents of per-user total spend. */
  private val DpqBuckets = 20
  private val DpqWidth = 100000

  val queries: Map[String, Q] = strictMap(

    // WILCOXON SIGNED-RANK on paired daily (click − purchase) cents
    // totals: the paired two-sample test the A/B family still lacked.
    // ONE (day) shuffle builds the calendar-bounded pair list; zero
    // differences drop (the textbook rule); |d| ranks come from the
    // distributed Ranks selection under the total order (|d|, day); W⁺
    // and the tie-free normal approximation are exact-integer + one
    // identically-spelled float chain.
    "q_wilcoxon" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr(s"unix_micros(ts) DIV $DayUs AS day", "event_type",
          s"$CentsSpark AS cents")
        .groupBy("day")
        .agg((sum(when(col("event_type") === "click", col("cents"))
            .otherwise(0L)) -
          sum(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L))).as("d"))
        .where(col("d") =!= 0L)
        .withColumn("absd", abs(col("d")))
        .withColumn("kk", lit(1))
      graft.operators.Ranks.withinKey(daily, "kk", Seq("absd", "day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") > 0, col("rk")).otherwise(0L)).as("wplus"))
        .selectExpr("n", "wplus",
          "round((CAST(wplus AS DOUBLE)" +
            " - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)" +
            " / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)" +
            " * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0), 6) AS z")
    }),

    // FRIEDMAN blocked rank test: within each complete calendar-day
    // block, the k event types rank by daily cents (row_number over a
    // CONSTANT-k block — the one window in the family, bounded by k
    // rows per partition at any scale). Incomplete blocks (a day
    // missing some type) drop, per the textbook design. χ²_F rides the
    // exact-integer numerator G = 12·ΣR_j² − 3·n²·k·(k+1)² over the
    // n·k·(k+1) denominator — one float division at the end (ΣR_j² ≤
    // n²k³: DECIMAL(38,0) upgrade past n ≈ 10⁸ blocks, house note).
    "q_friedman" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr(s"unix_micros(ts) DIV $DayUs AS day", "event_type",
          s"$CentsSpark AS cents")
        .groupBy("day", "event_type")
        .agg(sum(col("cents")).as("c"))
      val k = daily.select("event_type").distinct().count()
      val complete = daily.groupBy("day")
        .agg(count(lit(1)).as("nt")).where(col("nt") === k)
        .select("day")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("day").orderBy("c", "event_type")
      val ranks = daily.join(complete, "day")
        .withColumn("rk", row_number().over(w))
      val rj = ranks.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("rk")).as("rj"))
      rj.agg(count(lit(1)).as("k"), max(col("n")).as("n"),
          sum(expr("rj * rj")).as("sr2"))
        .selectExpr("k", "n",
          "12 * sr2 - 3 * n * n * k * (k + 1) * (k + 1) AS g")
        .selectExpr("k", "n",
          "round(CAST(g AS DOUBLE) / (CAST(n AS DOUBLE) * k * (k + 1)), 6)" +
            " AS chi2_f")
    }),

    // DIFFERENTIALLY-PRIVATE MEDIAN of per-user total spend via the
    // EXPONENTIAL MECHANISM over a fixed bucket grid: utility u_b =
    // −|2·cum_b − n| (exact integer, sensitivity 2), score = 0.125·u_b
    // (an EXACT dyadic multiple — ε = 0.5, Δu = 2, so ε/(2Δu) = 2⁻³ and
    // the multiply is lossless in IEEE) plus replayable Gumbel noise
    // g_b = −ln(−ln(u)) from the same md5-PRF grid as q_dp_hist (inner
    // ln round-8 BEFORE the outer — both engines see identical
    // arguments). Argmax with smaller-bucket tie-break = the released
    // bucket. ONE data-scale count shuffle; the grid is metadata.
    "q_dp_quantile" -> ((s, dir) => {
      val b = table(s, dir, "events")
        .selectExpr("user_id", s"$CentsSpark AS cents")
        .groupBy("user_id").agg(sum(col("cents")).as("x"))
        .selectExpr(s"least(x DIV $DpqWidth, ${DpqBuckets - 1}) AS bkt")
        .groupBy("bkt").agg(count(lit(1)).as("nb"))
      val grid = s.range(DpqBuckets).select(col("id").as("bkt"))
        .join(b, Seq("bkt"), "left_outer")
        .selectExpr("bkt", "coalesce(nb, CAST(0 AS BIGINT)) AS nb")
      val tot = grid.agg(sum(col("nb")).as("n"))
      val cum = grid.alias("g")
        .join(grid.alias("h"), col("h.bkt") <= col("g.bkt"))
        .groupBy(col("g.bkt").as("bkt"), col("g.nb").as("nb"))
        .agg(sum(col("h.nb")).as("cum"))
      val scored = cum.crossJoin(broadcast(tot))
        .withColumn("u", expr("-abs(2 * cum - n)"))
        .withColumn("j", expr(
          "CAST(conv(substring(md5(concat('dpq:', CAST(bkt AS STRING))), 1, 8)," +
            " 16, 10) AS BIGINT) % 1000000"))
        .withColumn("lnu", expr(
          "round(ln(CAST(2*j + 1 AS DOUBLE) / 2000000.0), 8)"))
        .withColumn("gmb", expr("round(-ln(-lnu), 8)"))
        .withColumn("score", expr("round(0.125 * u + gmb, 8)"))
      val top = scored.orderBy(desc("score"), asc("bkt")).limit(1)
        .select(col("bkt").as("chosen"))
      scored.crossJoin(broadcast(top))
        .selectExpr("bkt", "nb", "cum", "u", "score",
          "CAST(bkt = chosen AS BOOLEAN) AS chosen")
        .orderBy("bkt")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_wilcoxon" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN $centsSql
         |             ELSE 0 END)
         |      - sum(CASE WHEN event_type = 'purchase' THEN $centsSql
         |             ELSE 0 END) AS BIGINT) AS d
         |  FROM events GROUP BY 1
         |),
         |nz AS (SELECT day, d, abs(d) AS absd FROM daily WHERE d <> 0),
         |r AS (
         |  SELECT d, row_number() OVER (ORDER BY absd, day) AS rk FROM nz
         |),
         |a AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN d > 0 THEN rk ELSE 0 END) AS BIGINT) AS wplus
         |  FROM r
         |)
         |SELECT CAST(n AS BIGINT) AS n, wplus,
         |  round((CAST(wplus AS DOUBLE)
         |    - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
         |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
         |    * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0), 6) AS z
         |FROM a""".stripMargin,

    "q_friedman" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, event_type,
         |    CAST(sum($centsSql) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |kk AS (SELECT count(DISTINCT event_type) AS k FROM daily),
         |complete AS (
         |  SELECT day FROM daily GROUP BY day
         |  HAVING count(*) = (SELECT k FROM kk)
         |),
         |ranks AS (
         |  SELECT d.event_type,
         |    row_number() OVER (PARTITION BY d.day
         |                       ORDER BY d.c, d.event_type) AS rk
         |  FROM daily d JOIN complete USING (day)
         |),
         |rj AS (
         |  SELECT event_type, count(*) AS n, CAST(sum(rk) AS BIGINT) AS rj
         |  FROM ranks GROUP BY event_type
         |),
         |a AS (
         |  SELECT count(*) AS k, CAST(max(n) AS BIGINT) AS n,
         |    CAST(sum(rj * rj) AS BIGINT) AS sr2
         |  FROM rj
         |)
         |SELECT CAST(k AS BIGINT) AS k, n,
         |  round(CAST(12 * sr2 - 3 * n * n * k * (k + 1) * (k + 1) AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * k * (k + 1)), 6) AS chi2_f
         |FROM a""".stripMargin,

    "q_dp_quantile" ->
      s"""WITH b AS (
         |  SELECT least(x // $DpqWidth, ${DpqBuckets - 1}) AS bkt,
         |    count(*) AS nb
         |  FROM (SELECT user_id, CAST(sum($centsSql) AS BIGINT) AS x
         |        FROM events GROUP BY user_id)
         |  GROUP BY 1
         |),
         |grid AS (
         |  SELECT g.f AS bkt, CAST(coalesce(b.nb, 0) AS BIGINT) AS nb
         |  FROM (SELECT CAST(unnest(range($DpqBuckets)) AS BIGINT) AS f) g
         |  LEFT JOIN b ON b.bkt = g.f
         |),
         |cum AS (
         |  SELECT g.bkt, g.nb, CAST(sum(h.nb) AS BIGINT) AS cum
         |  FROM grid g JOIN grid h ON h.bkt <= g.bkt
         |  GROUP BY g.bkt, g.nb
         |),
         |scored AS (
         |  SELECT bkt, nb, cum,
         |    -abs(2 * cum - (SELECT CAST(sum(nb) AS BIGINT) FROM grid)) AS u,
         |    ${hex2longSql("md5('dpq:' || CAST(bkt AS VARCHAR))", 1)} % 1000000 AS j
         |  FROM cum
         |),
         |noised AS (
         |  SELECT bkt, nb, cum, u,
         |    round(0.125 * u
         |      + round(-ln(-round(ln(CAST(2*j + 1 AS DOUBLE) / 2000000.0), 8)),
         |              8), 8) AS score
         |  FROM scored
         |),
         |top AS (SELECT bkt AS chosen FROM noised
         |        ORDER BY score DESC, bkt LIMIT 1)
         |SELECT bkt, nb, cum, u, score,
         |  bkt = (SELECT chosen FROM top) AS chosen
         |FROM noised ORDER BY bkt""".stripMargin,
  )
}
