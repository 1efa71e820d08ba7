package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-11 additions: the launch-decision corner of an experimentation
  * pipeline — TOST equivalence testing (the "prove it did NOT move"
  * gate, dual to the significance tests), per-source KL divergence from
  * the corpus language mix (the domain-drift monitor a curation
  * pipeline watches between crawls), and delete-one-bucket jackknife
  * variance of a ratio metric (the standard error experimentation
  * platforms actually ship for ratio metrics, where the naive i.i.d.
  * formula is wrong).
  *
  * Determinism: every mean/ratio comes from exact integer power sums,
  * KL terms are round-8 ln of exact smoothed rationals decimal-summed,
  * and jackknife pseudo-deviations are round-12 from identical float
  * chains — every query ends bounded and totally ordered.
  */
object Wave11 {

  /** Integer-cents quantization of the events `value` double. */
  private val CentsSpark =
    "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"
  private def centsSql = "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"

  /** q_tost: equivalence margin (cents) and the one-sided z critical
    * value at α = 0.05 — fixed literals, identical in both engines. */
  private val TostDelta = "25.0"
  private val TostZa = "1.645"

  /** q_jackknife: delete-one bucket count (fixed grid — the jackknife
    * loop is metadata at any scale). */
  private val JkBuckets = 20

  val queries: Map[String, Q] = strictMap(

    // TOST equivalence gate on purchase value between the two id-parity
    // variants: H0 "they differ by ≥ δ" rejected iff BOTH one-sided z
    // tests clear the α = 0.05 critical value — the launch-decision dual
    // of q_ttest ("is the new variant the same within δ?"). ONE
    // partial-agg'd power-sum shuffle (n, Σx, Σx² per arm, all exact
    // BIGINTs); means/variances/z are one identically-spelled float
    // chain over the 2-row grid. Welch (unpooled) standard error.
    "q_tost" -> ((s, dir) => {
      val g = table(s, dir, "events")
        .where(col("event_type") === "purchase")
        .selectExpr("user_id % 2 AS variant", s"$CentsSpark AS x")
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
      g.agg(
          max(when(col("variant") === 0, struct(col("n"), col("sx"),
            col("sxx")))).as("a"),
          max(when(col("variant") === 1, struct(col("n"), col("sx"),
            col("sxx")))).as("b"))
        .selectExpr("a.n AS n0", "b.n AS n1",
          "CAST(a.sx AS DOUBLE) / a.n AS m0",
          "CAST(b.sx AS DOUBLE) / b.n AS m1",
          // unbiased per-arm variance from the exact power sums
          "(CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * a.sx / a.n)" +
            " / (a.n - 1) AS v0",
          "(CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * b.sx / b.n)" +
            " / (b.n - 1) AS v1")
        .selectExpr("n0", "n1", "round(m0, 4) AS m0", "round(m1, 4) AS m1",
          "m1 - m0 AS diff", "sqrt(v0 / n0 + v1 / n1) AS se")
        .selectExpr("n0", "n1", "m0", "m1",
          s"round((diff + $TostDelta) / se, 6) AS z_low",
          s"round((diff - $TostDelta) / se, 6) AS z_high")
        .selectExpr("n0", "n1", "m0", "m1", "z_low", "z_high",
          s"CASE WHEN z_low >= $TostZa AND z_high <= -$TostZa" +
            " THEN 'equivalent' ELSE 'not_equivalent' END AS verdict")
    }),

    // KL DOMAIN DRIFT: per source, KL(P_source(lang) ‖ P_corpus(lang))
    // with add-1 smoothing over the |langs| global alphabet — the
    // "did this crawl slice drift from the corpus mix?" monitor. ONE
    // (source, lang) contingency shuffle; the |sources|×|langs| grid and
    // both smoothed distributions are metadata. Every term is round-8 ln
    // of exact integer rationals, decimal-summed, so KL ≥ 0 holds
    // exactly and the ordering is engine-invariant.
    "q_kl_drift" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val cell = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val langs = d.select("lang").distinct()
      val nl = langs.count()
      val corpus = d.groupBy("lang").agg(count(lit(1)).as("cl"))
      val ns = d.groupBy("source").agg(count(lit(1)).as("nsrc"))
      val n = d.count()
      // full source×lang grid (absent cells smooth to count 0)
      val grid = ns.crossJoin(broadcast(langs))
        .join(cell, Seq("source", "lang"), "left_outer")
        .selectExpr("source", "lang", "nsrc",
          "coalesce(c, CAST(0 AS BIGINT)) AS c")
      grid.join(broadcast(corpus), Seq("lang"))
        .withColumn("t", expr(
          s"round((CAST(c AS DOUBLE) + 1.0) / (nsrc + $nl)" +
            s" * ln(((CAST(c AS DOUBLE) + 1.0) / (nsrc + $nl))" +
            s" / ((CAST(cl AS DOUBLE) + 1.0) / (${n}.0 + $nl))), 8)"))
        .groupBy("source")
        .agg(max(col("nsrc")).as("n_docs"), dsum(col("t"), 8).as("kl"))
        .selectExpr("source", "n_docs", "round(kl, 6) AS kl")
        .orderBy(desc("kl"), asc("source"))
    }),

    // JACKKNIFE standard error of a ratio metric (purchase-to-click
    // cents): users hash into JkBuckets fixed buckets (md5 PRF — stable
    // under repartitioning); per-bucket numerator/denominator sums are
    // exact BIGINTs off ONE shuffle; the delete-one loop is the
    // B-row metadata grid — r_(i) = (S_p − p_i)/(S_c − c_i), var =
    // (B−1)/B · Σ(r_(i) − r̄)². THE standard error for ratio metrics
    // (the i.i.d. formula ignores the shared denominator); round-12
    // pseudo-deviations, decimal-summed.
    "q_jackknife" -> ((s, dir) => {
      val b = table(s, dir, "events")
        .selectExpr("user_id", "event_type", s"$CentsSpark AS cents")
        .where(col("event_type").isin("click", "purchase"))
        .selectExpr(
          s"CAST(conv(substring(md5(concat('jk:', CAST(user_id AS STRING))), 1, 8)," +
            s" 16, 10) AS BIGINT) % $JkBuckets AS bkt",
          "CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END AS p",
          "CASE WHEN event_type = 'click' THEN cents ELSE 0 END AS c")
        .groupBy("bkt")
        .agg(sum(col("p")).as("pi"), sum(col("c")).as("ci"))
      val tot = b.agg(sum(col("pi")).as("sp"), sum(col("ci")).as("sc"),
        count(lit(1)).as("nb"))
      val loo = b.crossJoin(broadcast(tot))
        .selectExpr("bkt", "nb", "sp", "sc",
          "CAST(sp - pi AS DOUBLE) / CAST(sc - ci AS DOUBLE) AS r")
      val rbar = loo.agg(dsum(expr("round(r, 12)"), 12).as("sr"),
        max(col("nb")).as("nb"))
        .selectExpr("CAST(sr AS DOUBLE) / nb AS rbar")
      loo.crossJoin(broadcast(rbar))
        .withColumn("d2", expr("round((r - rbar) * (r - rbar), 12)"))
        .agg(max(col("nb")).as("b"), max(expr(
          "round(CAST(sp AS DOUBLE) / CAST(sc AS DOUBLE), 6)")).as("ratio"),
          dsum(col("d2"), 12).as("sd2"))
        .selectExpr("b", "ratio",
          "round(sqrt((CAST(b AS DOUBLE) - 1.0) / CAST(b AS DOUBLE)" +
            " * sd2), 6) AS se_jk")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_tost" ->
      s"""WITH g AS (
         |  SELECT user_id % 2 AS variant, count(*) AS n,
         |    CAST(sum($centsSql) AS BIGINT) AS sx,
         |    CAST(sum($centsSql * $centsSql) AS BIGINT) AS sxx
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |),
         |w AS (
         |  SELECT
         |    max(CASE WHEN variant = 0 THEN n END) AS n0,
         |    max(CASE WHEN variant = 1 THEN n END) AS n1,
         |    max(CASE WHEN variant = 0 THEN CAST(sx AS DOUBLE) / n END) AS m0,
         |    max(CASE WHEN variant = 1 THEN CAST(sx AS DOUBLE) / n END) AS m1,
         |    max(CASE WHEN variant = 0 THEN
         |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
         |      END) AS v0,
         |    max(CASE WHEN variant = 1 THEN
         |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
         |      END) AS v1
         |  FROM g
         |),
         |z AS (
         |  SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
         |    round(m0, 4) AS m0, round(m1, 4) AS m1,
         |    round((m1 - m0 + $TostDelta) / sqrt(v0 / n0 + v1 / n1), 6) AS z_low,
         |    round((m1 - m0 - $TostDelta) / sqrt(v0 / n0 + v1 / n1), 6) AS z_high
         |  FROM w
         |)
         |SELECT n0, n1, m0, m1, z_low, z_high,
         |  CASE WHEN z_low >= $TostZa AND z_high <= -$TostZa
         |  THEN 'equivalent' ELSE 'not_equivalent' END AS verdict
         |FROM z""".stripMargin,

    "q_kl_drift" ->
      s"""WITH cell AS (
         |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
         |),
         |langs AS (SELECT DISTINCT lang FROM documents),
         |nl AS (SELECT count(*) AS nl FROM langs),
         |corpus AS (SELECT lang, count(*) AS cl FROM documents GROUP BY lang),
         |ns AS (SELECT source, count(*) AS nsrc FROM documents GROUP BY source),
         |n AS (SELECT count(*) AS n FROM documents),
         |grid AS (
         |  SELECT ns.source, langs.lang, ns.nsrc,
         |    CAST(coalesce(cell.c, 0) AS BIGINT) AS c
         |  FROM ns CROSS JOIN langs
         |  LEFT JOIN cell ON cell.source = ns.source AND cell.lang = langs.lang
         |),
         |t AS (
         |  SELECT g.source, g.nsrc,
         |    round((CAST(g.c AS DOUBLE) + 1.0) / (g.nsrc + nl.nl)
         |      * ln(((CAST(g.c AS DOUBLE) + 1.0) / (g.nsrc + nl.nl))
         |      / ((CAST(co.cl AS DOUBLE) + 1.0) / (CAST(n.n AS DOUBLE) + nl.nl))),
         |      8) AS t
         |  FROM grid g
         |  JOIN corpus co ON co.lang = g.lang
         |  CROSS JOIN nl CROSS JOIN n
         |)
         |SELECT source, CAST(max(nsrc) AS BIGINT) AS n_docs,
         |  round(${dsumSql("t", 8)}, 6) AS kl
         |FROM t GROUP BY source
         |ORDER BY kl DESC, source""".stripMargin,

    "q_jackknife" ->
      s"""WITH b AS (
         |  SELECT ${hex2longSql("md5('jk:' || CAST(user_id AS VARCHAR))", 1)}
         |      % $JkBuckets AS bkt,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN $centsSql
         |             ELSE 0 END) AS BIGINT) AS pi,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN $centsSql
         |             ELSE 0 END) AS BIGINT) AS ci
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1
         |),
         |tot AS (
         |  SELECT CAST(sum(pi) AS BIGINT) AS sp, CAST(sum(ci) AS BIGINT) AS sc,
         |    count(*) AS nb
         |  FROM b
         |),
         |loo AS (
         |  SELECT bkt, nb, sp, sc,
         |    CAST(sp - pi AS DOUBLE) / CAST(sc - ci AS DOUBLE) AS r
         |  FROM b CROSS JOIN tot
         |),
         |rb AS (
         |  SELECT ${dsumSql("round(r, 12)", 12)} / max(nb) AS rbar FROM loo
         |),
         |d AS (
         |  SELECT loo.nb, loo.sp, loo.sc,
         |    round((loo.r - rb.rbar) * (loo.r - rb.rbar), 12) AS d2
         |  FROM loo CROSS JOIN rb
         |)
         |SELECT CAST(max(nb) AS BIGINT) AS b,
         |  max(round(CAST(sp AS DOUBLE) / CAST(sc AS DOUBLE), 6)) AS ratio,
         |  round(sqrt((CAST(max(nb) AS DOUBLE) - 1.0) / CAST(max(nb) AS DOUBLE)
         |    * ${dsumSql("d2", 12)}), 6) AS se_jk
         |FROM d""".stripMargin,
  )
}
