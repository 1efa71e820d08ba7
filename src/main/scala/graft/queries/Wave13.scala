package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-13 additions: epidemiology-grade comparison statistics and
  * corpus-estimation primitives —
  *
  *  - two-arm log-rank test on time-to-first-purchase (the survival
  *    A/B read-out the Kaplan-Meier curve of q_survival stops short
  *    of: "is arm 1's conversion hazard actually different?"),
  *  - Mantel-Haenszel pooled odds ratio across language strata (the
  *    confounder-adjusted effect estimate behind every stratified
  *    quality audit — q_simpson shows the paradox, this is the
  *    estimator that resolves it),
  *  - Chapman capture-recapture audience estimate from two
  *    observation windows (estimate the CLOSED population you never
  *    fully observe — the coverage-estimation trick for "how many
  *    users/dup-pairs exist beyond what either window saw"),
  *  - Good-Turing frequency-of-frequencies smoothing over the corpus
  *    vocabulary (unseen-mass p₀ = N₁/N and the Turing-adjusted
  *    counts r* — the open-vocabulary accounting q_vocab_oov's raw
  *    OOV rate approximates),
  *  - temperature-based multilingual resampling weights (the XLM-R /
  *    mT5 α-sampling staple), at α = ½ so the power is an exact IEEE
  *    sqrt on BOTH engines — no cross-engine pow/exp hazard.
  *
  * Determinism: every statistic reduces to exact BIGINT counts off
  * one partial-agg'd shuffle; float chains are per-term round-8 →
  * decimal sum → terminal round, and the only transcendental is
  * sqrt (correctly rounded IEEE in both engines).
  */
object Wave13 {

  /** Censoring horizon (hours) for the log-rank arms — matches
    * q_survival's administrative-censoring contract. */
  private val Tau = 72L
  private val HourUs = 3600L * 1000000L
  private val DayUs = 24L * HourUs

  /** Outcome threshold for the Mantel-Haenszel 2×2 tables: "long
    * document" at roughly the corpus median length. */
  private val MhLen = 300L

  val queries: Map[String, Q] = strictMap(

    // TWO-ARM LOG-RANK TEST on time-to-first-purchase (censored at
    // Tau, the q_survival framing), arms = user_id parity. Per event
    // time t: O−E contribution d_t·n1_t/n_t and hypergeometric
    // variance d_t·n1_t·n0_t·(n_t−d_t)/(n_t²·(n_t−1)) from exact
    // BIGINT at-risk/death counts; z = (O₁−E₁)/√V one terminal chain.
    // Scale: ONE per-user shuffle builds the duration labels; the
    // at-risk cumulative windows run on the ≤ 2·(Tau+2)-row duration
    // grid, never the user table.
    "q_logrank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          (unix_micros(col("ts")) / HourUs).cast("long").as("h"))
      val u = e.groupBy("user_id").agg(min("h").as("fh"))
      val p = e.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("h").as("ph"))
      val lab = u.join(p, Seq("user_id"), "left")
        .select((col("user_id") % 2).cast("long").as("arm"),
          least(coalesce(col("ph") - col("fh"), lit(Tau + 1)), lit(Tau))
            .as("dur"),
          when(col("ph").isNotNull && col("ph") - col("fh") <= Tau, 1L)
            .otherwise(0L).as("death"))
      // ckpt: the duration grid has FIVE consumers (dur/arm distincts,
      // the grid join, armTot, risk) — unmaterialized, each re-executes
      // the per-user shuffle (plan audit: 27 Exchanges before)
      val byd = lab.groupBy("dur", "arm")
        .agg(count(lit(1)).as("n_tot"), sum("death").as("d")).ckpt()
      // full dur × arm grid: an arm absent at a duration still has an
      // at-risk count there, so the cumulative must see a 0 row
      val grid = byd.select("dur").distinct()
        .crossJoin(byd.select("arm").distinct())
        .join(byd, Seq("dur", "arm"), "left")
        .na.fill(0L, Seq("n_tot", "d")).ckpt()
      val armTot = grid.groupBy("arm").agg(sum("n_tot").as("n_arm"))
      val prev = Window.partitionBy("arm").orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val risk = grid.join(broadcast(armTot), Seq("arm"))
        .withColumn("n_risk",
          (col("n_arm") - coalesce(sum("n_tot").over(prev), lit(0L)))
            .cast("long"))
      val t = risk.groupBy("dur")
        .agg(sum("n_risk").as("nt"), sum("d").as("dt"),
          sum(when(col("arm") === 1L, col("n_risk")).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1L, col("d")).otherwise(0L)).as("d1"))
        .where(col("dt") > 0)
        .withColumn("eterm",
          expr("round(CAST(dt AS DOUBLE) * n1 / nt, 8)"))
        .withColumn("vterm", expr(
          "CASE WHEN nt > 1 THEN round(CAST(dt AS DOUBLE) * n1 * (nt - n1)" +
            " * (nt - dt) / (CAST(nt AS DOUBLE) * nt * (nt - 1)), 8)" +
            " ELSE CAST(0.0 AS DOUBLE) END"))
      val arms = armTot.groupBy()
        .agg(sum(when(col("arm") === 0L, col("n_arm")).otherwise(0L))
            .cast("long").as("n_arm0"),
          sum(when(col("arm") === 1L, col("n_arm")).otherwise(0L))
            .cast("long").as("n_arm1"))
      t.agg(sum("d1").cast("long").as("o1"),
          dsum(col("eterm"), 8).as("e1"), dsum(col("vterm"), 8).as("v"))
        .crossJoin(broadcast(arms))
        .selectExpr("n_arm0", "n_arm1", "o1", "round(e1, 6) AS e1",
          "round(v, 6) AS v",
          "round((o1 - e1) / sqrt(v), 6) AS z")
    }),

    // MANTEL-HAENSZEL pooled odds ratio across lang strata: exposure =
    // even-numbered source, outcome = n_chars > MhLen. OR_MH =
    // Σ(a·d/n) / Σ(b·c/n) with round-8 terms and decimal sums — the
    // confounder-adjusted single number behind q_simpson's paradox
    // audit. Per-stratum ORs ride along (NULL when a zero cell makes
    // them undefined). One count shuffle; the grid is |langs| rows.
    "q_mh_or" -> ((s, dir) => {
      // ckpt below: the cell grid feeds pooled AND the final projection —
      // unmaterialized, the corpus count shuffle runs twice
      val cell = table(s, dir, "documents")
        .select(col("lang"),
          expr("CAST(substring(source, 4) AS INT) % 2 = 0").as("ex"),
          (col("n_chars") > MhLen).as("oc"))
        .groupBy("lang").agg(
          sum(when(col("ex") && col("oc"), 1L).otherwise(0L)).as("a"),
          sum(when(col("ex") && !col("oc"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("ex") && col("oc"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("ex") && !col("oc"), 1L).otherwise(0L)).as("d"))
        .withColumn("n", (col("a") + col("b") + col("c") + col("d")))
        .withColumn("or_stratum", expr(
          "CASE WHEN b * c > 0 THEN" +
            " round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)" +
            " END"))
        .withColumn("rterm", expr("round(CAST(a AS DOUBLE) * d / n, 8)"))
        .withColumn("sterm", expr("round(CAST(b AS DOUBLE) * c / n, 8)"))
        .ckpt()
      val pooled = cell
        .agg(dsum(col("rterm"), 8).as("rr"), dsum(col("sterm"), 8).as("ss"))
        .selectExpr("round(rr / ss, 6) AS or_mh")
      cell.crossJoin(broadcast(pooled))
        .selectExpr("lang", "a", "b", "c", "d", "or_stratum", "or_mh")
        .orderBy("lang")
    }),

    // CHAPMAN CAPTURE-RECAPTURE estimate of the month's true active
    // audience from two week-long observation windows: N̂ =
    // (n₁+1)(n₂+1)/(m+1) − 1 (and the classic Lincoln-Petersen
    // n₁n₂/m), compared against the fully-observed truth. The same
    // estimator audits dedup-detector coverage (two independent
    // detectors' overlap → total dup population). ONE per-user
    // shuffle computes both marks and the truth; everything after is
    // a 1-row grid.
    "q_capture_recapture" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) / DayUs).cast("long").as("day"))
      val d0 = e.agg(min("day").as("d0"))
      val per = e.crossJoin(broadcast(d0))
        .select(col("user_id"), (col("day") - col("d0")).as("rd"))
        .groupBy("user_id").agg(
          max(when(col("rd") < 7, 1L).otherwise(0L)).as("ia"),
          max(when(col("rd") >= 7 && col("rd") < 14, 1L).otherwise(0L))
            .as("ib"))
      per.agg(sum("ia").cast("long").as("n1"),
          sum("ib").cast("long").as("n2"),
          sum(when(col("ia") === 1L && col("ib") === 1L, 1L).otherwise(0L))
            .cast("long").as("m"),
          count(lit(1)).as("n_true"))
        .selectExpr("n1", "n2", "m", "n_true",
          "round((CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1, 4)" +
            " AS chapman",
          "round(CAST(n1 AS DOUBLE) * n2 / m, 4) AS lincoln",
          "round(((CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1" +
            " - n_true) / n_true, 6) AS rel_err")
    }),

    // GOOD-TURING frequency-of-frequencies over corpus word TRIGRAMS
    // (the shingle unit of the dedup family — the synthetic unigram
    // vocabulary is a dense 31-word closed set with min count ≫ 10,
    // so the rare-count tail Good-Turing models only exists at the
    // n-gram level): N_r = |{trigram types seen exactly r times}|,
    // unseen probability mass p₀ = N₁/N, and the Turing-adjusted
    // count r* = (r+1)·N_{r+1}/N_r for r ≤ 10 (the small-r region
    // where the raw estimate is the recipe; beyond it N_r is sparse
    // and a fit takes over — documented contract). Scale: trigram
    // counts partial-agg one shuffle; the count-of-counts table has
    // |distinct r| rows — metadata at any corpus size.
    "q_good_turing" -> ((s, dir) => {
      import graft.operators.Tokenize
      val wc = table(s, dir, "documents")
        .select(split(col("text"), Tokenize.Delim).as("a"))
        .where(expr("size(a) >= 3"))
        .select(expr("explode(sequence(1, size(a) - 2))").as("i"), col("a"))
        .select(expr("element_at(a, i)").as("w1"),
          expr("element_at(a, i + 1)").as("w2"),
          expr("element_at(a, i + 2)").as("w3"))
        .where(Tokenize.keep(col("w1")) && Tokenize.keep(col("w2")) &&
          Tokenize.keep(col("w3")))
        .groupBy(concat_ws(" ", col("w1"), col("w2"), col("w3")).as("g"))
        .agg(count(lit(1)).as("r"))
      // ckpt: fof has THREE consumers (tot, the r+1 self-join, the final
      // projection) — unmaterialized, each re-runs the corpus trigram
      // explode (plan audit: 8 Exchanges before)
      val fof = wc.groupBy("r").agg(count(lit(1)).as("n_r")).ckpt()
      val tot = fof.agg(sum(expr("r * n_r")).cast("long").as("nn"),
        sum(when(col("r") === 1L, col("n_r")).otherwise(0L)).cast("long")
          .as("n1"))
      val nxt = fof.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
      fof.join(nxt, Seq("r"), "left")
        .crossJoin(broadcast(tot))
        .where(col("r") <= 10)
        .selectExpr("r", "n_r",
          "round(CAST(r + 1 AS DOUBLE) * coalesce(n_next, 0) / n_r, 6)" +
            " AS r_star",
          "round(CAST(n1 AS DOUBLE) / nn, 8) AS p0_unseen")
        .orderBy("r")
    }),

    // TEMPERATURE-BASED MULTILINGUAL RESAMPLING (the XLM-R / mT5
    // α-sampling recipe) at α = ½: p_l ∝ n_l^α flattens the language
    // distribution so low-resource langs up-sample. α = ½ makes the
    // power an exact IEEE sqrt (correctly rounded in BOTH engines) —
    // no cross-engine pow/exp drift; weights round-8, decimal-summed,
    // one terminal division each. Complements q_mix_sources (exact
    // target-ratio mixing): this derives the ratios FROM the corpus.
    // One |langs|-row aggregate; everything else metadata.
    "q_alpha_sampling" -> ((s, dir) => {
      // ckpt: nl feeds the weight sum, the total, and the final row —
      // three corpus scans without it
      val nl = table(s, dir, "documents").groupBy("lang")
        .agg(sum("n_chars").cast("long").as("n_l")).ckpt()
      val wsum = nl
        .select(expr("round(sqrt(CAST(n_l AS DOUBLE)), 8)").as("w"))
        .agg(dsum(col("w"), 8).as("sw"))
      val tot = nl.agg(sum("n_l").cast("long").as("nn"))
      nl.crossJoin(broadcast(wsum)).crossJoin(broadcast(tot))
        .selectExpr("lang", "n_l",
          "round(CAST(n_l AS DOUBLE) / nn, 8) AS share",
          "round(round(sqrt(CAST(n_l AS DOUBLE)), 8) / sw, 8) AS p_alpha",
          "round(round(sqrt(CAST(n_l AS DOUBLE)), 8) / sw" +
            " / (CAST(n_l AS DOUBLE) / nn), 6) AS boost")
        .orderBy("lang")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_logrank" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    CAST(epoch_us(ts) // $HourUs AS BIGINT) AS h
         |  FROM events
         |),
         |u AS (SELECT user_id, min(h) AS fh FROM e GROUP BY user_id),
         |p AS (SELECT user_id, min(h) AS ph FROM e
         |      WHERE event_type = 'purchase' GROUP BY user_id),
         |lab AS (
         |  SELECT CAST(u.user_id % 2 AS BIGINT) AS arm,
         |    least(coalesce(p.ph - u.fh, ${Tau + 1}), $Tau) AS dur,
         |    CASE WHEN p.ph IS NOT NULL AND p.ph - u.fh <= $Tau
         |      THEN 1 ELSE 0 END AS death
         |  FROM u LEFT JOIN p ON p.user_id = u.user_id
         |),
         |byd AS (
         |  SELECT dur, arm, count(*) AS n_tot, sum(death) AS d
         |  FROM lab GROUP BY dur, arm
         |),
         |grid AS (
         |  SELECT ds.dur, ar.arm,
         |    coalesce(byd.n_tot, 0) AS n_tot, coalesce(byd.d, 0) AS d
         |  FROM (SELECT DISTINCT dur FROM byd) ds
         |  CROSS JOIN (SELECT DISTINCT arm FROM byd) ar
         |  LEFT JOIN byd ON byd.dur = ds.dur AND byd.arm = ar.arm
         |),
         |at AS (SELECT arm, CAST(sum(n_tot) AS BIGINT) AS n_arm
         |       FROM grid GROUP BY arm),
         |risk AS (
         |  SELECT grid.*, at.n_arm,
         |    CAST(at.n_arm - coalesce(sum(grid.n_tot) OVER (
         |      PARTITION BY grid.arm ORDER BY grid.dur
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS n_risk
         |  FROM grid JOIN at ON at.arm = grid.arm
         |),
         |t AS (
         |  SELECT dur, sum(n_risk) AS nt, sum(d) AS dt,
         |    sum(CASE WHEN arm = 1 THEN n_risk ELSE 0 END) AS n1,
         |    sum(CASE WHEN arm = 1 THEN d ELSE 0 END) AS d1
         |  FROM risk GROUP BY dur
         |),
         |tt AS (
         |  SELECT *,
         |    round(CAST(dt AS DOUBLE) * n1 / nt, 8) AS eterm,
         |    CASE WHEN nt > 1 THEN round(CAST(dt AS DOUBLE) * n1 * (nt - n1)
         |      * (nt - dt) / (CAST(nt AS DOUBLE) * nt * (nt - 1)), 8)
         |      ELSE CAST(0.0 AS DOUBLE) END AS vterm
         |  FROM t WHERE dt > 0
         |),
         |arms AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN n_arm ELSE 0 END) AS BIGINT)
         |      AS n_arm0,
         |    CAST(sum(CASE WHEN arm = 1 THEN n_arm ELSE 0 END) AS BIGINT)
         |      AS n_arm1
         |  FROM at
         |),
         |s AS (
         |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         |    ${dsumSql("eterm", 8)} AS e1, ${dsumSql("vterm", 8)} AS v
         |  FROM tt
         |)
         |SELECT n_arm0, n_arm1, o1, round(e1, 6) AS e1, round(v, 6) AS v,
         |  round((o1 - e1) / sqrt(v), 6) AS z
         |FROM s CROSS JOIN arms""".stripMargin,

    "q_mh_or" ->
      s"""WITH cell AS (
         |  SELECT lang,
         |    CAST(sum(CASE WHEN ex AND oc THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN ex AND NOT oc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b,
         |    CAST(sum(CASE WHEN NOT ex AND oc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c,
         |    CAST(sum(CASE WHEN NOT ex AND NOT oc THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM (
         |    SELECT lang, CAST(substr(source, 4) AS INT) % 2 = 0 AS ex,
         |      n_chars > $MhLen AS oc
         |    FROM documents
         |  ) GROUP BY lang
         |),
         |w AS (
         |  SELECT *, a + b + c + d AS n,
         |    CASE WHEN b * c > 0 THEN
         |      round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
         |      END AS or_stratum,
         |    round(CAST(a AS DOUBLE) * d / (a + b + c + d), 8) AS rterm,
         |    round(CAST(b AS DOUBLE) * c / (a + b + c + d), 8) AS sterm
         |  FROM cell
         |),
         |pooled AS (
         |  SELECT round(${dsumSql("rterm", 8)} / ${dsumSql("sterm", 8)}, 6)
         |    AS or_mh
         |  FROM w
         |)
         |SELECT lang, a, b, c, d, or_stratum, or_mh
         |FROM w CROSS JOIN pooled ORDER BY lang""".stripMargin,

    "q_capture_recapture" ->
      s"""WITH e AS (
         |  SELECT user_id, CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day
         |  FROM events
         |),
         |d0 AS (SELECT min(day) AS d0 FROM e),
         |per AS (
         |  SELECT user_id,
         |    max(CASE WHEN day - (SELECT d0 FROM d0) < 7
         |      THEN 1 ELSE 0 END) AS ia,
         |    max(CASE WHEN day - (SELECT d0 FROM d0) >= 7
         |      AND day - (SELECT d0 FROM d0) < 14 THEN 1 ELSE 0 END) AS ib
         |  FROM e GROUP BY user_id
         |),
         |s AS (
         |  SELECT CAST(sum(ia) AS BIGINT) AS n1,
         |    CAST(sum(ib) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS m,
         |    CAST(count(*) AS BIGINT) AS n_true
         |  FROM per
         |)
         |SELECT n1, n2, m, n_true,
         |  round((CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1, 4)
         |    AS chapman,
         |  round(CAST(n1 AS DOUBLE) * n2 / m, 4) AS lincoln,
         |  round(((CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1
         |    - n_true) / n_true, 6) AS rel_err
         |FROM s""".stripMargin,

    "q_good_turing" ->
      s"""WITH t AS (
         |  SELECT regexp_split_to_array(text, '$DelimSql') AS a FROM documents
         |),
         |g3 AS (
         |  SELECT a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2,
         |    a[CAST(i AS INT) + 2] AS w3
         |  FROM (SELECT a, unnest(generate_series(1, len(a) - 2)) AS i
         |        FROM t WHERE len(a) >= 3)
         |),
         |wc AS (
         |  SELECT w1 || ' ' || w2 || ' ' || w3 AS g, count(*) AS r
         |  FROM g3
         |  WHERE regexp_matches(lower(w1), '${graft.operators.Tokenize.KeepRegex}')
         |    AND regexp_matches(lower(w2), '${graft.operators.Tokenize.KeepRegex}')
         |    AND regexp_matches(lower(w3), '${graft.operators.Tokenize.KeepRegex}')
         |  GROUP BY 1
         |),
         |fof AS (SELECT CAST(r AS BIGINT) AS r, count(*) AS n_r
         |        FROM wc GROUP BY r),
         |tot AS (
         |  SELECT CAST(sum(r * n_r) AS BIGINT) AS nn,
         |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
         |  FROM fof
         |)
         |SELECT fof.r, CAST(fof.n_r AS BIGINT) AS n_r,
         |  round(CAST(fof.r + 1 AS DOUBLE) * coalesce(nxt.n_r, 0)
         |    / fof.n_r, 6) AS r_star,
         |  round(CAST(tot.n1 AS DOUBLE) / tot.nn, 8) AS p0_unseen
         |FROM fof
         |LEFT JOIN fof nxt ON nxt.r = fof.r + 1
         |CROSS JOIN tot
         |WHERE fof.r <= 10
         |ORDER BY fof.r""".stripMargin,

    "q_alpha_sampling" ->
      s"""WITH nl AS (
         |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_l
         |  FROM documents GROUP BY lang
         |),
         |ws AS (
         |  SELECT ${dsumSql("round(sqrt(CAST(n_l AS DOUBLE)), 8)", 8)} AS sw
         |  FROM nl
         |),
         |tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS nn FROM nl)
         |SELECT lang, n_l,
         |  round(CAST(n_l AS DOUBLE) / nn, 8) AS share,
         |  round(round(sqrt(CAST(n_l AS DOUBLE)), 8) / sw, 8) AS p_alpha,
         |  round(round(sqrt(CAST(n_l AS DOUBLE)), 8) / sw
         |    / (CAST(n_l AS DOUBLE) / nn), 6) AS boost
         |FROM nl CROSS JOIN ws CROSS JOIN tot
         |ORDER BY lang""".stripMargin,
  )
}
