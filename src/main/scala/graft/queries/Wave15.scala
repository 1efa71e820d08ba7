package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-15 additions: agreement / trend / paired-test statistics and
  * optimal sampling design —
  *
  *  - Cohen's kappa between the stopword lang-id heuristic
  *    (q_lang_id's EXACT argmax, reused — no drift) and the true
  *    lang label: the chance-corrected agreement score every
  *    classifier audit reports where raw accuracy misleads,
  *  - Cochran-Armitage trend test: is purchase propensity MONOTONE
  *    in activity dose (the ordered-exposure question a flat k-group
  *    ANOVA can't answer),
  *  - McNemar's paired test between two document-quality filters on
  *    the SAME corpus — only the discordant cells carry information
  *    (the "is filter B actually stricter?" calibration),
  *  - Neyman-optimal allocation of a labeling budget across language
  *    strata (n_h ∝ N_h·S_h — variance-proportional, not
  *    size-proportional), integerized by the exact largest-remainder
  *    scheme q_token_budget established.
  *
  * Determinism: all counts exact BIGINTs off one partial-agg'd
  * shuffle each; cross-multiplied integer forms in 128-bit DECIMAL
  * where products pass int64 (the q_chi2 lesson); squares taken in
  * DOUBLE where the operand itself can reach ~10¹⁰; terminal float
  * chains spelled identically in both engines.
  */
object Wave15 {

  /** Labeling budget for the Neyman allocation. */
  private val NeyB = 10000L

  /** Cochran-Armitage exposure: dose = clamp((n_ev − Lo) DIV W, 0, Cap)
    * — per-user event counts concentrate in ~[45, 99] at every SF, so
    * the offset/width spread them over 4 real dose levels; the outcome
    * is the RARE event (high-value purchase), not "any purchase",
    * which saturates (every user buys something → X = N and the
    * variance term is 0). */
  private val CaCap = 3L
  private val CaLo = 40L
  private val CaWidth = 15L
  private val CaVal = 250.0

  /** McNemar filter thresholds: A = long doc, B = many words. */
  private val McLen = 300L
  private val McWords = 59L

  val queries: Map[String, Q] = strictMap(

    // COHEN'S KAPPA of the stopword lang-id heuristic vs the true
    // label, over docs with ≥ 1 kept token (the heuristic's domain —
    // zh docs surface only if they tokenize; pred never says 'zh',
    // which is exactly what kappa should punish). κ = (p_o − p_e) /
    // (1 − p_e): p_o from the exact diagonal, p_e = Σ_c row_c·col_c
    // / N² with round-8 terms and DOUBLE casts BEFORE the margin
    // product (row·col wraps int64 past ~3e9 docs). One tokenize
    // shuffle + one confusion count; the grid is |classes|² rows.
    "q_cohens_kappa" -> ((s, dir) => {
      val scoreAggs = LlmOps.Stops.map { case (lang, words) =>
        sum(expr(s"CASE WHEN word IN ${LlmOps.inList(words)} THEN 1" +
          " ELSE 0 END")).cast("long").as(s"s_$lang")
      }
      val pred = corpusToks(s, dir).groupBy("doc_id")
        .agg(scoreAggs.head, scoreAggs.tail: _*)
        .withColumn("pred", expr(LlmOps.PredCase))
        .select("doc_id", "pred")
      // ckpt: the confusion grid has FIVE consumers (total, row/col
      // margins, diagonal, final projection) — unmaterialized, each
      // re-runs the corpus tokenize (plan audit: 19 Exchanges before)
      val conf = table(s, dir, "documents").select("doc_id", "lang")
        .join(pred, Seq("doc_id"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n")).ckpt()
      val tot = conf.agg(sum("n").cast("long").as("nn"))
      val rows = conf.groupBy("lang").agg(sum("n").as("r"))
      val cols = conf.groupBy(col("pred").as("lang")).agg(sum("n").as("cc"))
      val po = conf.where(col("lang") === col("pred"))
        .agg(sum("n").cast("long").as("diag"))
      val pe = rows.join(cols, Seq("lang"))
        .crossJoin(broadcast(tot))
        .withColumn("t", expr(
          "round(CAST(r AS DOUBLE) * cc / (CAST(nn AS DOUBLE) * nn), 8)"))
        .agg(dsum(col("t"), 8).as("pe"))
      val scal = po.crossJoin(broadcast(pe)).crossJoin(broadcast(tot))
        .selectExpr("round(CAST(diag AS DOUBLE) / nn, 8) AS po", "pe",
          "round((CAST(diag AS DOUBLE) / nn - pe) / (1.0 - pe), 6)" +
            " AS kappa")
      conf.crossJoin(broadcast(scal))
        .selectExpr("lang", "pred", "n", "po", "pe", "kappa")
        .orderBy("lang", "pred")
    }),

    // COCHRAN-ARMITAGE trend test: dose = capped activity bucket
    // (n_events DIV width, ≤ CaCap), outcome = ever purchased.
    // T = Σ w_d(x_d·N − n_d·X) and A = N·Σn_d w² − (Σn_d w)² EXACT
    // in DECIMAL(38,0) (x·N alone wraps int64 past ~3e9 users);
    // z² = N·T²/(X(N−X)A) is ONE identical DOUBLE chain (T² would
    // overflow even 128-bit at extreme scale — the documented
    // boundary where exactness hands over to deterministic IEEE).
    // One per-user shuffle; the dose grid is ≤ CaCap+1 rows.
    "q_cochran_armitage" -> ((s, dir) => {
      val per = table(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "purchase" && col("value") > CaVal,
            1L).otherwise(0L)).as("y"))
      // ckpt: the dose grid feeds the totals, the trend terms, and the
      // final projection — three per-user shuffles without it
      val g = per
        .select(expr(s"least($CaCap, greatest(0, (n_ev - $CaLo)" +
          s" DIV $CaWidth))").as("d"), col("y"))
        .groupBy("d").agg(count(lit(1)).as("n"), sum("y").as("x")).ckpt()
      val tot = broadcast(g.agg(sum("n").cast("long").as("nt"),
        sum("x").cast("long").as("xt")))
      val terms = g.crossJoin(tot)
        .withColumn("tterm", expr(
          "d * (CAST(x AS DECIMAL(38,0)) * nt" +
            " - CAST(n AS DECIMAL(38,0)) * xt)"))
        .withColumn("nw", expr("CAST(n AS DECIMAL(38,0)) * d"))
        .withColumn("nw2", expr("CAST(n AS DECIMAL(38,0)) * d * d"))
      val scal = terms.agg(sum("tterm").as("tt"), sum("nw").as("snw"),
          sum("nw2").as("snw2"), max("nt").as("nt"), max("xt").as("xt"))
        .withColumn("aa", expr("CAST(nt AS DECIMAL(38,0)) * snw2" +
          " - snw * snw"))
        // saturated outcome (X = 0 or X = N) or a single dose level
        // (A = 0) has no trend information — z is 0 by contract, not ∞
        .withColumn("den", expr("CAST(xt AS DOUBLE)" +
          " * CAST(nt - xt AS DOUBLE) * CAST(aa AS DOUBLE)"))
        .selectExpr("round(CAST(tt AS DOUBLE), 4) AS t_stat",
          "CASE WHEN den > 0 THEN round(CAST(nt AS DOUBLE)" +
            " * CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / den, 6)" +
            " ELSE CAST(0.0 AS DOUBLE) END AS z2",
          "CASE WHEN den > 0 THEN" +
            " round(CAST(CASE WHEN tt < 0 THEN -1 ELSE 1 END AS DOUBLE)" +
            " * sqrt(CAST(nt AS DOUBLE) * CAST(tt AS DOUBLE)" +
            " * CAST(tt AS DOUBLE) / den), 6)" +
            " ELSE CAST(0.0 AS DOUBLE) END AS z")
      g.crossJoin(broadcast(scal))
        .selectExpr("d", "n", "x",
          "round(CAST(x AS DOUBLE) / n, 6) AS rate",
          "t_stat", "z2", "z")
        .orderBy("d")
    }),

    // McNEMAR'S PAIRED TEST between two quality filters on the same
    // docs (A = n_chars > McLen, B = space-separated word count >
    // McWords — both pure length arithmetic, engine-identical): the
    // marginal-homogeneity χ² lives ONLY on the discordant cells,
    // χ²_cc = (|b−c|−1)²/(b+c) with Edwards' continuity correction,
    // the square in DOUBLE. One narrow corpus pass → a single 2×2.
    "q_mcnemar" -> ((s, dir) =>
      table(s, dir, "documents")
        .select((col("n_chars") > McLen).as("fa"),
          (expr("length(text) - length(replace(text, ' ', ''))")
            >= McWords).as("fb"))
        .agg(sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("a"),
          sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("fa") && !col("fb"), 1L).otherwise(0L)).as("d"))
        .selectExpr("a", "b", "c", "d",
          "CASE WHEN b + c > 0 THEN round(CAST(abs(b - c) - 1 AS DOUBLE)" +
            " * CAST(abs(b - c) - 1 AS DOUBLE) / (b + c), 6)" +
            " ELSE CAST(0.0 AS DOUBLE) END AS chi2_cc",
          "CAST(CASE WHEN b + c > 0 AND CAST(abs(b - c) - 1 AS DOUBLE)" +
            " * CAST(abs(b - c) - 1 AS DOUBLE) / (b + c) > 3.841" +
            " THEN 1 ELSE 0 END AS BIGINT) AS differs")),

    // NEYMAN-OPTIMAL ALLOCATION of a labeling budget across language
    // strata: n_h ∝ N_h·S_h (big AND variable strata get labels —
    // the design that minimizes the estimator variance at fixed
    // cost). S_h from EXACT 128-bit power sums (N·Σx² − (Σx)²
    // wraps int64 past ~10⁵ docs·10⁶ chars), round-8 sqrt; weights
    // quantized to integer milli-units so the largest-remainder
    // integerization is the exact q_token_budget arithmetic (Σ alloc
    // = B by construction, spec-pinned). One count shuffle; the
    // allocation grid is |langs| rows.
    "q_neyman_alloc" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = table(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_h"),
          sum(col("n_chars").cast("decimal(38,0)")).cast("decimal(38,0)")
            .as("sx"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
        .withColumn("sigma", expr(
          "round(sqrt(CAST(CAST(n_h AS DECIMAL(38,0)) * sxx - sx * sx" +
            " AS DOUBLE) / (CAST(n_h AS DOUBLE) * n_h)), 8)"))
        .withColumn("w", expr(
          "CAST(floor(n_h * sigma * 1000 + 0.5) AS BIGINT)"))
        // ckpt: the weight grid feeds the weight total AND the quota rows
        .ckpt()
      val tot = broadcast(g.agg(sum("w").as("wt")))
      val q = g.crossJoin(tot)
        .withColumn("base", expr(s"($NeyB * w) div wt"))
        .withColumn("rem", expr(s"($NeyB * w) % wt"))
        // ckpt: feeds the leftover count AND the ranked distribution
        .ckpt()
      val extra = broadcast(q.agg((lit(NeyB) - sum(col("base"))).as("ex")))
      q.withColumn("rnk", row_number()
          .over(Window.orderBy(desc("rem"), asc("lang"))).cast("long"))
        .crossJoin(extra)
        .withColumn("alloc", col("base") +
          when(col("rnk") <= col("ex"), 1L).otherwise(0L))
        .selectExpr("lang", "n_h", "sigma", "CAST(alloc AS BIGINT) AS alloc")
        .orderBy("lang")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_cohens_kappa" -> {
      val scores = LlmOps.Stops.map { case (lang, words) =>
        s"CAST(sum(CASE WHEN word IN ${LlmOps.inList(words)} THEN 1" +
          s" ELSE 0 END) AS BIGINT) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH ${Reference.ToksSql},
         |sc AS (
         |  SELECT doc_id,
         |    $scores
         |  FROM toks GROUP BY doc_id
         |),
         |pred AS (
         |  SELECT doc_id, ${LlmOps.PredCase.replace("\n", "\n  ")} AS pred
         |  FROM sc
         |),
         |conf AS (
         |  SELECT d.lang, p.pred, count(*) AS n
         |  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
         |  GROUP BY 1, 2
         |),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM conf),
         |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS r FROM conf
         |      GROUP BY lang),
         |c AS (SELECT pred AS lang, CAST(sum(n) AS BIGINT) AS cc FROM conf
         |      GROUP BY pred),
         |po AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS diag
         |       FROM conf WHERE lang = pred),
         |pe AS (
         |  SELECT ${dsumSql(
        "round(CAST(r.r AS DOUBLE) * c.cc / (CAST(tot.nn AS DOUBLE) * tot.nn), 8)",
        8)} AS pe
         |  FROM r JOIN c USING (lang) CROSS JOIN tot
         |),
         |scal AS (
         |  SELECT round(CAST(diag AS DOUBLE) / nn, 8) AS po, pe,
         |    round((CAST(diag AS DOUBLE) / nn - pe) / (1.0 - pe), 6)
         |      AS kappa
         |  FROM po CROSS JOIN pe CROSS JOIN tot
         |)
         |SELECT conf.lang, conf.pred, CAST(conf.n AS BIGINT) AS n,
         |  po, pe, kappa
         |FROM conf CROSS JOIN scal
         |ORDER BY conf.lang, conf.pred""".stripMargin
    },

    "q_cochran_armitage" ->
      s"""WITH per AS (
         |  SELECT user_id, count(*) AS n_ev,
         |    max(CASE WHEN event_type = 'purchase' AND value > $CaVal
         |      THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY user_id
         |),
         |g AS (
         |  SELECT least($CaCap, greatest(0, (n_ev - $CaLo) // $CaWidth))
         |    AS d, count(*) AS n, sum(y) AS x
         |  FROM per GROUP BY 1
         |),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
         |        CAST(sum(x) AS BIGINT) AS xt FROM g),
         |terms AS (
         |  SELECT g.*, tot.nt, tot.xt,
         |    d * (CAST(x AS DECIMAL(38,0)) * nt
         |      - CAST(n AS DECIMAL(38,0)) * xt) AS tterm,
         |    CAST(n AS DECIMAL(38,0)) * d AS nw,
         |    CAST(n AS DECIMAL(38,0)) * d * d AS nw2
         |  FROM g CROSS JOIN tot
         |),
         |s AS (
         |  SELECT sum(tterm) AS tt, sum(nw) AS snw, sum(nw2) AS snw2,
         |    max(nt) AS nt, max(xt) AS xt
         |  FROM terms
         |),
         |d2 AS (
         |  SELECT *, CAST(xt AS DOUBLE) * CAST(nt - xt AS DOUBLE)
         |    * CAST(CAST(nt AS DECIMAL(38,0)) * snw2 - snw * snw
         |      AS DOUBLE) AS den
         |  FROM s
         |),
         |scal AS (
         |  SELECT round(CAST(tt AS DOUBLE), 4) AS t_stat,
         |    CASE WHEN den > 0 THEN round(CAST(nt AS DOUBLE)
         |      * CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / den, 6)
         |      ELSE CAST(0.0 AS DOUBLE) END AS z2,
         |    CASE WHEN den > 0 THEN
         |      round(CAST(CASE WHEN tt < 0 THEN -1 ELSE 1 END AS DOUBLE)
         |      * sqrt(CAST(nt AS DOUBLE) * CAST(tt AS DOUBLE)
         |      * CAST(tt AS DOUBLE) / den), 6)
         |      ELSE CAST(0.0 AS DOUBLE) END AS z
         |  FROM d2
         |)
         |SELECT CAST(d AS BIGINT) AS d, CAST(n AS BIGINT) AS n,
         |  CAST(x AS BIGINT) AS x, round(CAST(x AS DOUBLE) / n, 6) AS rate,
         |  t_stat, z2, z
         |FROM g CROSS JOIN scal ORDER BY d""".stripMargin,

    "q_mcnemar" ->
      s"""WITH f AS (
         |  SELECT n_chars > $McLen AS fa,
         |    length(text) - length(replace(text, ' ', '')) >= $McWords
         |      AS fb
         |  FROM documents
         |),
         |s AS (
         |  SELECT
         |    CAST(sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b,
         |    CAST(sum(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c,
         |    CAST(sum(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM f
         |)
         |SELECT a, b, c, d,
         |  CASE WHEN b + c > 0 THEN round(CAST(abs(b - c) - 1 AS DOUBLE)
         |    * CAST(abs(b - c) - 1 AS DOUBLE) / (b + c), 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS chi2_cc,
         |  CAST(CASE WHEN b + c > 0 AND CAST(abs(b - c) - 1 AS DOUBLE)
         |    * CAST(abs(b - c) - 1 AS DOUBLE) / (b + c) > 3.841
         |    THEN 1 ELSE 0 END AS BIGINT) AS differs
         |FROM s""".stripMargin,

    "q_neyman_alloc" ->
      s"""WITH g AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_h,
         |    CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS sx,
         |    CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
         |      AS DECIMAL(38,0)) AS sxx
         |  FROM documents GROUP BY lang
         |),
         |w AS (
         |  SELECT lang, n_h,
         |    round(sqrt(CAST(CAST(n_h AS DECIMAL(38,0)) * sxx - sx * sx
         |      AS DOUBLE) / (CAST(n_h AS DOUBLE) * n_h)), 8) AS sigma
         |  FROM g
         |),
         |q AS (
         |  SELECT lang, n_h, sigma,
         |    CAST(floor(n_h * sigma * 1000 + 0.5) AS BIGINT) AS wq
         |  FROM w
         |),
         |tot AS (SELECT CAST(sum(wq) AS BIGINT) AS wt FROM q),
         |b AS (
         |  SELECT q.*, ($NeyB * wq) // tot.wt AS base,
         |    ($NeyB * wq) % tot.wt AS rem
         |  FROM q CROSS JOIN tot
         |),
         |e AS (SELECT CAST($NeyB - sum(base) AS BIGINT) AS ex FROM b),
         |r AS (
         |  SELECT b.*, row_number() OVER (ORDER BY rem DESC, lang) AS rnk
         |  FROM b
         |)
         |SELECT lang, n_h, sigma,
         |  CAST(base + CASE WHEN rnk <= (SELECT ex FROM e) THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM r ORDER BY lang""".stripMargin,
  )
}
