package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-19 additions: supervised evaluation and network structure —
  *
  *  - q_langid_accuracy: confusion matrix + accuracy of the stopword
  *    lang-id heuristic (q_lang_id's chain) against the corpus `lang`
  *    labels — the supervised closing-of-the-loop on the classifier
  *    the filter funnel trusts; the out-of-scope class (zh, which the
  *    4-way argmax can never emit) shows up honestly as off-diagonal
  *    mass instead of being silently dropped,
  *  - q_assortativity: degree assortativity (Newman's r) of the
  *    supplier↔part bipartite incidence graph — do hubs attach to
  *    hubs (r > 0, social-style) or to leaves (r < 0, hub-and-spoke)?
  *    The one scalar that says which scale-out strategies (hub
  *    salting, degree-capped wedges) the graph family will need,
  *  - q_mde_power: minimum detectable effect for the user-conversion
  *    A/B test at α = 0.05 / power = 0.80 from exact per-arm counts —
  *    the pre-readout number that separates "no effect" from
  *    "underpowered"; the observed lift is flagged against it.
  *
  * Determinism: confusion cells and arm counts are pure integers;
  * assortativity's normalizer rides exact 128-bit integer products
  * (DECIMAL(38,0) / HUGEINT) with one terminal IEEE division; the MDE
  * chain is sqrt/÷/× of exact counts — all correctly-rounded IEEE ops
  * spelled identically in both engines (no libm-divergent ln/exp). */
object Wave19 {

  /** z_{0.975} + z_{0.80} pre-summed as one literal (2.80158521) so
    * neither engine's decimal-promotion rules touch the sum. */
  private val ZSum = "CAST(2.80158521 AS DOUBLE)"

  private val P0 = "(CAST(x0 AS DOUBLE) / n0)"
  private val P1 = "(CAST(x1 AS DOUBLE) / n1)"
  private val PPool = "(CAST(x0 + x1 AS DOUBLE) / (n0 + n1))"
  private val MdeAbs =
    s"($ZSum * sqrt($PPool * (CAST(1 AS DOUBLE) - $PPool)" +
      s" * (CAST(1 AS DOUBLE)/n0 + CAST(1 AS DOUBLE)/n1)))"

  /** Newman's r over moment columns (m, sx, sxx, sxy); `big` is the
    * engine's exact-128-bit type (DECIMAL(38,0) / HUGEINT) — m·sxy can
    * pass int64 at ~2·10⁵ directed edges × 10¹⁴ degree products. The
    * all-degrees-equal graph has a zero normalizer → NULL by contract. */
  private def assortExpr(big: String): String =
    s"""CASE WHEN CAST(m AS $big) * sxx - CAST(sx AS $big) * sx = 0
       |     THEN CAST(NULL AS DOUBLE)
       |     ELSE round(
       |       CAST(CAST(m AS $big) * sxy - CAST(sx AS $big) * sx AS DOUBLE)
       |       / CAST(CAST(m AS $big) * sxx - CAST(sx AS $big) * sx AS DOUBLE), 6)
       |END""".stripMargin

  val queries: Map[String, Q] = strictMap(

    // LANG-ID ACCURACY: q_lang_id's stopword-score argmax joined back
    // to the `lang` label → (truth, pred) confusion cells, per-truth
    // row shares (the diagonal share IS per-lang recall), and overall
    // accuracy constants. One tokenize shuffle + one metadata-scale
    // cell table; docs with zero tokens never reach the classifier
    // (inner join — mirrored in the oracle).
    "q_langid_accuracy" -> ((s, dir) => {
      val scoreAggs = LlmOps.Stops.map { case (lang, words) =>
        sum(expr(s"CASE WHEN word IN ${LlmOps.inList(words)} THEN 1 ELSE 0 END"))
          .cast("long").as(s"s_$lang")
      }
      val pred = corpusToks(s, dir).groupBy("doc_id")
        .agg(scoreAggs.head, scoreAggs.tail: _*)
        .withColumn("pred", expr(LlmOps.PredCase))
        .select("doc_id", "pred")
      val cells = table(s, dir, "documents").select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .ckpt() // feeds lang totals + overall accuracy + output rows
      val lt = cells.groupBy("lang").agg(sum("n").as("lang_total"))
      val acc = cells.agg(sum("n").as("n_docs"),
        sum(when(col("lang") === col("pred"), col("n")).otherwise(0L))
          .as("n_correct"))
      cells.join(lt, "lang").crossJoin(broadcast(acc))
        .selectExpr("lang", "pred", "CAST(n AS BIGINT) AS n",
          "CAST(lang_total AS BIGINT) AS lang_total",
          "round(CAST(n AS DOUBLE) / lang_total, 4) AS share",
          "CAST(n_docs AS BIGINT) AS n_docs",
          "CAST(n_correct AS BIGINT) AS n_correct",
          "round(CAST(n_correct AS DOUBLE) / n_docs, 4) AS accuracy")
        .orderBy("lang", "pred")
    }),

    // DEGREE ASSORTATIVITY (Newman's r) over the supplier↔part
    // bipartite incidence graph — the projection with genuine degree
    // variance at every scale factor (the w ≥ 5 co-purchase projection
    // is COMPLETE at harness scale: all degrees equal → r undefined).
    // Each undirected edge contributes both orientations (the standard
    // symmetric form), so the per-edge join of the two degree tables
    // yields all four moments in one pass: m = 2|E|, Σx = Σ(ds+dp),
    // Σx² = Σ(ds²+dp²), Σxy = 2·Σ ds·dp. Moments are plain BIGINT sums
    // (≤ ~10¹⁴ here; DECIMAL upgrade past ~10⁹ edges noted in
    // assortExpr); only the final m·Σ products go 128-bit. Bipartite
    // hub-leaf structure ⇒ r < 0 (the spec pins the sign).
    "q_assortativity" -> ((s, dir) => {
      val e = table(s, dir, "lineitem")
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct()
        .ckpt() // feeds two degree aggs + the moment join
      val ds = e.groupBy("sk").agg(count(lit(1)).as("dsv"))
      val dp = e.groupBy("pk").agg(count(lit(1)).as("dpv"))
      val mom = e.join(ds, "sk").join(dp, "pk")
        .agg(count(lit(1)).as("ne"),
          sum(expr("dsv + dpv")).as("sx"),
          sum(expr("dsv * dsv + dpv * dpv")).as("sxx"),
          sum(expr("dsv * dpv")).as("sxy2"))
        .selectExpr("ne", "2 * ne AS m", "sx", "sxx", "2 * sxy2 AS sxy")
      ds.agg(count(lit(1)).as("n_supp"))
        .crossJoin(dp.agg(count(lit(1)).as("n_part")))
        .crossJoin(mom)
        .selectExpr("CAST(n_supp + n_part AS BIGINT) AS n_vertices",
          "CAST(ne AS BIGINT) AS n_edges",
          "CAST(m AS BIGINT) AS m_endpoints",
          s"${assortExpr("DECIMAL(38,0)")} AS assortativity")
    }),

    // MDE / POWER: exact per-arm event counts (arm = user_id % 2 — the
    // q_srm_check assignment) and purchase events → pooled rate →
    // minimum detectable absolute/relative effect at the standard
    // α = 0.05 two-sided / 80% power, plus the observed lift flagged
    // against it. Event-grain conversion (the q_smoothed_rate metric —
    // user-grain "ever purchased" saturates to p = 1 on this corpus and
    // degenerates the MDE to 0). One partial-agg'd pass over events;
    // everything after is a 1-row chain of correctly-rounded IEEE ops.
    "q_mde_power" -> ((s, dir) =>
      table(s, dir, "events")
        .select(col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("user_id") % 2 === 0, col("y")).otherwise(0L))
            .as("x0"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("user_id") % 2 === 1, col("y")).otherwise(0L))
            .as("x1"))
        .selectExpr("CAST(n0 AS BIGINT) AS n0", "CAST(x0 AS BIGINT) AS x0",
          "CAST(n1 AS BIGINT) AS n1", "CAST(x1 AS BIGINT) AS x1",
          s"round($P0, 6) AS p0", s"round($P1, 6) AS p1",
          s"round($PPool, 6) AS p_pool",
          s"round($MdeAbs, 6) AS mde_abs",
          s"round($MdeAbs / $P0, 6) AS mde_rel",
          s"round($P1 - $P0, 6) AS lift",
          s"CAST(CASE WHEN abs($P1 - $P0) >= $MdeAbs THEN 1 ELSE 0 END" +
            " AS BIGINT) AS powered")),
  )

  val oracle: Map[String, String] = strictMap(

    "q_langid_accuracy" -> {
      val scores = LlmOps.Stops.map { case (lang, words) =>
        s"CAST(sum(CASE WHEN word IN ${LlmOps.inList(words)} THEN 1 ELSE 0 END) AS BIGINT) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH ${Reference.ToksSql},
         |sc AS (
         |  SELECT doc_id,
         |    $scores
         |  FROM toks GROUP BY doc_id
         |),
         |pr AS (SELECT doc_id, ${LlmOps.PredCase} AS pred FROM sc),
         |cells AS (
         |  SELECT d.lang, pr.pred, count(*) AS n
         |  FROM documents d JOIN pr USING (doc_id)
         |  GROUP BY 1, 2
         |),
         |lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_total
         |       FROM cells GROUP BY lang),
         |acc AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |          CAST(sum(CASE WHEN lang = pred THEN n ELSE 0 END)
         |            AS BIGINT) AS n_correct
         |        FROM cells)
         |SELECT cells.lang, pred, CAST(n AS BIGINT) AS n, lang_total,
         |  round(CAST(n AS DOUBLE) / lang_total, 4) AS share,
         |  n_docs, n_correct,
         |  round(CAST(n_correct AS DOUBLE) / n_docs, 4) AS accuracy
         |FROM cells JOIN lt USING (lang) CROSS JOIN acc
         |ORDER BY lang, pred""".stripMargin
    },

    "q_assortativity" ->
      s"""WITH e AS (
         |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem
         |),
         |ds AS (SELECT sk, count(*) AS dsv FROM e GROUP BY sk),
         |dp AS (SELECT pk, count(*) AS dpv FROM e GROUP BY pk),
         |mom AS (
         |  SELECT count(*) AS ne,
         |    CAST(sum(dsv + dpv) AS BIGINT) AS sx,
         |    CAST(sum(dsv * dsv + dpv * dpv) AS BIGINT) AS sxx,
         |    CAST(sum(dsv * dpv) AS BIGINT) AS sxy2
         |  FROM e JOIN ds USING (sk) JOIN dp USING (pk)
         |),
         |mm AS (SELECT ne, 2 * ne AS m, sx, sxx, 2 * sxy2 AS sxy FROM mom)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM ds) +
         |    (SELECT CAST(count(*) AS BIGINT) FROM dp) AS n_vertices,
         |  CAST(ne AS BIGINT) AS n_edges,
         |  CAST(m AS BIGINT) AS m_endpoints,
         |  ${assortExpr("HUGEINT")} AS assortativity
         |FROM mm""".stripMargin,

    "q_mde_power" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |      AS BIGINT) AS y
         |  FROM events
         |),
         |w AS (
         |  SELECT
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END)
         |      AS BIGINT) AS x0,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END)
         |      AS BIGINT) AS x1
         |  FROM u
         |)
         |SELECT n0, x0, n1, x1,
         |  round($P0, 6) AS p0, round($P1, 6) AS p1,
         |  round($PPool, 6) AS p_pool,
         |  round($MdeAbs, 6) AS mde_abs,
         |  round($MdeAbs / $P0, 6) AS mde_rel,
         |  round($P1 - $P0, 6) AS lift,
         |  CAST(CASE WHEN abs($P1 - $P0) >= $MdeAbs THEN 1 ELSE 0 END
         |    AS BIGINT) AS powered
         |FROM w""".stripMargin,
  )
}
