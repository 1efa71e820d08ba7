package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-24 additions: spectral structure of the embedding space and the
  * event stream, plus a classical effect size —
  *
  *  - q_pca_top1: top principal direction of the (uncentered, integer-
  *    quantized) embedding Gram matrix by 3 power-iteration steps — the
  *    "is there one dominant axis?" audit run before trusting cosine
  *    similarity (anisotropic embedding spaces put most mass on one
  *    direction and cosine degenerates),
  *  - q_periodogram: discrete-Fourier power of the daily event-count
  *    series at the two calendar periods (7 / 30 days) per event type,
  *    with the trig tables pre-folded to literals — the seasonality
  *    detector behind q_stl_strength's single fixed period,
  *  - q_cramers_v: Cramér's V (raw + Bergsma bias-corrected) from the
  *    lang × source contingency table — the effect-size companion to
  *    q_chi2's test statistic (χ² grows with N even for trivial
  *    association; V is the scale-free number worth alerting on).
  *
  * Determinism: the Gram matrix and centered counts are exact integers;
  * every float product is rounded to a fixed scale and decimal-summed
  * ([[queries.dsum]]); trig/eigen normalization constants are either
  * pre-folded literals or one identically-spelled IEEE chain. */
object Wave24 {

  /** cos/sin(2π m / p) for m ∈ [0, p), 8 dp, as a SQL literal list body.
    * Values within 5e-9 of zero are pinned to exactly "0.00000000" so
    * neither engine ever parses a negative zero. */
  private def trig(p: Int, f: Double => Double): String =
    (0 until p).map { m =>
      val v = f(2 * math.Pi * m / p)
      if (math.abs(v) < 5e-9) "0.00000000" else f"$v%.8f"
    }.mkString(", ")

  /** One power-iteration step: u' = normalize(G·u), with the matrix-
    * vector products rounded to scale 4 and decimal-summed and the
    * max-abs normalization one correctly-rounded division + round(8). */
  private def step(g: DataFrame, u: DataFrame): DataFrame = {
    val v = g.join(broadcast(u.select(col("i").as("j"), col("u"))), "j")
      .groupBy("i")
      .agg(dsum(expr("round(CAST(g AS DOUBLE) * u, 4)"), 4).as("v"))
    val m = v.agg(max(abs(col("v"))).as("m"))
    v.crossJoin(broadcast(m))
      .selectExpr("i",
        "CASE WHEN m = 0 THEN CAST(0 AS DOUBLE)" +
          " ELSE round(v / m, 8) END AS u")
  }

  val queries: Map[String, Q] = strictMap(

    // PCA TOP-1: Gram G = Σ q qᵀ over integer-quantized embeddings (one
    // self-join shuffle on vec_id → dims² cells, partial-agg'd; |q| ≤
    // ~10³ so cells stay < 2^53 well past 10⁹ vectors — the documented
    // DECIMAL upgrade beyond that). Three u ← G·u / ‖·‖∞ steps on the
    // 64-row broadcast vector, then the Rayleigh quotient λ and its
    // share of trace(G) = total quantized variance mass. Every stage
    // after the Gram is metadata-scale.
    "q_pca_top1" -> ((s, dir) => {
      val el = table(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(expr(LlmOps.QuantSpark)))
        .selectExpr("vec_id", "CAST(pos + 1 AS BIGINT) AS i", "col AS q")
      val g = el.as("a").join(el.as("b"), "vec_id")
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(expr("a.q * b.q")).as("g"))
        .ckpt() // feeds u1/u2/u3, the Rayleigh join, and the trace
      val u0 = g.select(col("i")).distinct()
        .withColumn("u", expr("CAST(1 AS DOUBLE)"))
      val u3 = step(g, step(g, step(g, u0))).ckpt()
      val num = g
        .join(broadcast(u3.select(col("i").as("gi"), col("u").as("ui"))),
          col("i") === col("gi"))
        .join(broadcast(u3.select(col("i").as("gj"), col("u").as("uj"))),
          col("j") === col("gj"))
        .agg(dsum(expr("round(CAST(g AS DOUBLE) * ui * uj, 4)"), 4)
          .as("num"))
      val den = u3.agg(dsum(expr("round(u * u, 8)"), 8).as("den"))
      val tr = g.where(col("i") === col("j"))
        .agg(sum("g").as("trace"))
      u3.crossJoin(broadcast(num)).crossJoin(broadcast(den))
        .crossJoin(broadcast(tr))
        .selectExpr("i AS dim", "u AS loading",
          "round(num / den, 4) AS lambda",
          "round(num / den / CAST(trace AS DOUBLE), 6) AS ev_share")
        .orderBy("dim")
    }),

    // PERIODOGRAM: per event type, DFT power of the daily count series
    // at periods 7 and 30. Counts are centered exactly in integers
    // (y = n·c − Σc, scaled by n to avoid a mean division), the trig
    // factors are 8-dp literals folded at build time, and each power is
    // (Σy·cos)² + (Σy·sin)² over decimal-backed sums, normalized by n³
    // (the n² centering scale times the standard 1/n). One daily-count
    // shuffle; everything after is per-type metadata.
    "q_periodogram" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr("event_type",
          "unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      val st = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("s1"))
      val y = daily.join(broadcast(st), "event_type")
        .withColumn("y", expr("n * c - s1"))
      def comp(alias: String, p: Int, lits: String) =
        dsum(expr("round(CAST(y AS DOUBLE) * CAST(element_at(" +
          s"array($lits), CAST(day % $p + 1 AS INT)) AS DOUBLE), 4)"), 4)
          .as(alias)
      y.groupBy("event_type")
        .agg(first(col("n")).as("n"),
          comp("c7", 7, trig(7, math.cos)),
          comp("s7", 7, trig(7, math.sin)),
          comp("c30", 30, trig(30, math.cos)),
          comp("s30", 30, trig(30, math.sin)))
        .selectExpr("event_type", "CAST(n AS BIGINT) AS n_days",
          "round((c7 * c7 + s7 * s7)" +
            " / (CAST(n AS DOUBLE) * n * n), 4) AS p7",
          "round((c30 * c30 + s30 * s30)" +
            " / (CAST(n AS DOUBLE) * n * n), 4) AS p30",
          "CAST(CASE WHEN (c7 * c7 + s7 * s7) >= (c30 * c30 + s30 * s30)" +
            " THEN 7 ELSE 30 END AS BIGINT) AS dominant_period")
        .orderBy("event_type")
    }),

    // CRAMÉR'S V: χ² from the complete lang × source grid (identical
    // cell chain to q_chi2 — exact 128-bit cross-multiplied residuals,
    // one round(8) division per cell, decimal sum), then V =
    // √(χ²/(N·(min(r,c)−1))) and the Bergsma small-sample correction.
    // Contingency metadata-scale; one count shuffle over documents.
    "q_cramers_v" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val cell = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rowS = cell.groupBy("lang").agg(sum(col("o")).as("r"))
      val colS = cell.groupBy("source").agg(sum(col("o")).as("cc"))
      val tot = broadcast(d.agg(count(lit(1)).as("nn")))
      rowS.crossJoin(colS)
        .join(cell, Seq("lang", "source"), "left_outer")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(tot)
        .withColumn("res", expr(
          "CAST(o AS DECIMAL(19,0)) * nn - CAST(r AS DECIMAL(19,0)) * cc"))
        .withColumn("cellchi",
          expr("round(CAST(res * res AS DOUBLE)" +
            " / CAST(CAST(r AS DECIMAL(19,0)) * cc * nn AS DOUBLE), 8)"))
        .agg(first(col("nn")).as("nn"),
          count_distinct(col("lang")).as("rl"),
          count_distinct(col("source")).as("cl"),
          dsum(col("cellchi"), 8).as("chi2"))
        .selectExpr("CAST(nn AS BIGINT) AS n",
          "CAST(rl AS BIGINT) AS r_levels",
          "CAST(cl AS BIGINT) AS c_levels", "round(chi2, 6) AS chi2",
          "round(sqrt(chi2 / (nn * (least(rl, cl) - 1))), 6) AS v",
          // Bergsma 2013: φ²⁺ = max(0, φ² − (r−1)(c−1)/(N−1)),
          // r⁺ = r − (r−1)²/(N−1), c⁺ = c − (c−1)²/(N−1)
          "CASE WHEN least(" +
            "  rl - CAST((rl - 1) * (rl - 1) AS DOUBLE) / (nn - 1)," +
            "  cl - CAST((cl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))" +
            " <= 1 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(sqrt(" +
            "  greatest(CAST(0 AS DOUBLE), chi2 / nn" +
            "    - CAST((rl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))" +
            "  / (least(" +
            "    rl - CAST((rl - 1) * (rl - 1) AS DOUBLE) / (nn - 1)," +
            "    cl - CAST((cl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))" +
            "    - 1)), 6) END AS v_corrected")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_pca_top1" -> {
      def stepSql(k: Int, prev: String) =
        s"""v$k AS (
           |  SELECT g.i, ${dsumSql("round(CAST(g AS DOUBLE) * u, 4)", 4)} AS v
           |  FROM g JOIN $prev ON $prev.i = g.j GROUP BY g.i
           |),
           |m$k AS (SELECT max(abs(v)) AS m FROM v$k),
           |u$k AS (
           |  SELECT i, CASE WHEN m = 0 THEN CAST(0 AS DOUBLE)
           |            ELSE round(v / m, 8) END AS u
           |  FROM v$k CROSS JOIN m$k
           |)""".stripMargin
      s"""WITH el AS (
         |  SELECT vec_id, i, ${LlmOps.quantSqlElem("embedding[i]")} AS q
         |  FROM (SELECT vec_id, embedding,
         |               unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)
         |),
         |g AS (
         |  SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
         |  FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2
         |),
         |u0 AS (SELECT DISTINCT i, CAST(1 AS DOUBLE) AS u FROM g),
         |${stepSql(1, "u0")},
         |${stepSql(2, "u1")},
         |${stepSql(3, "u2")},
         |num AS (
         |  SELECT ${dsumSql("round(CAST(g AS DOUBLE) * ui * uj, 4)", 4)}
         |    AS num
         |  FROM g
         |  JOIN (SELECT i AS gi, u AS ui FROM u3) a ON g.i = a.gi
         |  JOIN (SELECT i AS gj, u AS uj FROM u3) b ON g.j = b.gj
         |),
         |den AS (SELECT ${dsumSql("round(u * u, 8)", 8)} AS den FROM u3),
         |tr AS (SELECT CAST(sum(g) AS BIGINT) AS trace FROM g WHERE i = j)
         |SELECT i AS dim, u AS loading, round(num / den, 4) AS lambda,
         |  round(num / den / CAST(trace AS DOUBLE), 6) AS ev_share
         |FROM u3 CROSS JOIN num CROSS JOIN den CROSS JOIN tr
         |ORDER BY dim""".stripMargin
    },

    "q_periodogram" -> {
      def comp(alias: String, p: Int, lits: String) =
        s"""${dsumSql(s"round(CAST(y AS DOUBLE) * CAST(([$lits])" +
          s"[CAST(day % $p AS INT) + 1] AS DOUBLE), 4)", 4)} AS $alias"""
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    count(*) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |st AS (SELECT event_type, count(*) AS n,
         |         CAST(sum(c) AS BIGINT) AS s1
         |       FROM daily GROUP BY event_type),
         |y AS (SELECT daily.*, n, n * c - s1 AS y
         |      FROM daily JOIN st USING (event_type)),
         |f AS (
         |  SELECT event_type, max(n) AS n,
         |    ${comp("c7", 7, trig(7, math.cos))},
         |    ${comp("s7", 7, trig(7, math.sin))},
         |    ${comp("c30", 30, trig(30, math.cos))},
         |    ${comp("s30", 30, trig(30, math.sin))}
         |  FROM y GROUP BY event_type
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |  round((c7 * c7 + s7 * s7)
         |    / (CAST(n AS DOUBLE) * n * n), 4) AS p7,
         |  round((c30 * c30 + s30 * s30)
         |    / (CAST(n AS DOUBLE) * n * n), 4) AS p30,
         |  CAST(CASE WHEN (c7 * c7 + s7 * s7) >= (c30 * c30 + s30 * s30)
         |       THEN 7 ELSE 30 END AS BIGINT) AS dominant_period
         |FROM f ORDER BY event_type""".stripMargin
    },

    "q_cramers_v" ->
      s"""WITH cell AS (
         |  SELECT lang, source, count(*) AS o
         |  FROM documents GROUP BY 1, 2
         |),
         |rs AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
         |       FROM cell GROUP BY lang),
         |cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS cc
         |       FROM cell GROUP BY source),
         |tot AS (SELECT count(*) AS nn FROM documents),
         |grid AS (
         |  SELECT rs.lang, cs.source, r, cc,
         |    coalesce(cell.o, 0) AS o, nn
         |  FROM rs CROSS JOIN cs
         |  LEFT JOIN cell ON cell.lang = rs.lang
         |    AND cell.source = cs.source
         |  CROSS JOIN tot
         |),
         |agg AS (
         |  SELECT max(nn) AS nn, count(DISTINCT lang) AS rl,
         |    count(DISTINCT source) AS cl,
         |    ${dsumSql(
             "round(CAST((CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * cc)" +
               " * (CAST(o AS HUGEINT) * nn - CAST(r AS HUGEINT) * cc)" +
               " AS DOUBLE) / CAST(CAST(r AS HUGEINT) * cc * nn" +
               " AS DOUBLE), 8)", 8)} AS chi2
         |  FROM grid
         |)
         |SELECT CAST(nn AS BIGINT) AS n, CAST(rl AS BIGINT) AS r_levels,
         |  CAST(cl AS BIGINT) AS c_levels, round(chi2, 6) AS chi2,
         |  round(sqrt(chi2 / (nn * (least(rl, cl) - 1))), 6) AS v,
         |  CASE WHEN least(
         |    rl - CAST((rl - 1) * (rl - 1) AS DOUBLE) / (nn - 1),
         |    cl - CAST((cl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))
         |    <= 1 THEN CAST(NULL AS DOUBLE)
         |  ELSE round(sqrt(
         |    greatest(CAST(0 AS DOUBLE), chi2 / nn
         |      - CAST((rl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))
         |    / (least(
         |      rl - CAST((rl - 1) * (rl - 1) AS DOUBLE) / (nn - 1),
         |      cl - CAST((cl - 1) * (cl - 1) AS DOUBLE) / (nn - 1))
         |      - 1)), 6) END AS v_corrected
         |FROM agg""".stripMargin,
  )
}
