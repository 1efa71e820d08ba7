package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-25 additions: substring-level dedup evidence, the PR-curve
  * summary, and a variance-homogeneity test —
  *
  *  - q_dedup_longest_run: longest run of consecutive matching shingle
  *    positions per verified LSH candidate pair — the suffix-array-style
  *    "how long is the shared substring actually?" evidence (Lee et al.'s
  *    exact-substring dedup criterion) that set-level Jaccard cannot
  *    give: two docs at jac 0.3 may share one 500-char block (trainable
  *    leak) or 30 scattered 8-grams (benign),
  *  - q_pr_auc: average precision (step-interpolated PR-curve area) by
  *    two distributed rank passes — the imbalanced-class companion to
  *    q_auc's ROC (with 1% positives, ROC-AUC 0.99 can hide precision
  *    0.1; AP does not),
  *  - q_levene: Brown–Forsythe variance-homogeneity W across event
  *    types (the median-centered Levene test) — the assumption check
  *    run before trusting q_anova's equal-variance F.
  *
  * Determinism: runs are integer position arithmetic; AP terms are one
  * correctly-rounded division each, round-8 + decimal-summed; W derives
  * from exact BIGINT power sums through one identically-spelled chain. */
object Wave25 {

  val queries: Map[String, Q] = strictMap(

    // LONGEST RUN: matched shingle positions per candidate pair, grouped
    // by diagonal (i1 − i2); a run of consecutive stride-3 positions is
    // an island under the classic i − stride·row_number key. Candidates
    // come from the capped-bucket verified channel (≤ C(64,2) pairs per
    // bucket at any corpus size); per-pair match rows are bounded by the
    // ShPosCap² occurrence cap. span_chars = (run−1)·stride + K is the
    // exact shared-substring length the run certifies.
    "q_dedup_longest_run" -> ((s, dir) => {
      val stride = LlmOps.ShingleStride
      val pj = LlmOps.verifiedJaccard(s, dir).ckpt() // join + fallback rows
      val shp = LlmOps.repShinglesPos(s, dir).ckpt() // both join sides
      val m = pj.select("d1", "d2")
        .join(shp.select(col("doc_id").as("d1"), col("i").as("i1"),
          col("sh")), "d1")
        .join(shp.select(col("doc_id").as("d2"), col("i").as("i2"),
          col("sh").as("sh2")), "d2")
        .where(col("sh") === col("sh2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("d1", "d2", "diag").orderBy("i1")
      val runs = m.withColumn("diag", col("i1") - col("i2"))
        .withColumn("grp", col("i1") - lit(stride) * row_number().over(w))
        .groupBy("d1", "d2", "diag", "grp")
        .agg(count(lit(1)).as("run"))
        .groupBy("d1", "d2").agg(max("run").as("max_run"))
      pj.join(runs, Seq("d1", "d2"), "left_outer")
        .selectExpr("d1", "d2", "round(jac, 4) AS jac",
          "CAST(coalesce(max_run, 0) AS BIGINT) AS run_shingles",
          "CAST(CASE WHEN max_run IS NULL THEN 0" +
            s" ELSE (max_run - 1) * $stride + ${LlmOps.ShingleK}" +
            " END AS BIGINT) AS span_chars")
        .orderBy("d1", "d2")
    }),

    // AVERAGE PRECISION: global score-desc rank (Ranks pass 1, no
    // whole-table window), positive-only rank (pass 2) = cumulative
    // positives at that row, AP = mean of P@i = rp/grk over positives.
    // Ties broken by event_id on both engines (AP under a fixed
    // permutation — documented, same discipline as q_gains_lift).
    "q_pr_auc" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .selectExpr("event_id",
          "CAST(floor(value*100 + 0.5) AS BIGINT) AS v",
          "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END" +
            " AS BIGINT) AS y")
        .withColumn("k", lit(1)).withColumn("vn", -col("v"))
      val ranked = graft.operators.Ranks
        .withinKey(ev, "k", Seq("vn", "event_id"))
        .withColumnRenamed("rk", "grk").ckpt() // feeds n + the positive pass
      val pos = graft.operators.Ranks
        .withinKey(ranked.where(col("y") === 1), "k", Seq("grk"))
      val ap = pos.agg(count(lit(1)).as("npos"),
        dsum(expr("round(CAST(rk AS DOUBLE) / grk, 8)"), 8).as("sap"))
      ranked.agg(count(lit(1)).as("n")).crossJoin(broadcast(ap))
        .selectExpr("CAST(n AS BIGINT) AS n",
          "CAST(npos AS BIGINT) AS npos",
          "round(sap / npos, 6) AS ap")
    }),

    // BROWN–FORSYTHE: per-type lower median by rank selection (no
    // per-group sort buffer), |x − med| power sums as exact BIGINTs,
    // W from the k-row group table through one identically-spelled
    // chain (s1² computed in DOUBLE — it passes int64 around 10⁵ rows
    // per group; the per-group term is round-8 anyway).
    "q_levene" -> ((s, dir) => {
      val v = table(s, dir, "events")
        .selectExpr("event_type",
          "CAST(floor(value*100 + 0.5) AS BIGINT) AS v", "event_id")
      val ranked = graft.operators.Ranks
        .withinKey(v, "event_type", Seq("v", "event_id")).ckpt()
      val ng = ranked.groupBy("event_type").agg(max("rk").as("n"))
      val med = ranked.join(broadcast(ng), "event_type")
        .where(expr("rk = (n + 1) DIV 2"))
        .select(col("event_type"), col("v").as("med"))
      val g = v.join(broadcast(med), "event_type")
        .withColumn("z", abs(col("v") - col("med")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum("z").as("s1"),
          sum(expr("z * z")).as("s2"))
        .ckpt() // feeds the totals + both term sums
      val tot = g.agg(sum("ng").as("nn"), sum("s1").as("ss"),
        count(lit(1)).as("kk"))
      g.crossJoin(broadcast(tot))
        .withColumn("d",
          expr("CAST(s1 AS DOUBLE) / ng - CAST(ss AS DOUBLE) / nn"))
        .agg(first(col("nn")).as("nn"), first(col("kk")).as("kk"),
          // scale 2, not 8: the den term is ~s2 (≈10¹³ at sf0.1) and a
          // DECIMAL(18,8) holds only 10 integer digits — scale 2 caps at
          // 10¹⁶ while losing nothing against round(·, 6) display
          dsum(expr("round(ng * d * d, 2)"), 2).as("num"),
          dsum(expr("round(CAST(s2 AS DOUBLE)" +
            " - CAST(s1 AS DOUBLE) * s1 / ng, 2)"), 2).as("den"))
        .selectExpr("CAST(nn AS BIGINT) AS n", "CAST(kk AS BIGINT) AS k",
          "CASE WHEN den = 0 OR kk <= 1 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(nn - kk AS DOUBLE) / (kk - 1)" +
            " * num / den, 6) END AS w")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_dedup_longest_run" -> {
      val stride = LlmOps.ShingleStride
      s"""WITH ${LlmOps.MinhashSigSql},
         |${LlmOps.BandsSql},
         |${LlmOps.VerifiedJacSql},
         |${LlmOps.repShinglesPosSql},
         |m AS (
         |  SELECT p.d1, p.d2, a.i AS i1, b.i AS i2
         |  FROM (SELECT d1, d2 FROM vj) p
         |  JOIN shp a ON a.doc_id = p.d1
         |  JOIN shp b ON b.doc_id = p.d2 AND b.sh = a.sh
         |),
         |isl AS (
         |  SELECT d1, d2, i1 - i2 AS diag,
         |    i1 - $stride * row_number() OVER (
         |      PARTITION BY d1, d2, i1 - i2 ORDER BY i1) AS grp
         |  FROM m
         |),
         |runs AS (
         |  SELECT d1, d2, max(run) AS max_run FROM (
         |    SELECT d1, d2, diag, grp, count(*) AS run
         |    FROM isl GROUP BY 1, 2, 3, 4)
         |  GROUP BY d1, d2
         |)
         |SELECT vj.d1, vj.d2, round(jac, 4) AS jac,
         |  CAST(coalesce(max_run, 0) AS BIGINT) AS run_shingles,
         |  CAST(CASE WHEN max_run IS NULL THEN 0
         |       ELSE (max_run - 1) * $stride + ${LlmOps.ShingleK}
         |       END AS BIGINT) AS span_chars
         |FROM vj LEFT JOIN runs ON runs.d1 = vj.d1 AND runs.d2 = vj.d2
         |ORDER BY vj.d1, vj.d2""".stripMargin
    },

    "q_pr_auc" ->
      s"""WITH ev AS (
         |  SELECT event_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
         |    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |      AS BIGINT) AS y
         |  FROM events
         |),
         |r AS (
         |  SELECT event_id, y,
         |    CAST(row_number() OVER (ORDER BY -v, event_id) AS BIGINT)
         |      AS grk
         |  FROM ev
         |),
         |p AS (
         |  SELECT grk,
         |    CAST(row_number() OVER (ORDER BY grk) AS BIGINT) AS rp
         |  FROM r WHERE y = 1
         |),
         |s AS (
         |  SELECT count(*) AS npos,
         |    ${dsumSql("round(CAST(rp AS DOUBLE) / grk, 8)", 8)} AS sap
         |  FROM p
         |),
         |t AS (SELECT count(*) AS n FROM ev)
         |SELECT CAST(n AS BIGINT) AS n, CAST(npos AS BIGINT) AS npos,
         |  round(sap / npos, 6) AS ap
         |FROM t CROSS JOIN s""".stripMargin,

    "q_levene" ->
      s"""WITH v AS (
         |  SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
         |    event_id
         |  FROM events
         |),
         |r AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY v, event_id) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM v
         |),
         |med AS (
         |  SELECT event_type, v AS med FROM r WHERE rk = (n + 1) // 2
         |),
         |g AS (
         |  SELECT v.event_type, count(*) AS ng,
         |    CAST(sum(abs(v.v - med)) AS BIGINT) AS s1,
         |    CAST(sum(abs(v.v - med) * abs(v.v - med)) AS BIGINT) AS s2
         |  FROM v JOIN med USING (event_type)
         |  GROUP BY v.event_type
         |),
         |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
         |          CAST(sum(s1) AS BIGINT) AS ss, count(*) AS kk
         |        FROM g),
         |agg AS (
         |  SELECT max(nn) AS nn, max(kk) AS kk,
         |    ${dsumSql("round(ng * d * d, 2)", 2)} AS num,
         |    ${dsumSql("round(CAST(s2 AS DOUBLE)" +
           " - CAST(s1 AS DOUBLE) * s1 / ng, 2)", 2)} AS den
         |  FROM (SELECT g.*, nn, kk,
         |          CAST(s1 AS DOUBLE) / ng - CAST(ss AS DOUBLE) / nn AS d
         |        FROM g CROSS JOIN tot)
         |)
         |SELECT CAST(nn AS BIGINT) AS n, CAST(kk AS BIGINT) AS k,
         |  CASE WHEN den = 0 OR kk <= 1 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(nn - kk AS DOUBLE) / (kk - 1)
         |       * num / den, 6) END AS w
         |FROM agg""".stripMargin,
  )
}
