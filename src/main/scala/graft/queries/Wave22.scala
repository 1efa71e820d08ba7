package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ckpt, Tokenize}
import Ckpt._

/** Wave-22 additions: published-rule quality filters and infrastructure
  * sizing audits —
  *
  *  - q_gopher_ngram_frac: per-doc duplicated-trigram fraction — the
  *    Gopher/FineWeb "repeated n-gram" quality rule (word-level
  *    repetition is q_repetition; THIS is the n-gram variant the
  *    published pipelines actually gate on), with the 0.2 threshold
  *    applied as an exact integer cross-multiply,
  *  - q_stl_strength: seasonal strength of the daily event-count
  *    series against day-of-week means — F = max(0, 1 − Var(R)/Var(D));
  *    near 1 = strongly weekly, near 0 = no weekly structure; decides
  *    whether the forecast family's seasonal-naive baseline is even
  *    meaningful,
  *  - q_hash_collision_audit: observed vs birthday-expected collisions
  *    of 16/24/32-bit text fingerprints — the width-planning number
  *    (at 10¹² docs a 32-bit fingerprint is ~10⁵ collisions per
  *    partition; this query is the evidence).
  *
  * Determinism: trigram counts and collision counts are pure integers;
  * the quality gate is a cross-multiply; seasonal strength's residual
  * terms ride round-8 + decimal sums with one identically-spelled
  * float chain. */
object Wave22 {

  val queries: Map[String, Q] = strictMap(

    // GOPHER N-GRAM RULE: positional trigrams per doc (multiset, NOT
    // distinct), occurrences of trigrams appearing ≥ 2× in the doc →
    // dup fraction; flag = 5·n_dup > n_tri (the exact-integer 0.2
    // gate — the float frac is display only). One tokenize pass + one
    // (doc, trigram) count shuffle; docs with < 3 tokens are excluded
    // (no trigram exists — mirrored in the oracle).
    "q_gopher_ngram_frac" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' '," +
            " element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
          .as("sh"))
        .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tri"),
          sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_dup"))
        .selectExpr("doc_id", "CAST(n_tri AS BIGINT) AS n_tri",
          "CAST(n_dup AS BIGINT) AS n_dup",
          "round(CAST(n_dup AS DOUBLE) / n_tri, 4) AS dup_frac",
          "CAST(CASE WHEN 5 * n_dup > n_tri THEN 1 ELSE 0 END" +
            " AS BIGINT) AS gopher_flag")
        .orderBy("doc_id")),

    // SEASONAL STRENGTH: daily counts → day-of-week means → residual
    // variance vs total variance. Total variance is EXACT integer
    // power sums (n·Σc² − (Σc)² — 128-bit past ~10⁹ daily counts,
    // noted); residuals are one identically-spelled float chain with
    // round-8 terms through a decimal sum. A constant series (zero
    // total variance) → NULL by contract.
    "q_stl_strength" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("c"))
        .withColumn("dow", col("day") % 7)
        .ckpt() // feeds the dow means + the residual join + power sums
      val dowm = daily.groupBy("dow")
        .agg(sum("c").as("sc"), count(lit(1)).as("nd"))
      val resid = daily.join(broadcast(dowm), "dow")
        .withColumn("r", expr(
          "CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / nd"))
        .agg(dsum(expr("round(r * r, 8)"), 8).as("srr"),
          dsum(expr("round(r, 8)"), 8).as("sr"))
      val tot = daily.agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(expr("c * c")).as("s2"))
      tot.crossJoin(broadcast(resid))
        .selectExpr("CAST(n AS BIGINT) AS n_days",
          "round(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n), 6)" +
            " AS var_total",
          "round(srr / n - (sr / n) * (sr / n), 6) AS var_resid",
          "CASE WHEN n * s2 - s1 * s1 = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(greatest(CAST(0 AS DOUBLE)," +
            " 1 - (srr / n - (sr / n) * (sr / n))" +
            " / (CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n))), 6)" +
            " END AS seasonal_strength")
    }),

    // FINGERPRINT COLLISION AUDIT: distinct texts hashed at 16/24/32
    // bits (md5 hex prefixes — the corpus fingerprint family's exact
    // spelling), observed collisions vs the birthday expectation
    // n(n−1)/2^(b+1). One distinct pass; the stack's 3× expansion
    // collapses in the per-width aggregate. The width whose observed
    // count first tracks the expectation is the width the dedup
    // pipeline must EXCEED at target scale.
    "q_hash_collision_audit" -> ((s, dir) =>
      table(s, dir, "documents").select("text").distinct()
        .selectExpr("stack(3," +
          " CAST(16 AS BIGINT), CAST(conv(substring(md5(text), 1, 4), 16, 10) AS BIGINT)," +
          " CAST(24 AS BIGINT), CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT)," +
          " CAST(32 AS BIGINT), CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)" +
          ") AS (bits, h)")
        .groupBy("bits")
        .agg(count(lit(1)).as("n_keys"),
          count_distinct(col("h")).as("n_distinct"))
        .selectExpr("bits", "CAST(n_keys AS BIGINT) AS n_keys",
          "CAST(n_distinct AS BIGINT) AS n_distinct",
          "CAST(n_keys - n_distinct AS BIGINT) AS n_collisions",
          "round(CAST(n_keys AS DOUBLE) * (n_keys - 1)" +
            " / CAST(2 * shiftleft(CAST(1 AS BIGINT), CAST(bits AS INT))" +
            " AS DOUBLE), 4) AS expected_collisions")
        .orderBy("bits")),
  )

  val oracle: Map[String, String] = strictMap(

    "q_gopher_ngram_frac" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' ') AS ws
         |  FROM documents
         |),
         |tri AS (
         |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
         |  FROM (SELECT doc_id, ws,
         |               unnest(generate_series(1, len(ws)-2)) AS i
         |        FROM t WHERE len(ws) >= 3)
         |),
         |c AS (SELECT doc_id, sh, count(*) AS c FROM tri GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
         |    CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         |      AS n_dup
         |  FROM c GROUP BY doc_id
         |)
         |SELECT doc_id, n_tri, n_dup,
         |  round(CAST(n_dup AS DOUBLE) / n_tri, 4) AS dup_frac,
         |  CAST(CASE WHEN 5 * n_dup > n_tri THEN 1 ELSE 0 END AS BIGINT)
         |    AS gopher_flag
         |FROM per ORDER BY doc_id""".stripMargin,

    "q_stl_strength" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
         |  FROM events GROUP BY 1
         |),
         |d2 AS (SELECT day, c, day % 7 AS dow FROM daily),
         |dowm AS (SELECT dow, CAST(sum(c) AS BIGINT) AS sc,
         |           count(*) AS nd
         |         FROM d2 GROUP BY dow),
         |resid AS (
         |  SELECT ${dsumSql("round(r * r, 8)", 8)} AS srr,
         |    ${dsumSql("round(r, 8)", 8)} AS sr
         |  FROM (SELECT CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / nd AS r
         |        FROM d2 JOIN dowm USING (dow))
         |),
         |tot AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s1,
         |          CAST(sum(c * c) AS BIGINT) AS s2
         |        FROM d2)
         |SELECT CAST(n AS BIGINT) AS n_days,
         |  round(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n), 6)
         |    AS var_total,
         |  round(srr / n - (sr / n) * (sr / n), 6) AS var_resid,
         |  CASE WHEN n * s2 - s1 * s1 = 0 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(greatest(CAST(0 AS DOUBLE),
         |         1 - (srr / n - (sr / n) * (sr / n))
         |         / (CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n))), 6)
         |  END AS seasonal_strength
         |FROM tot CROSS JOIN resid""".stripMargin,

    "q_hash_collision_audit" -> {
      def side(bits: Int, hexLen: Int) =
        s"""SELECT CAST($bits AS BIGINT) AS bits,
           |  ${hexLongSql("md5(text)", 1, hexLen)} AS h
           |FROM dt""".stripMargin
      s"""WITH dt AS (SELECT DISTINCT text FROM documents),
         |hs AS (
         |${side(16, 4)}
         |UNION ALL
         |${side(24, 6)}
         |UNION ALL
         |${side(32, 8)}
         |),
         |g AS (
         |  SELECT bits, count(*) AS n_keys,
         |    count(DISTINCT h) AS n_distinct
         |  FROM hs GROUP BY bits
         |)
         |SELECT bits, CAST(n_keys AS BIGINT) AS n_keys,
         |  CAST(n_distinct AS BIGINT) AS n_distinct,
         |  CAST(n_keys - n_distinct AS BIGINT) AS n_collisions,
         |  round(CAST(n_keys AS DOUBLE) * (n_keys - 1)
         |    / CAST(2 * (CAST(1 AS BIGINT) << CAST(bits AS INT))
         |    AS DOUBLE), 4) AS expected_collisions
         |FROM g ORDER BY bits""".stripMargin
    },
  )
}
