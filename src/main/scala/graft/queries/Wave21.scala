package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Ckpt, Tokenize}
import Ckpt._

/** Wave-21 additions: corpus-composition and score-monitoring audits —
  *
  *  - q_source_ngram_overlap: pairwise word-trigram-set Jaccard between
  *    sources — the redundancy matrix a mixture designer reads before
  *    weighting sources (exact-dup composition is useless here: the
  *    harness corpus has near-zero exact cross-source dups, so overlap
  *    must ride shared n-grams),
  *  - q_gains_lift: cumulative gains/lift table by score decile — the
  *    "top 20% of scores capture X% of purchases" targeting curve
  *    (ranking-quality complement to q_auc's order statistic),
  *  - q_psi: Population Stability Index of the score distribution
  *    between the first and second halves of the event window, on
  *    decile bins FROZEN from period 1 — THE production score-drift
  *    monitor (PSI < 0.1 stable, > 0.25 retrain).
  *
  * Determinism: trigram sets and bin/decile assignment are pure
  * integers (quantized scores, rank selection); PSI's ln argument is an
  * exact integer rational under Laplace smoothing, so the round-8 ln
  * discipline applies; gains/lift are terminal divisions of exact
  * counts. */
object Wave21 {

  val queries: Map[String, Q] = strictMap(

    // SOURCE OVERLAP MATRIX: distinct (source, trigram) rows — ONE
    // tokenize pass — self-joined on the trigram (each trigram
    // contributes at most C(|sources|,2) pairs, and |sources| is a
    // catalog-scale dimension, so the join is corpus-linear; a df-cap
    // rider is the upgrade if sources ever become user-scale). Jaccard
    // from exact set sizes; ordered by the pair.
    "q_source_ngram_overlap" -> ((s, dir) => {
      val tri = table(s, dir, "documents")
        .select(col("source"), Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' '," +
            " element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
          .as("sh"))
        .distinct()
        .ckpt() // feeds per-source sizes + both self-join sides
      val sz = tri.groupBy("source").agg(count(lit(1)).as("sz"))
      tri.alias("x")
        .join(tri.alias("y"),
          col("x.sh") === col("y.sh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
        .agg(count(lit(1)).as("co"))
        .join(sz.select(col("source").as("sa"), col("sz").as("sza")), "sa")
        .join(sz.select(col("source").as("sb"), col("sz").as("szb")), "sb")
        .selectExpr("sa", "sb", "CAST(co AS BIGINT) AS co",
          "CAST(sza AS BIGINT) AS sza", "CAST(szb AS BIGINT) AS szb",
          "round(CAST(co AS DOUBLE) / (sza + szb - co), 6) AS jac")
        .orderBy("sa", "sb")
    }),

    // GAINS / LIFT: events ranked by quantized score DESC on the
    // distributed Ranks pass (no whole-table window), cut into 10
    // global deciles by pure-integer rank arithmetic, then the 10-row
    // cumulative capture/lift chain is metadata. Decile 1 = top
    // scores; lift(d) = precision-in-top-d ÷ base rate.
    "q_gains_lift" -> ((s, dir) => {
      val e = table(s, dir, "events")
        .selectExpr("CAST(floor(value*100 + 0.5) AS BIGINT) AS v",
          "event_id",
          "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END" +
            " AS BIGINT) AS y")
        .withColumn("nv", -col("v")).withColumn("k", lit(1))
      val tot = e.agg(count(lit(1)).as("n"), sum("y").as("tot_pos"))
      val bins = graft.operators.Ranks.withinKey(e, "k", Seq("nv", "event_id"))
        .crossJoin(broadcast(tot))
        .selectExpr("((rk - 1) * 10) DIV n + 1 AS decile", "y")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_events"), sum("y").as("n_pos"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bins
        .withColumn("cum_n", sum("n_events").over(w))
        .withColumn("cum_pos", sum("n_pos").over(w))
        .crossJoin(broadcast(tot))
        .selectExpr("CAST(decile AS BIGINT) AS decile",
          "CAST(n_events AS BIGINT) AS n_events",
          "CAST(n_pos AS BIGINT) AS n_pos",
          "CAST(cum_pos AS BIGINT) AS cum_pos",
          "round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS capture",
          "round(CAST(cum_pos AS DOUBLE) * n" +
            " / (CAST(cum_n AS DOUBLE) * tot_pos), 6) AS lift")
        .orderBy("decile")
    }),

    // PSI: decile boundaries FROZEN from period 1 (first ceil(D/2)
    // days), both periods binned against them (a 1-row broadcast of
    // b1..b9 — the q_percentile_disc pick pattern), Laplace-smoothed
    // shares so empty bins stay finite, and the ln argument is the
    // EXACT integer rational (n1+1)(N2+10) / ((n2+1)(N1+10)) — the
    // round-8 ln discipline applies verbatim. Σ terms ride a decimal
    // sum; the 10-bin grid is metadata.
    "q_psi" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .selectExpr("CAST(floor(value*100 + 0.5) AS BIGINT) AS v",
          "event_id", "unix_micros(ts) DIV 86400000000 AS day")
      val span = ev.agg(min("day").as("d0"), max("day").as("dmax"))
      val per = ev.crossJoin(broadcast(span))
        .selectExpr("v", "event_id",
          "CAST(CASE WHEN day - d0 < (dmax - d0 + 2) DIV 2" +
            " THEN 1 ELSE 2 END AS BIGINT) AS period")
        .ckpt() // feeds the boundary rank pass + both period binnings
      val p1 = per.where(col("period") === 1).withColumn("k", lit(1))
      val n1t = p1.agg(count(lit(1)).as("np1"))
      val bounds = graft.operators.Ranks.withinKey(p1, "k", Seq("v", "event_id"))
        .crossJoin(broadcast(n1t))
        .where(expr("rk IN ((1*np1 + 9) DIV 10, (2*np1 + 9) DIV 10," +
          " (3*np1 + 9) DIV 10, (4*np1 + 9) DIV 10, (5*np1 + 9) DIV 10," +
          " (6*np1 + 9) DIV 10, (7*np1 + 9) DIV 10, (8*np1 + 9) DIV 10," +
          " (9*np1 + 9) DIV 10)"))
        .agg(min(when(expr("rk = (1*np1 + 9) DIV 10"), col("v"))).as("b1"),
          (2 to 9).map(i =>
            min(when(expr(s"rk = ($i*np1 + 9) DIV 10"), col("v")))
              .as(s"b$i")): _*)
      val binExpr = "CAST(1 + " + (1 to 9)
        .map(i => s"(CASE WHEN v > b$i THEN 1 ELSE 0 END)")
        .mkString(" + ") + " AS BIGINT)"
      val counts = per.crossJoin(broadcast(bounds))
        .selectExpr("period", s"$binExpr AS bin")
        .groupBy("period", "bin").agg(count(lit(1)).as("n"))
      val grid = s.range(1, 11).select(col("id").as("bin"))
      val wide = grid
        .join(counts.where(col("period") === 1).select(col("bin"),
          col("n").as("n1")), Seq("bin"), "left_outer")
        .join(counts.where(col("period") === 2).select(col("bin"),
          col("n").as("n2")), Seq("bin"), "left_outer")
        .na.fill(0L, Seq("n1", "n2"))
        .crossJoin(broadcast(counts.agg(
          sum(when(col("period") === 1, col("n")).otherwise(0L)).as("t1"),
          sum(when(col("period") === 2, col("n")).otherwise(0L)).as("t2"))))
        .withColumn("p", expr("CAST(n1 + 1 AS DOUBLE) / (t1 + 10)"))
        .withColumn("q", expr("CAST(n2 + 1 AS DOUBLE) / (t2 + 10)"))
        .withColumn("term", expr(
          "round((p - q) * round(ln(CAST((n1 + 1) * (t2 + 10) AS DOUBLE)" +
            " / CAST((n2 + 1) * (t1 + 10) AS DOUBLE)), 8), 8)"))
        .ckpt() // feeds the PSI total + the per-bin rows
      val psi = wide.agg(dsum(col("term"), 8).as("s"))
        .selectExpr("round(s, 6) AS psi")
      wide.crossJoin(broadcast(psi))
        .selectExpr("CAST(bin AS BIGINT) AS bin",
          "CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
          "round(p, 6) AS p", "round(q, 6) AS q", "psi")
        .orderBy("bin")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_source_ngram_overlap" ->
      s"""WITH t AS (
         |  SELECT source,
         |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' ') AS ws
         |  FROM documents
         |),
         |tri AS (
         |  SELECT DISTINCT source,
         |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
         |  FROM (SELECT source, ws,
         |               unnest(generate_series(1, len(ws)-2)) AS i
         |        FROM t WHERE len(ws) >= 3)
         |),
         |sz AS (SELECT source, count(*) AS sz FROM tri GROUP BY source),
         |co AS (
         |  SELECT x.source AS sa, y.source AS sb, count(*) AS co
         |  FROM tri x JOIN tri y ON x.sh = y.sh AND x.source < y.source
         |  GROUP BY 1, 2
         |)
         |SELECT sa, sb, CAST(co AS BIGINT) AS co,
         |  CAST(a.sz AS BIGINT) AS sza, CAST(b.sz AS BIGINT) AS szb,
         |  round(CAST(co AS DOUBLE) / (a.sz + b.sz - co), 6) AS jac
         |FROM co JOIN sz a ON a.source = co.sa JOIN sz b ON b.source = co.sb
         |ORDER BY sa, sb""".stripMargin,

    "q_gains_lift" ->
      """WITH e AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS v, event_id,
        |    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS BIGINT) AS y
        |  FROM events
        |),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(y) AS BIGINT) AS tot_pos FROM e),
        |r AS (
        |  SELECT y, CAST(row_number() OVER (ORDER BY v DESC, event_id)
        |    AS BIGINT) AS rk
        |  FROM e
        |),
        |bins AS (
        |  SELECT ((rk - 1) * 10) // n + 1 AS decile,
        |    count(*) AS n_events, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM r CROSS JOIN tot GROUP BY 1
        |),
        |c AS (
        |  SELECT decile, n_events, n_pos,
        |    CAST(sum(n_events) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_pos
        |  FROM bins
        |)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(n_events AS BIGINT) AS n_events, n_pos, cum_pos,
        |  round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS capture,
        |  round(CAST(cum_pos AS DOUBLE) * n
        |    / (CAST(cum_n AS DOUBLE) * tot_pos), 6) AS lift
        |FROM c CROSS JOIN tot ORDER BY decile""".stripMargin,

    "q_psi" -> {
      val picks = (1 to 9).map(i =>
        s"CAST(min(CASE WHEN rk = ($i*np1 + 9) // 10 THEN v END)" +
          s" AS BIGINT) AS b$i").mkString(",\n    ")
      val binExpr = "CAST(1 + " + (1 to 9)
        .map(i => s"(CASE WHEN v > b$i THEN 1 ELSE 0 END)")
        .mkString(" + ") + " AS BIGINT)"
      s"""WITH ev AS (
         |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS v, event_id,
         |    epoch_us(ts) // 86400000000 AS day
         |  FROM events
         |),
         |span AS (SELECT min(day) AS d0, max(day) AS dmax FROM ev),
         |per AS (
         |  SELECT v, event_id,
         |    CAST(CASE WHEN day - d0 < (dmax - d0 + 2) // 2
         |      THEN 1 ELSE 2 END AS BIGINT) AS period
         |  FROM ev CROSS JOIN span
         |),
         |p1 AS (SELECT v, event_id FROM per WHERE period = 1),
         |n1t AS (SELECT CAST(count(*) AS BIGINT) AS np1 FROM p1),
         |r AS (
         |  SELECT v, CAST(row_number() OVER (ORDER BY v, event_id)
         |    AS BIGINT) AS rk
         |  FROM p1
         |),
         |bounds AS (
         |  SELECT
         |    $picks
         |  FROM r CROSS JOIN n1t
         |),
         |counts AS (
         |  SELECT period, $binExpr AS bin, count(*) AS n
         |  FROM per CROSS JOIN bounds GROUP BY 1, 2
         |),
         |grid AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT)
         |           AS bin),
         |tots AS (
         |  SELECT CAST(sum(CASE WHEN period = 1 THEN n ELSE 0 END)
         |           AS BIGINT) AS t1,
         |         CAST(sum(CASE WHEN period = 2 THEN n ELSE 0 END)
         |           AS BIGINT) AS t2
         |  FROM counts
         |),
         |wide AS (
         |  SELECT bin,
         |    CAST(coalesce(c1.n, 0) AS BIGINT) AS n1,
         |    CAST(coalesce(c2.n, 0) AS BIGINT) AS n2, t1, t2,
         |    CAST(coalesce(c1.n, 0) + 1 AS DOUBLE) / (t1 + 10) AS p,
         |    CAST(coalesce(c2.n, 0) + 1 AS DOUBLE) / (t2 + 10) AS q,
         |    round((CAST(coalesce(c1.n, 0) + 1 AS DOUBLE) / (t1 + 10)
         |       - CAST(coalesce(c2.n, 0) + 1 AS DOUBLE) / (t2 + 10))
         |      * round(ln(CAST((coalesce(c1.n, 0) + 1) * (t2 + 10) AS DOUBLE)
         |        / CAST((coalesce(c2.n, 0) + 1) * (t1 + 10) AS DOUBLE)), 8),
         |      8) AS term
         |  FROM grid
         |  LEFT JOIN (SELECT bin, n FROM counts WHERE period = 1) c1
         |    USING (bin)
         |  LEFT JOIN (SELECT bin, n FROM counts WHERE period = 2) c2
         |    USING (bin)
         |  CROSS JOIN tots
         |),
         |psi AS (SELECT round(${dsumSql("term", 8)}, 6) AS psi FROM wide)
         |SELECT bin, n1, n2, round(p, 6) AS p, round(q, 6) AS q, psi
         |FROM wide CROSS JOIN psi ORDER BY bin""".stripMargin
    },
  )
}
