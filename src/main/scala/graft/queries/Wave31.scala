package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-31 additions — four families the catalog did not yet cover:
  *
  *  - q_fleiss_kappa: multi-rater (k > 2) chance-corrected agreement over
  *    the documents table — the labeling-quality gate of an annotation
  *    pipeline (Fleiss '71), the k-rater generalization of
  *    q_cohens_kappa. Three deterministic synthetic raters = md5-noised
  *    copies of a base category.
  *  - q_interval_union: per-user total COVERED time from overlapping
  *    event intervals (the union-of-intervals sweep): running-max-end
  *    island detection inside one per-user window pass — the
  *    availability / watch-time / session-coverage primitive.
  *  - q_critical_path: bounded-depth longest-path layering of the
  *    degree-oriented co-purchase DAG (the q_triangles orientation is
  *    acyclic by construction) — the DAG-scheduling primitive; after k
  *    relaxation rounds every level is exactly min(longest path, k).
  *  - q_conformal: split-conformal calibration of a per-type mean
  *    predictor — calibration-half nonconformity quantile at the
  *    ⌈(1−α)(n+1)⌉ rank (exact, via the distributed Ranks selection),
  *    then MEASURED test-half coverage: the distribution-free
  *    prediction-interval audit an ML-eval pipeline runs.
  *
  * Determinism: rater categories and the calibration split are integer
  * md5 algebra; Fleiss' Σ C_j² runs 128-bit (DECIMAL/HUGEINT — C_j ~ 3N
  * wraps int64 past ~10⁹ items); interval arithmetic is pure integer
  * microseconds; layering is integer max-relaxation; the conformal mean
  * and nonconformity are round-8 doubles from exact integers with
  * identical spelling both engines, ranked under a (nc, event_id) total
  * order. */
object Wave31 {

  /** Synthetic rater count (hard agreement floor: each item gets exactly
    * this many ratings). */
  private val Raters = 3

  /** Relaxation rounds for the layering: levels saturate at this depth
    * (level = min(longest path, k)) — the bounded-neighborhood contract,
    * same as [[graft.operators.Bfs]] rounds. */
  private val PathRounds = 4

  /** Co-purchase edge weight floor (suppliers sharing ≥ this many
    * orders), the q_triangles noise-floor semantics. */
  private val PathMinW = 5

  /** Conformal miscoverage α = 1/[[ConfAlphaInv]]. */
  private val ConfAlphaInv = 10

  val queries: Map[String, Q] = strictMap(

    // FLEISS KAPPA: the ×3 rater explode is narrow; the only data-scale
    // shuffles are the (doc, cat) count and its doc-level regroup. Column
    // totals C_j are 128-bit squared (C_j ~ 3N overflows int64 squared
    // past ~1e9 items). P̄o = (Σ n_ij² − 3N)/(6N), P̄e = Σ C_j²/(9N²),
    // κ = (P̄o − P̄e)/(1 − P̄e) — all exact integers until the final
    // correctly-rounded divisions, spelled identically in the oracle.
    "q_fleiss_kappa" -> ((s, dir) => {
      val rated = table(s, dir, "documents")
        .select(col("doc_id"), (col("n_chars") % 3).as("b"),
          explode(expr(s"sequence(0, ${Raters - 1})")).as("r"))
        .withColumn("h", expr("CAST(conv(substring(md5(concat('rate-', " +
          "CAST(r AS STRING), ':', CAST(doc_id AS STRING))), 1, 8), 16, 10)" +
          " AS BIGINT)"))
        .withColumn("cat",
          expr("CASE WHEN h % 10 < 3 THEN (b + 1 + h % 2) % 3 ELSE b END"))
      val nij = rated.groupBy("doc_id", "cat").agg(count(lit(1)).as("m"))
        .ckpt() // feeds the per-item squares AND the column totals
      val item = nij.groupBy("doc_id").agg(sum(expr("m * m")).as("s2"))
      val base = item.agg(count(lit(1)).as("n"), sum("s2").as("ss"))
      val cj = nij.groupBy("cat").agg(sum("m").as("cj"))
        .agg(sum(expr("CAST(cj AS DECIMAL(19,0)) * cj")).as("sc2"))
      base.crossJoin(broadcast(cj))
        .selectExpr("CAST(n AS BIGINT) AS n_items",
          s"CAST($Raters AS BIGINT) AS n_raters",
          s"round(CAST(ss - $Raters*n AS DOUBLE)" +
            s" / CAST(${Raters * (Raters - 1)}*n AS DOUBLE), 8) AS po",
          "round(CAST(sc2 AS DOUBLE) / (CAST(9 AS DOUBLE)" +
            " * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 8) AS pe")
        .selectExpr("n_items", "n_raters", "po", "pe",
          "CASE WHEN pe = CAST(1 AS DOUBLE) THEN CAST(NULL AS DOUBLE)" +
            " ELSE round((po - pe) / (CAST(1 AS DOUBLE) - pe), 6)" +
            " END AS kappa")
    }),

    // INTERVAL UNION: duration is a deterministic function of event_id
    // (1..60 s), islands found by the classic running-max-end sweep —
    // everything stays inside ONE per-user window partition (no cross-
    // user data movement; a user's events are the state bound), and the
    // arithmetic is pure integer microseconds.
    "q_interval_union" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("st", "event_id")
      val prior = w.rowsBetween(Window.unboundedPreceding, -1)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"))
        .withColumn("en", expr("st + (1 + event_id % 60) * 1000000"))
        .withColumn("pmax", max("en").over(prior))
        .withColumn("isl", sum(expr(
          "CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END")).over(run))
        .groupBy("user_id", "isl")
        .agg(count(lit(1)).as("ne"), (max("en") - min("st")).as("cov"))
        .groupBy("user_id")
        .agg(sum("ne").as("n_events"), count(lit(1)).as("n_islands"),
          sum("cov").as("covered_us"))
        .selectExpr("user_id", "CAST(n_events AS BIGINT) AS n_events",
          "CAST(n_islands AS BIGINT) AS n_islands",
          "CAST(covered_us AS BIGINT) AS covered_us")
        .orderBy("user_id")
    }),

    // CRITICAL PATH: the (degree, id) orientation of the co-purchase
    // graph is a DAG by construction (the q_triangles argument), so
    // longest-path layering is well-defined; after k max-relaxation
    // rounds level(v) = min(longest path ending at v, k) EXACTLY (any
    // length-ℓ path has a length-min(ℓ,k) suffix ending at the same
    // vertex) — the bounded-depth contract, identical in the unrolled
    // oracle. Each round is one edge join + max-regroup; per-round
    // frames are ckpt'd (two consumers: the join and the union).
    "q_critical_path" -> ((s, dir) => {
      val os = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val und = os.alias("a").join(os.alias("b"), Seq("ok"))
        .where(col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= PathMinW).select("u", "v")
        .ckpt()
      val deg = und.select(col("u").as("x"))
        .unionAll(und.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
        .ckpt()
      val oriented = und
        .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
        .selectExpr(
          "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS s",
          "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS t")
        .ckpt()
      var lvl = deg.select(col("x").as("v"), lit(0L).as("l"))
      for (_ <- 1 to PathRounds)
        lvl = lvl.join(oriented, col("v") === col("s"))
          .select(col("t").as("v"), (col("l") + 1).as("c"))
          .unionByName(lvl.select(col("v"), col("l").as("c")))
          .groupBy("v").agg(max("c").as("l"))
          .ckpt() // consumed twice next round (join side + union side)
      lvl.groupBy(col("l").as("level"))
        .agg(count(lit(1)).as("n_vertices"))
        .selectExpr("CAST(level AS BIGINT) AS level",
          "CAST(n_vertices AS BIGINT) AS n_vertices")
        .orderBy("level")
    }),

    // CONFORMAL: calibration/test split by event_id md5 parity; the
    // predictor is the calibration per-type mean (round-8 from exact
    // integer sums); q̂ = nonconformity value at the exact
    // ⌈(1−α)(n_cal+1)⌉ rank — a distributed Ranks selection under the
    // (nc, event_id) total order, never a per-type sort buffer; coverage
    // is then MEASURED on the held-out half. At 100 TB the only
    // data-scale stages are the split scan, one rank selection, and one
    // broadcast join of the per-type (μ, q̂) table.
    "q_conformal" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8)," +
            " 16, 10) AS BIGINT) % 2").as("half"))
        .ckpt() // read by the calibration AND test sides
      val cal = ev.where(col("half") === 0)
      val mu = cal.groupBy("event_type")
        .agg(count(lit(1)).as("n_cal"), sum("vq").as("sv"))
        .withColumn("mu", expr("round(CAST(sv AS DOUBLE)" +
          " / CAST(n_cal AS DOUBLE), 8)"))
        .select("event_type", "n_cal", "mu")
      val nc = cal.join(broadcast(mu), "event_type")
        .withColumn("nc",
          expr("round(abs(CAST(vq AS DOUBLE) - mu), 8)"))
        .select("event_type", "event_id", "nc")
      val ranked = graft.operators.Ranks
        .withinKey(nc, "event_type", Seq("nc", "event_id"))
      val qhat = ranked.join(broadcast(mu), "event_type")
        .where(col("rk") === expr(
          s"least(n_cal, (${ConfAlphaInv - 1} * (n_cal + 1)" +
            s" + ${ConfAlphaInv - 1}) DIV $ConfAlphaInv)"))
        .select(col("event_type"), col("nc").as("qh"))
      val cov = ev.where(col("half") === 1)
        .join(broadcast(mu), "event_type")
        .join(broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_test"),
          sum(expr("CASE WHEN round(abs(CAST(vq AS DOUBLE) - mu), 8) <= qh" +
            " THEN 1 ELSE 0 END")).as("n_cov"))
      mu.join(qhat, "event_type").join(cov, Seq("event_type"), "left_outer")
        .selectExpr("event_type", "CAST(n_cal AS BIGINT) AS n_cal",
          "CAST(coalesce(n_test, 0) AS BIGINT) AS n_test",
          "round(mu, 6) AS mu", "round(qh, 6) AS qhat",
          "CASE WHEN n_test IS NULL OR n_test = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_cov AS DOUBLE) / n_test, 6) END AS coverage")
        .orderBy("event_type")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_fleiss_kappa" ->
      s"""WITH rs AS (SELECT unnest(generate_series(0, ${Raters - 1})) AS r),
         |a AS (
         |  SELECT doc_id, n_chars % 3 AS b, r,
         |    ${hex2longSql("md5('rate-' || r || ':' || doc_id)", 1)} AS h
         |  FROM documents CROSS JOIN rs
         |),
         |c AS (
         |  SELECT doc_id,
         |    CASE WHEN h % 10 < 3 THEN (b + 1 + h % 2) % 3 ELSE b END AS cat
         |  FROM a
         |),
         |nij AS (SELECT doc_id, cat, count(*) AS m FROM c GROUP BY 1, 2),
         |item AS (SELECT doc_id, CAST(sum(m*m) AS BIGINT) AS s2
         |         FROM nij GROUP BY 1),
         |base AS (SELECT count(*) AS n, CAST(sum(s2) AS BIGINT) AS ss
         |         FROM item),
         |cj AS (SELECT cat, CAST(sum(m) AS BIGINT) AS cj
         |       FROM nij GROUP BY 1),
         |c2 AS (SELECT sum(CAST(cj AS HUGEINT) * cj) AS sc2 FROM cj),
         |f AS (
         |  SELECT CAST(n AS BIGINT) AS n_items,
         |    CAST($Raters AS BIGINT) AS n_raters,
         |    round(CAST(ss - $Raters*n AS DOUBLE)
         |      / CAST(${Raters * (Raters - 1)}*n AS DOUBLE), 8) AS po,
         |    round(CAST(sc2 AS DOUBLE) / (CAST(9 AS DOUBLE)
         |      * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 8) AS pe
         |  FROM base CROSS JOIN c2
         |)
         |SELECT n_items, n_raters, po, pe,
         |  CASE WHEN pe = CAST(1 AS DOUBLE) THEN CAST(NULL AS DOUBLE)
         |       ELSE round((po - pe) / (CAST(1 AS DOUBLE) - pe), 6)
         |       END AS kappa
         |FROM f""".stripMargin,

    "q_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + (1 + event_id % 60) * 1000000 AS en
        |  FROM events
        |),
        |m AS (
        |  SELECT user_id, event_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv
        |),
        |isl AS (
        |  SELECT user_id, st, en,
        |    sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY st, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m
        |),
        |g AS (
        |  SELECT user_id, isl, count(*) AS ne,
        |    max(en) - min(st) AS cov
        |  FROM isl GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(ne) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(cov) AS BIGINT) AS covered_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_critical_path" -> {
      val rounds = (1 to PathRounds).map { i =>
        s"""l$i AS (
           |  SELECT v, CAST(max(c) AS BIGINT) AS l FROM (
           |    SELECT e.t AS v, l${i - 1}.l + 1 AS c
           |    FROM l${i - 1} JOIN e ON l${i - 1}.v = e.s
           |    UNION ALL
           |    SELECT v, l FROM l${i - 1}
           |  ) GROUP BY v
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH os AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
         |),
         |und AS (
         |  SELECT a.sk AS u, b.sk AS v
         |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING count(*) >= $PathMinW
         |),
         |deg AS (
         |  SELECT x, count(*) AS d FROM (
         |    SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und
         |  ) GROUP BY x
         |),
         |e AS (
         |  SELECT CASE WHEN du < dv OR (du = dv AND u < v)
         |              THEN u ELSE v END AS s,
         |         CASE WHEN du < dv OR (du = dv AND u < v)
         |              THEN v ELSE u END AS t
         |  FROM und
         |  JOIN (SELECT x AS u, d AS du FROM deg) USING (u)
         |  JOIN (SELECT x AS v, d AS dv FROM deg) USING (v)
         |),
         |l0 AS (SELECT x AS v, CAST(0 AS BIGINT) AS l FROM deg),
         |$rounds
         |SELECT CAST(l AS BIGINT) AS level,
         |  CAST(count(*) AS BIGINT) AS n_vertices
         |FROM l$PathRounds GROUP BY 1 ORDER BY level""".stripMargin
    },

    "q_conformal" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
         |    ${hex2longSql("md5(CAST(event_id AS VARCHAR))", 1)} % 2 AS half
         |  FROM events WHERE value IS NOT NULL
         |),
         |mu AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
         |    round(CAST(sum(vq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
         |      AS mu
         |  FROM ev WHERE half = 0 GROUP BY 1
         |),
         |nc AS (
         |  SELECT ev.event_type, event_id,
         |    round(abs(CAST(vq AS DOUBLE) - mu), 8) AS nc
         |  FROM ev JOIN mu USING (event_type) WHERE half = 0
         |),
         |r AS (
         |  SELECT event_type, nc,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY nc, event_id) AS BIGINT) AS rk
         |  FROM nc
         |),
         |qh AS (
         |  SELECT r.event_type, nc AS qh
         |  FROM r JOIN mu USING (event_type)
         |  WHERE rk = least(n_cal, (${ConfAlphaInv - 1} * (n_cal + 1)
         |    + ${ConfAlphaInv - 1}) // $ConfAlphaInv)
         |),
         |cov AS (
         |  SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN round(abs(CAST(vq AS DOUBLE) - mu), 8)
         |      <= qh THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
         |  FROM ev JOIN mu USING (event_type) JOIN qh USING (event_type)
         |  WHERE half = 1 GROUP BY 1
         |)
         |SELECT event_type, n_cal,
         |  CAST(coalesce(n_test, 0) AS BIGINT) AS n_test,
         |  round(mu, 6) AS mu, round(qh, 6) AS qhat,
         |  CASE WHEN n_test IS NULL OR n_test = 0 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(n_cov AS DOUBLE) / n_test, 6) END AS coverage
         |FROM mu JOIN qh USING (event_type)
         |LEFT JOIN cov USING (event_type)
         |ORDER BY event_type""".stripMargin,
  )
}
