package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-9 additions: the preference-and-causal corner of an evaluation
  * pipeline — Bradley-Terry strength estimation from pairwise
  * comparisons (the reward-model / arena-ranking primitive), isotonic
  * calibration by the exact minimax characterization of PAVA (the
  * "probabilities that are actually monotone in the score" fit),
  * Kendall τ-b rank agreement on the calendar-bounded daily grid, and
  * rank-matched treatment/control pairing within propensity buckets
  * (the observational-causal "compare like with like" step).
  *
  * Determinism: comparisons, wins, concordances, and bucket sums are
  * exact BIGINTs; iterative float updates (Bradley-Terry MM) follow the
  * house per-term round-8 / decimal-sum / re-round discipline so the
  * DuckDB oracle unrolls identical rounds; isotonic interval rates are
  * round-12 from exact integer pairs, and the minimax over them
  * compares identical doubles in both engines.
  */
object Wave9 {

  /** Integer-cents quantization of the events `value` double. */
  private val CentsSpark =
    "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"
  private def centsSql = "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"

  /** Micros-per-day (q_sprt day bucketing). */
  private val DayUs = "86400000000"

  /** q_bradley_terry: MM iteration count (unrolled in the oracle). */
  private val BtRounds = 3

  /** q_isotonic: score-bucket count (the calibration grid is ALWAYS
    * this many rows — every post-aggregation stage is metadata). */
  private val IsoBuckets = 20
  private val IsoWidth = 2000 // cents per bucket

  val queries: Map[String, Q] = strictMap(

    // BRADLEY-TERRY strength from pairwise daily comparisons: event type
    // i "beats" j on any day its cents total is strictly higher (ties
    // drop — no half-win float). ONE (type, day) partial-agg'd shuffle
    // builds the calendar-bounded daily grid; the k×k comparison table
    // and all MM rounds are metadata-scale. Each MM round is the
    // textbook minorize-maximize update θ_i ← W_i / Σ_j n_ij/(θ_i+θ_j),
    // sum-normalized to k, with every division round-8 from identical
    // inputs and every sum decimal-backed — so the oracle replays the
    // rounds bit-for-bit. The arena-ranking / reward-model primitive.
    "q_bradley_terry" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr("event_type", s"unix_micros(ts) DIV $DayUs AS day",
          s"$CentsSpark AS cents")
        .groupBy("event_type", "day")
        .agg(sum(col("cents")).as("c"))
      val w = daily.as("a").join(daily.as("b"), Seq("day"))
        .where(col("a.event_type") =!= col("b.event_type") &&
          col("a.c") > col("b.c"))
        .groupBy(col("a.event_type").as("i"), col("b.event_type").as("j"))
        .agg(count(lit(1)).as("wij"))
      // full ordered-pair grid with n_ij = w_ij + w_ji (absent → 0)
      // the comparison grid feeds every MM round (and wins feeds the
      // round update + the final projection): materialize ONCE — the
      // k(k−1)-row table is metadata, but its lineage is the daily
      // self-join, which would otherwise re-plan and re-execute per
      // round (measured 16.5 → ~2 s at sf0.1)
      import graft.operators.Ckpt._
      val pairs = w.select(col("i"), col("j"), col("wij"))
        .join(w.select(col("j").as("i"), col("i").as("j"),
          col("wij").as("wji")), Seq("i", "j"), "full_outer")
        .selectExpr("i", "j", "coalesce(wij, CAST(0 AS BIGINT)) AS wij",
          "coalesce(wij, CAST(0 AS BIGINT))" +
            " + coalesce(wji, CAST(0 AS BIGINT)) AS nij")
        .ckpt()
      val items = pairs.select(col("i")).distinct()
      val wins = pairs.groupBy("i").agg(sum(col("wij")).as("wi"),
        sum(col("nij")).as("ni")).ckpt()
      var th = items.withColumn("th", lit(1.0)).ckpt()
      for (_ <- 1 to BtRounds) {
        val den = pairs
          .join(th.select(col("i"), col("th").as("ti")), Seq("i"))
          .join(th.select(col("i").as("j"), col("th").as("tj")), Seq("j"))
          .withColumn("t", expr("round(CAST(nij AS DOUBLE) / (ti + tj), 8)"))
          .groupBy("i").agg(dsum(col("t"), 8).as("d"))
        val raw = den.join(wins, Seq("i"))
          .selectExpr("i", "round(CAST(wi AS DOUBLE) / d, 8) AS th")
        val tot = raw.agg(dsum(col("th"), 8).as("s"),
          count(lit(1)).as("k"))
        th = raw.crossJoin(broadcast(tot))
          .selectExpr("i", "round(CAST(k AS DOUBLE) * th / s, 8) AS th")
          .ckpt()
      }
      th.join(wins, Seq("i"))
        .select(col("i").as("event_type"), col("wi").as("wins"),
          col("ni").as("comparisons"), round(col("th"), 6).as("strength"))
        .orderBy(desc("strength"), asc("event_type"))
    }),

    // ISOTONIC calibration by the exact minimax characterization of
    // PAVA: iso_i = max_{a≤i} min_{b≥i} rate(a..b) over IsoBuckets
    // fixed-width score buckets — identical to the pool-adjacent-
    // violators fit, but expressed as bounded-grid joins instead of a
    // sequential sweep (the grid is ALWAYS IsoBuckets rows, so the
    // O(B³) interval enumeration is metadata at any corpus size; the
    // ONE data-scale stage is the bucket count shuffle). Interval rates
    // are round-12 doubles from exact integer (conv, n) pairs, so the
    // minimax compares identical values in both engines. Spec pins the
    // fit's monotonicity — the property the raw rates lack.
    "q_isotonic" -> ((s, dir) => {
      val b = table(s, dir, "events")
        .selectExpr(
          s"least($CentsSpark DIV $IsoWidth, ${IsoBuckets - 1}) AS bkt",
          "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y")
        .groupBy("bkt")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("conv"))
      val grid = s.range(IsoBuckets).select(col("id").as("bkt"))
        .join(b, Seq("bkt"), "left_outer")
        .selectExpr("bkt", "coalesce(n, CAST(0 AS BIGINT)) AS n",
          "coalesce(conv, CAST(0 AS BIGINT)) AS conv")
      // all intervals [a, b] with pooled totals (empty intervals keep
      // n = 0 and are excluded — rate undefined)
      val ids = s.range(IsoBuckets).select(col("id"))
      val iv = ids.select(col("id").as("a"))
        .crossJoin(ids.select(col("id").as("bb"))).where(col("a") <= col("bb"))
        .join(grid, col("bkt") >= col("a") && col("bkt") <= col("bb"))
        .groupBy("a", "bb")
        .agg(sum(col("n")).as("sn"), sum(col("conv")).as("sc"))
        .where(col("sn") > 0)
        .selectExpr("a", "bb",
          "round(CAST(sc AS DOUBLE) / CAST(sn AS DOUBLE), 12) AS r")
      val iso = ids.select(col("id").as("i"))
        .join(iv, col("a") <= col("i") && col("bb") >= col("i"))
        .groupBy("i", "a").agg(min(col("r")).as("m"))
        .groupBy("i").agg(max(col("m")).as("iso"))
      grid.join(iso, col("bkt") === col("i"), "left_outer")
        .selectExpr("bkt", "n", "conv",
          "CASE WHEN n > 0 THEN" +
            " round(CAST(conv AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS raw",
          "round(iso, 6) AS iso")
        .orderBy("bkt")
    }),

    // KENDALL τ-b between daily click and purchase counts: concordant /
    // discordant / tied pair counts over the CALENDAR-BOUNDED daily grid
    // (the self-join is |days|², which grows with time, never with
    // corpus size — the scale contract that makes exact τ affordable;
    // unbounded-n τ belongs to inversion-counting via range-partitioned
    // merge, not a pair join). All counts exact BIGINTs; τ-b is one
    // identically-spelled float chain.
    "q_kendall" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .selectExpr(s"unix_micros(ts) DIV $DayUs AS day", "event_type")
        .groupBy("day")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      daily.as("p").join(daily.as("q"), col("p.day") < col("q.day"))
        .selectExpr(
          "CAST(sign((p.x - q.x) * (p.y - q.y)) AS BIGINT) AS s",
          "CAST(CASE WHEN p.x = q.x THEN 1 ELSE 0 END AS BIGINT) AS tx",
          "CAST(CASE WHEN p.y = q.y THEN 1 ELSE 0 END AS BIGINT) AS ty")
        .agg(count(lit(1)).as("n0"),
          sum(when(col("s") === 1L, 1L).otherwise(0L)).as("c"),
          sum(when(col("s") === -1L, 1L).otherwise(0L)).as("d"),
          sum(col("tx")).as("tx"), sum(col("ty")).as("ty"))
        .selectExpr("n0", "c", "d", "tx", "ty",
          "round((CAST(c AS DOUBLE) - CAST(d AS DOUBLE)) /" +
            " sqrt((CAST(n0 AS DOUBLE) - tx) * (CAST(n0 AS DOUBLE) - ty))," +
            " 6) AS tau_b")
    }),

    // PROPENSITY-BUCKET rank matching: users split into variants by id
    // parity; global spend deciles proxy the propensity strata; within
    // each (decile), the r-th ranked treated user (by cents, id — the
    // tie-broken total order) matches the r-th ranked control. TWO
    // distributed Ranks passes (global decile; within-stratum order) +
    // ONE (decile, rank) equi-join — never a greedy sequential sweep, so
    // matching scales and is deterministic. Output: per-decile match
    // counts + exact-integer mean absolute spend gap of matched pairs
    // (the post-match balance diagnostic).
    "q_psm_match" -> ((s, dir) => {
      val ux = table(s, dir, "events")
        .selectExpr("user_id", s"$CentsSpark AS cents")
        .groupBy("user_id").agg(sum(col("cents")).as("x"))
        .withColumn("variant", col("user_id") % 2)
        .withColumn("kk", lit(1))
      val n = ux.count()
      val dec = graft.operators.Ranks.withinKey(ux, "kk", Seq("x", "user_id"))
        .withColumn("decile", expr(s"(rk - 1) * 10 DIV $n"))
        .drop("rk", "kk")
        .withColumn("dv", col("decile") * 2 + col("variant"))
      val ranked = graft.operators.Ranks
        .withinKey(dec, "dv", Seq("x", "user_id"))
      val t = ranked.where(col("variant") === 1)
        .select(col("decile"), col("rk"), col("x").as("xt"))
      val c = ranked.where(col("variant") === 0)
        .select(col("decile"), col("rk"), col("x").as("xc"))
      val m = t.join(c, Seq("decile", "rk"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_matched"),
          sum(expr("abs(xt - xc)")).as("gap"))
      ranked.groupBy("decile")
        .agg(sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_treated"),
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_control"))
        .join(m, Seq("decile"), "left_outer")
        .selectExpr("decile", "n_treated", "n_control",
          "coalesce(n_matched, CAST(0 AS BIGINT)) AS n_matched",
          "CASE WHEN n_matched > 0 THEN" +
            " round(CAST(gap AS DOUBLE) / CAST(n_matched AS DOUBLE), 6)" +
            " END AS mean_gap")
        .orderBy("decile")
    }),
  )

  /** One unrolled Bradley-Terry MM round (oracle twin): t$r from
    * t${r-1} — per-pair round-8 division, decimal-8 sums, round-8
    * update, round-8 sum-normalization to k. */
  private def btRoundSql(r: Int): String =
    s"""den$r AS (
       |  SELECT p.i, ${dsumSql("round(CAST(p.nij AS DOUBLE) / (ti.th + tj.th), 8)", 8)} AS d
       |  FROM pairs p
       |  JOIN t${r - 1} ti ON ti.i = p.i
       |  JOIN t${r - 1} tj ON tj.i = p.j
       |  GROUP BY p.i
       |),
       |raw$r AS (
       |  SELECT den$r.i, round(CAST(w.wi AS DOUBLE) / den$r.d, 8) AS th
       |  FROM den$r JOIN wins w ON w.i = den$r.i
       |),
       |t$r AS (
       |  SELECT i, round(
       |    (SELECT CAST(count(*) AS DOUBLE) FROM raw$r) * th /
       |    (SELECT ${dsumSql("th", 8)} FROM raw$r), 8) AS th
       |  FROM raw$r
       |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_bradley_terry" ->
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    CAST(sum($centsSql) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |),
         |w AS (
         |  SELECT a.event_type AS i, b.event_type AS j, count(*) AS wij
         |  FROM daily a JOIN daily b
         |    ON a.day = b.day AND a.event_type <> b.event_type AND a.c > b.c
         |  GROUP BY 1, 2
         |),
         |pairs AS (
         |  SELECT coalesce(w1.i, w2.i) AS i, coalesce(w1.j, w2.j) AS j,
         |    CAST(coalesce(w1.wij, 0) AS BIGINT) AS wij,
         |    CAST(coalesce(w1.wij, 0) + coalesce(w2.wji, 0) AS BIGINT) AS nij
         |  FROM w w1
         |  FULL OUTER JOIN (SELECT j AS i, i AS j, wij AS wji FROM w) w2
         |    ON w1.i = w2.i AND w1.j = w2.j
         |),
         |wins AS (
         |  SELECT i, CAST(sum(wij) AS BIGINT) AS wi,
         |    CAST(sum(nij) AS BIGINT) AS ni
         |  FROM pairs GROUP BY i
         |),
         |t0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS th FROM pairs),
         |${(1 to BtRounds).map(btRoundSql).mkString(",\n")}
         |SELECT t.i AS event_type, w.wi AS wins, w.ni AS comparisons,
         |  round(t.th, 6) AS strength
         |FROM t$BtRounds t JOIN wins w ON w.i = t.i
         |ORDER BY strength DESC, event_type""".stripMargin,

    "q_isotonic" ->
      s"""WITH b AS (
         |  SELECT least($centsSql // $IsoWidth, ${IsoBuckets - 1}) AS bkt,
         |    count(*) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conv
         |  FROM events GROUP BY 1
         |),
         |grid AS (
         |  SELECT g.f AS bkt, CAST(coalesce(b.n, 0) AS BIGINT) AS n,
         |    CAST(coalesce(b.conv, 0) AS BIGINT) AS conv
         |  FROM (SELECT CAST(unnest(range($IsoBuckets)) AS BIGINT) AS f) g
         |  LEFT JOIN b ON b.bkt = g.f
         |),
         |iv AS (
         |  SELECT a.f AS a, bb.f AS bb,
         |    round(CAST(sum(g.conv) AS DOUBLE) / CAST(sum(g.n) AS DOUBLE), 12) AS r
         |  FROM (SELECT CAST(unnest(range($IsoBuckets)) AS BIGINT) AS f) a
         |  JOIN (SELECT CAST(unnest(range($IsoBuckets)) AS BIGINT) AS f) bb
         |    ON a.f <= bb.f
         |  JOIN grid g ON g.bkt BETWEEN a.f AND bb.f
         |  GROUP BY 1, 2 HAVING sum(g.n) > 0
         |),
         |iso AS (
         |  SELECT i, max(m) AS iso FROM (
         |    SELECT ii.f AS i, iv.a, min(iv.r) AS m
         |    FROM (SELECT CAST(unnest(range($IsoBuckets)) AS BIGINT) AS f) ii
         |    JOIN iv ON iv.a <= ii.f AND iv.bb >= ii.f
         |    GROUP BY 1, 2
         |  ) GROUP BY i
         |)
         |SELECT g.bkt, g.n, g.conv,
         |  CASE WHEN g.n > 0 THEN
         |    round(CAST(g.conv AS DOUBLE) / CAST(g.n AS DOUBLE), 6) END AS raw,
         |  round(iso.iso, 6) AS iso
         |FROM grid g LEFT JOIN iso ON iso.i = g.bkt
         |ORDER BY g.bkt""".stripMargin,

    "q_kendall" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1
         |),
         |pr AS (
         |  SELECT CAST(sign((p.x - q.x) * (p.y - q.y)) AS BIGINT) AS s,
         |    CASE WHEN p.x = q.x THEN 1 ELSE 0 END AS tx,
         |    CASE WHEN p.y = q.y THEN 1 ELSE 0 END AS ty
         |  FROM daily p JOIN daily q ON p.day < q.day
         |),
         |a AS (
         |  SELECT count(*) AS n0,
         |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         |    CAST(sum(tx) AS BIGINT) AS tx, CAST(sum(ty) AS BIGINT) AS ty
         |  FROM pr
         |)
         |SELECT CAST(n0 AS BIGINT) AS n0, c, d, tx, ty,
         |  round((CAST(c AS DOUBLE) - CAST(d AS DOUBLE)) /
         |    sqrt((CAST(n0 AS DOUBLE) - tx) * (CAST(n0 AS DOUBLE) - ty)), 6)
         |    AS tau_b
         |FROM a""".stripMargin,

    "q_psm_match" ->
      s"""WITH ux AS (
         |  SELECT user_id, CAST(sum($centsSql) AS BIGINT) AS x,
         |    user_id % 2 AS variant
         |  FROM events GROUP BY user_id
         |),
         |dec AS (
         |  SELECT user_id, x, variant,
         |    (row_number() OVER (ORDER BY x, user_id) - 1) * 10
         |      // (SELECT count(*) FROM ux) AS decile
         |  FROM ux
         |),
         |ranked AS (
         |  SELECT user_id, x, variant, decile,
         |    row_number() OVER (PARTITION BY decile, variant
         |                       ORDER BY x, user_id) AS rk
         |  FROM dec
         |),
         |m AS (
         |  SELECT t.decile, count(*) AS n_matched,
         |    CAST(sum(abs(t.x - c.x)) AS BIGINT) AS gap
         |  FROM ranked t JOIN ranked c
         |    ON t.decile = c.decile AND t.rk = c.rk
         |   AND t.variant = 1 AND c.variant = 0
         |  GROUP BY t.decile
         |),
         |tot AS (
         |  SELECT decile,
         |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_treated,
         |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_control
         |  FROM ranked GROUP BY decile
         |)
         |SELECT tot.decile, tot.n_treated, tot.n_control,
         |  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
         |  CASE WHEN m.n_matched > 0 THEN
         |    round(CAST(m.gap AS DOUBLE) / CAST(m.n_matched AS DOUBLE), 6)
         |  END AS mean_gap
         |FROM tot LEFT JOIN m ON m.decile = tot.decile
         |ORDER BY tot.decile""".stripMargin,
  )
}
