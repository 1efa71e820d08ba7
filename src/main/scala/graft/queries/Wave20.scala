package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-20 additions: the scale-planning audits —
  *
  *  - q_effective_diameter: 90%-effective diameter from the HyperANF
  *    neighborhood function (q_hyperanf's register machinery, factored
  *    and reused) — the Boldi-Vigna deliverable, and the r5-verdict
  *    answer to distance statistics without per-source BFS state,
  *  - q_skew_audit: per-join-key frequency skew (max/avg factor, exact
  *    p50/p99 of the key-frequency distribution) for the three lineitem
  *    keys in ONE pass — the number that decides salting vs plain
  *    shuffle BEFORE the 100 TB join is launched,
  *  - q_burstiness: per-user inter-event gap burstiness
  *    B = (σ−μ)/(σ+μ) (Goh-Barabási) — B → −1 periodic, ≈ 0 Poisson,
  *    → 1 bursty; tells a sessionizer/rate-limiter what arrival model
  *    to assume. Gap moments are exact 128-bit integer sums.
  *
  * Determinism: NF values ride q_hyperanf's exact register arithmetic;
  * frequency percentiles are rank-selected integers (the
  * q_percentile_disc convention); burstiness is one identically-spelled
  * IEEE chain (sqrt is correctly rounded — no libm-divergent ln). */
object Wave20 {

  val queries: Map[String, Q] = strictMap(

    // EFFECTIVE DIAMETER: smallest t with NF(t) ≥ 0.9·NF(t_max), with
    // linear interpolation between the straddling rounds. The NF table
    // is rounds×1 metadata from the factored ANF chain (ckpt'd — the
    // last-round, threshold-scan, and both interpolation joins all read
    // it); NF is nondecreasing in t so the interpolation denominator is
    // strictly positive whenever d90 > 0.
    "q_effective_diameter" -> ((s, dir) => {
      val nf = Graphs.anfNf(s, dir).ckpt()
      val last = nf.orderBy(desc("t")).limit(1)
        .select(col("t").as("t_max"), col("sum_est").as("nf_inf"))
      val d90 = nf.crossJoin(broadcast(last))
        .where(expr("sum_est >= CAST(0.9 AS DOUBLE) * nf_inf"))
        .agg(min("t").as("d90"))
      last.crossJoin(broadcast(d90))
        .join(nf.select(col("t").as("d90"), col("sum_est").as("nf_at")),
          Seq("d90"), "left_outer")
        .join(nf.select((col("t") + 1).as("d90"),
          col("sum_est").as("nf_prev")), Seq("d90"), "left_outer")
        .selectExpr("CAST(t_max AS BIGINT) AS t_max", "nf_inf",
          "CAST(d90 AS BIGINT) AS d90",
          "CASE WHEN d90 = 0 THEN CAST(0 AS DOUBLE)" +
            " ELSE round(CAST(d90 - 1 AS DOUBLE)" +
            " + (CAST(0.9 AS DOUBLE) * nf_inf - nf_prev)" +
            " / (nf_at - nf_prev), 4) END AS d_eff")
    }),

    // SKEW AUDIT: one stack pass widens lineitem to (key_name, key_val)
    // rows — 3× the scan but ONE partial-agg'd shuffle builds all three
    // frequency tables at once. Percentiles of the frequency
    // distribution are rank-selected exact integers on the distributed
    // Ranks pass (never a whole-group buffer); skew_factor = max/avg is
    // the salting decision number (≈ 1 uniform, ≫ 1 salt the key).
    "q_skew_audit" -> ((s, dir) => {
      val freqs = table(s, dir, "lineitem")
        .selectExpr("stack(3, 'l_orderkey', l_orderkey," +
          " 'l_partkey', l_partkey, 'l_suppkey', l_suppkey)" +
          " AS (kname, kval)")
        .groupBy("kname", "kval").agg(count(lit(1)).as("freq"))
        .ckpt() // feeds the rank pass + the per-key stats
      val ranked = graft.operators.Ranks
        .withinKey(freqs, "kname", Seq("freq", "kval"))
      val stats = freqs.groupBy("kname").agg(count(lit(1)).as("n_keys"),
        sum("freq").as("n_rows"), max("freq").as("max_freq"))
      val picks = ranked
        .join(stats.select(col("kname"), col("n_keys")), "kname")
        .where(expr("rk = (n_keys + 1) DIV 2" +
          " OR rk = (99*n_keys + 99) DIV 100"))
        .groupBy("kname")
        .agg(min(when(expr("rk = (n_keys + 1) DIV 2"), col("freq")))
          .as("p50_freq"),
          min(when(expr("rk = (99*n_keys + 99) DIV 100"), col("freq")))
            .as("p99_freq"))
      stats.join(picks, "kname")
        .selectExpr("kname AS key_name", "CAST(n_rows AS BIGINT) AS n_rows",
          "CAST(n_keys AS BIGINT) AS n_keys",
          "CAST(max_freq AS BIGINT) AS max_freq",
          "round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS avg_freq",
          "round(CAST(max_freq AS DOUBLE) * n_keys / n_rows, 4)" +
            " AS skew_factor",
          "CAST(p50_freq AS BIGINT) AS p50_freq",
          "CAST(p99_freq AS BIGINT) AS p99_freq")
        .orderBy("key_name")
    }),

    // BURSTINESS: per-user inter-event gaps (lag over the user window —
    // tied timestamps give identical gap multisets under any tie order,
    // so the moments are partition-invariant), gap moments as exact
    // DECIMAL(38,0)/HUGEINT sums (g² ~ 10²⁴ overflows int64), then one
    // identically-spelled float chain per user. Top-20 most-active
    // users shown; the all-user mean rides every row. All-zero-gap
    // users (σ+μ = 0) are NULL by contract and excluded from the mean.
    "q_burstiness" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val per = table(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
          col("event_id"))
        .withColumn("prev", lag("us", 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("user_id"), (col("us") - col("prev")).as("g"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(expr("CAST(g AS DECIMAL(38,0))")).as("sg"),
          sum(expr("CAST(g AS DECIMAL(38,0)) * g")).as("sgg"))
        .where(col("n_gaps") >= 2)
        .withColumn("mu", expr("CAST(sg AS DOUBLE) / n_gaps"))
        .withColumn("sigma", expr(
          "sqrt(greatest(CAST(sgg AS DOUBLE) / n_gaps" +
            " - (CAST(sg AS DOUBLE) / n_gaps)" +
            " * (CAST(sg AS DOUBLE) / n_gaps), CAST(0 AS DOUBLE)))"))
        .withColumn("b", expr(
          "CASE WHEN sigma + mu = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round((sigma - mu) / (sigma + mu), 6) END"))
        .ckpt() // feeds the all-user mean + the top-20 rows
      val mean = per.where(col("b").isNotNull)
        .agg(count(lit(1)).as("nb"), dsum(col("b"), 6).as("sb"))
        .selectExpr("CAST(nb AS BIGINT) AS n_users",
          "round(sb / nb, 6) AS mean_b")
      per.orderBy(desc("n_gaps"), asc("user_id")).limit(20)
        .crossJoin(broadcast(mean))
        .selectExpr("user_id", "CAST(n_gaps AS BIGINT) AS n_gaps",
          "round(mu / 1000000, 4) AS mean_gap_s",
          "round(sigma / 1000000, 4) AS sd_gap_s",
          "b AS burstiness", "n_users", "mean_b")
        .orderBy(desc("n_gaps"), asc("user_id"))
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_effective_diameter" ->
      s"""WITH ${Graphs.anfNfSql},
         |last AS (SELECT t AS t_max, sum_est AS nf_inf FROM nf
         |         ORDER BY t DESC LIMIT 1),
         |d AS (SELECT min(t) AS d90 FROM nf CROSS JOIN last
         |      WHERE sum_est >= CAST(0.9 AS DOUBLE) * nf_inf)
         |SELECT CAST(t_max AS BIGINT) AS t_max, nf_inf,
         |  CAST(d90 AS BIGINT) AS d90,
         |  CASE WHEN d90 = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE round(CAST(d90 - 1 AS DOUBLE)
         |         + (CAST(0.9 AS DOUBLE) * nf_inf - p.sum_est)
         |         / (c.sum_est - p.sum_est), 4) END AS d_eff
         |FROM last CROSS JOIN d
         |LEFT JOIN nf c ON c.t = d90
         |LEFT JOIN nf p ON p.t = d90 - 1""".stripMargin,

    "q_skew_audit" ->
      """WITH long AS (
        |  SELECT 'l_orderkey' AS kname, l_orderkey AS kval FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
        |),
        |f AS (SELECT kname, kval, count(*) AS freq FROM long GROUP BY 1, 2),
        |r AS (
        |  SELECT kname, freq,
        |    CAST(row_number() OVER (PARTITION BY kname
        |      ORDER BY freq, kval) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY kname) AS BIGINT) AS n_keys
        |  FROM f
        |),
        |st AS (SELECT kname, count(*) AS n_keys,
        |         CAST(sum(freq) AS BIGINT) AS n_rows,
        |         max(freq) AS max_freq
        |       FROM f GROUP BY kname),
        |p AS (
        |  SELECT kname,
        |    CAST(min(CASE WHEN rk = (n_keys + 1) // 2 THEN freq END)
        |      AS BIGINT) AS p50_freq,
        |    CAST(min(CASE WHEN rk = (99*n_keys + 99) // 100 THEN freq END)
        |      AS BIGINT) AS p99_freq
        |  FROM r GROUP BY kname
        |)
        |SELECT st.kname AS key_name, n_rows,
        |  CAST(st.n_keys AS BIGINT) AS n_keys,
        |  CAST(max_freq AS BIGINT) AS max_freq,
        |  round(CAST(n_rows AS DOUBLE) / st.n_keys, 4) AS avg_freq,
        |  round(CAST(max_freq AS DOUBLE) * st.n_keys / n_rows, 4)
        |    AS skew_factor,
        |  p50_freq, p99_freq
        |FROM st JOIN p USING (kname) ORDER BY key_name""".stripMargin,

    "q_burstiness" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
         |),
         |g AS (
         |  SELECT user_id, us - lag(us) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id) AS g
         |  FROM ev
         |),
         |per AS (
         |  SELECT user_id, count(*) AS n_gaps,
         |    sum(CAST(g AS HUGEINT)) AS sg,
         |    sum(CAST(g AS HUGEINT) * g) AS sgg
         |  FROM g WHERE g IS NOT NULL
         |  GROUP BY user_id HAVING count(*) >= 2
         |),
         |m AS (
         |  SELECT user_id, n_gaps,
         |    CAST(sg AS DOUBLE) / n_gaps AS mu,
         |    sqrt(greatest(CAST(sgg AS DOUBLE) / n_gaps
         |      - (CAST(sg AS DOUBLE) / n_gaps)
         |      * (CAST(sg AS DOUBLE) / n_gaps), CAST(0 AS DOUBLE))) AS sigma
         |  FROM per
         |),
         |wb AS (
         |  SELECT user_id, n_gaps, mu, sigma,
         |    CASE WHEN sigma + mu = 0 THEN CAST(NULL AS DOUBLE)
         |         ELSE round((sigma - mu) / (sigma + mu), 6) END AS b
         |  FROM m
         |),
         |mean AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_users,
         |    round(${dsumSql("b", 6)} / count(*), 6) AS mean_b
         |  FROM wb WHERE b IS NOT NULL
         |)
         |SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
         |  round(mu / 1000000, 4) AS mean_gap_s,
         |  round(sigma / 1000000, 4) AS sd_gap_s,
         |  b AS burstiness, n_users, mean_b
         |FROM wb CROSS JOIN mean
         |ORDER BY n_gaps DESC, user_id LIMIT 20""".stripMargin,
  )
}
