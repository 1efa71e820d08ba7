package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-30 additions: closing measurement loops the planners opened —
  *
  *  - q_bloom_fpp_measured: build the Bloom filter q_bloom_planner
  *    priced (m = 2¹⁷, k = 7, md5-derived bit positions), probe it with
  *    every non-member user, and compare the MEASURED false-positive
  *    rate to the fill-ratio prediction fill^k — planner → artifact →
  *    measurement, all in-engine,
  *  - q_seasonal_decompose: the classical decomposition TABLE (centered
  *    7-day MA trend, day-of-week seasonal of the detrended series,
  *    residual) whose variance ratio q_stl_strength summarizes,
  *  - q_cache_coverage: hit ratio of a top-C hot-key cache at C =
  *    10/100/1000 over part-key accesses — the cache-sizing curve
  *    (Zipf-skewed keys ⇒ small caches already absorb most hits; the
  *    practical companion to q_heavy_hitters/q_zipf_fit).
  *
  * Determinism: bit positions and hit counts are integer md5 algebra;
  * fill^k is k explicit multiplications (no pow); the decomposition's
  * one mean division per stage is round-8 before reuse; cache hits are
  * exact conditional sums over ranked keys. */
object Wave30 {

  private val BloomM = 131072L // 2^17 bits
  private val BloomK = 7

  val queries: Map[String, Q] = strictMap(

    // BLOOM MEASUREMENT: members (a deterministic 30% md5-bucket user
    // audience — the filter's FPP is membership-agnostic, and a
    // semantic audience like "purchasers" degenerates to 100% of users
    // at small sf) ×k bit explode → distinct bitset (≤ m rows); probes
    // (non-members) ×k probe rows joined to the bitset on the bit
    // position (shuffle keyed by bit — no broadcast assumption); a
    // probe with k/k hits is a false positive. predicted = fill^k as k
    // explicit multiplications.
    "q_bloom_fpp_measured" -> ((s, dir) => {
      def bitExpr(col0: String) =
        s"CAST(conv(substring(md5(concat('bf-', CAST(j AS STRING), ':'," +
          s" CAST($col0 AS STRING))), 1, 8), 16, 10) AS BIGINT) % $BloomM"
      val users = table(s, dir, "events")
        .select("user_id").distinct()
        .selectExpr("user_id",
          "CAST(CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING))," +
            " 1, 8), 16, 10) AS BIGINT) % 100 < 30 THEN 1 ELSE 0 END" +
            " AS BIGINT) AS is_member")
        .ckpt() // members + probes + counts
      val ks = expr(s"explode(sequence(0, ${BloomK - 1}))").as("j")
      val bits = users.where(col("is_member") === 1)
        .select(col("user_id"), ks)
        .selectExpr(s"${bitExpr("user_id")} AS bit").distinct()
        .ckpt() // joined by probes + counted
      val probes = users.where(col("is_member") === 0)
        .select(col("user_id"), ks)
        .selectExpr("user_id", s"${bitExpr("user_id")} AS bit")
      val fp = probes.join(bits, Seq("bit"), "left_semi")
        .groupBy("user_id").agg(count(lit(1)).as("hits"))
        .where(col("hits") === BloomK)
        .agg(count(lit(1)).as("n_fp"))
      val counts = users.agg(
        sum(col("is_member")).as("n_members"),
        sum(expr("1 - is_member")).as("n_probes"))
      val nb = bits.agg(count(lit(1)).as("n_bits"))
      val fillPow = (1 to BloomK).map(_ => "fill").mkString(" * ")
      counts.crossJoin(broadcast(nb)).crossJoin(broadcast(fp))
        .withColumn("fill", expr(s"CAST(n_bits AS DOUBLE) / $BloomM"))
        .selectExpr(s"CAST($BloomM AS BIGINT) AS m",
          s"CAST($BloomK AS BIGINT) AS k",
          "CAST(n_members AS BIGINT) AS n_members",
          "CAST(n_bits AS BIGINT) AS n_bits",
          "round(fill, 6) AS fill_ratio",
          "CAST(n_probes AS BIGINT) AS n_probes",
          "CAST(coalesce(n_fp, 0) AS BIGINT) AS n_fp",
          "CASE WHEN n_probes = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(coalesce(n_fp, 0) AS DOUBLE) / n_probes, 6)" +
            " END AS measured_fpp",
          s"round($fillPow, 6) AS predicted_fpp")
    }),

    // DECOMPOSITION: the data-scale stage is the daily-count shuffle;
    // the decomposition windows run on the aggregated series (metadata —
    // same envelope as q_theil_sen's pairwise slopes). The trend is
    // NULL unless the ±3-day window is complete AND contiguous (a
    // 7-row window spanning a gap is not a weekly MA).
    "q_seasonal_decompose" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val daily = table(s, dir, "events")
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("c"))
      val tr = daily
        .withColumn("wn", count(lit(1)).over(w7))
        .withColumn("wspan", max("day").over(w7) - min("day").over(w7))
        .withColumn("trend", expr("CASE WHEN wn = 7 AND wspan = 6" +
          " THEN round(CAST(sum(c) OVER (ORDER BY day" +
          " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) / 7, 8)" +
          " ELSE CAST(NULL AS DOUBLE) END"))
        .withColumn("detr", expr("CASE WHEN trend IS NULL THEN NULL" +
          " ELSE c - trend END"))
        .ckpt() // feeds the dow means + the output join
      val dow = tr.where(col("detr").isNotNull)
        .groupBy(expr("day % 7").as("dw"))
        .agg(dsum(expr("round(detr, 8)"), 8).as("sd"),
          count(lit(1)).as("nd"))
        .selectExpr("dw", "round(sd / nd, 8) AS seasonal")
      tr.join(broadcast(dow), expr("day % 7 = dw"), "left_outer")
        .selectExpr("day", "CAST(c AS BIGINT) AS c",
          "round(trend, 6) AS trend",
          "CASE WHEN trend IS NULL THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(seasonal, 6) END AS seasonal",
          "CASE WHEN trend IS NULL THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(detr - seasonal, 6) END AS resid")
        .orderBy("day")
    }),

    // CACHE COVERAGE: one part-key frequency shuffle, a distributed
    // rank by (count desc, key), then the three cache sizes are
    // conditional sums over the SAME ranked pass.
    "q_cache_coverage" -> ((s, dir) => {
      val sizes = Seq(10L, 100L, 1000L)
      val freq = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("cnt"))
        .withColumn("kk", lit(1)).withColumn("negc", -col("cnt"))
      val ranked = graft.operators.Ranks
        .withinKey(freq, "kk", Seq("negc", "k"))
      val aggCols = count(lit(1)).as("n_keys") +:
        sum("cnt").as("n_access") +:
        sizes.map(c => sum(when(col("rk") <= c, col("cnt"))
          .otherwise(0L)).as(s"h$c"))
      val a = ranked.agg(aggCols.head, aggCols.tail: _*)
      a.selectExpr("stack(" + sizes.size + ", " +
        sizes.map(c => s"CAST($c AS BIGINT), h$c").mkString(", ") +
        ") AS (cache_size, hits)", "n_keys", "n_access")
        .selectExpr("cache_size", "CAST(n_keys AS BIGINT) AS n_keys",
          "CAST(n_access AS BIGINT) AS n_access",
          "CAST(hits AS BIGINT) AS hits",
          "round(CAST(hits AS DOUBLE) / n_access, 6) AS hit_ratio")
        .orderBy("cache_size")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_bloom_fpp_measured" -> {
      def bitSql(col0: String) =
        s"${hex2longSql(s"md5('bf-' || j || ':' || $col0)", 1)} % $BloomM"
      val fillPow = (1 to BloomK).map(_ => "fill").mkString(" * ")
      s"""WITH users AS (
         |  SELECT user_id,
         |    CAST(CASE WHEN ${hex2longSql(
             "md5(CAST(user_id AS VARCHAR))", 1)} % 100 < 30
         |         THEN 1 ELSE 0 END AS BIGINT) AS is_member
         |  FROM (SELECT DISTINCT user_id FROM events)
         |),
         |ks AS (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j),
         |bits AS (
         |  SELECT DISTINCT ${bitSql("user_id")} AS bit
         |  FROM users CROSS JOIN ks WHERE is_member = 1
         |),
         |probes AS (
         |  SELECT user_id, ${bitSql("user_id")} AS bit
         |  FROM users CROSS JOIN ks WHERE is_member = 0
         |),
         |fp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_fp FROM (
         |    SELECT user_id FROM probes
         |    WHERE bit IN (SELECT bit FROM bits)
         |    GROUP BY user_id HAVING count(*) = $BloomK)
         |),
         |counts AS (
         |  SELECT CAST(sum(is_member) AS BIGINT) AS n_members,
         |    CAST(sum(1 - is_member) AS BIGINT) AS n_probes
         |  FROM users
         |),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits FROM bits),
         |f AS (
         |  SELECT *, CAST(n_bits AS DOUBLE) / $BloomM AS fill
         |  FROM counts CROSS JOIN nb CROSS JOIN fp
         |)
         |SELECT CAST($BloomM AS BIGINT) AS m, CAST($BloomK AS BIGINT) AS k,
         |  n_members, n_bits, round(fill, 6) AS fill_ratio, n_probes,
         |  CAST(coalesce(n_fp, 0) AS BIGINT) AS n_fp,
         |  CASE WHEN n_probes = 0 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(coalesce(n_fp, 0) AS DOUBLE) / n_probes, 6)
         |       END AS measured_fpp,
         |  round($fillPow, 6) AS predicted_fpp
         |FROM f""".stripMargin
    },

    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
        |  FROM events GROUP BY 1
        |),
        |tr AS (
        |  SELECT day, c,
        |    CASE WHEN count(*) OVER w = 7
        |           AND max(day) OVER w - min(day) OVER w = 6
        |         THEN round(CAST(sum(c) OVER w AS DOUBLE) / 7, 8)
        |         ELSE CAST(NULL AS DOUBLE) END AS trend
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |    AND 3 FOLLOWING)
        |),
        |t2 AS (
        |  SELECT *, CASE WHEN trend IS NULL THEN NULL
        |              ELSE c - trend END AS detr
        |  FROM tr
        |),
        |dow AS (
        |  SELECT day % 7 AS dw,
        |    round(CAST(sum(CAST(round(detr, 8) AS DECIMAL(18,8)))
        |      AS DOUBLE) / count(*), 8) AS seasonal
        |  FROM t2 WHERE detr IS NOT NULL GROUP BY 1
        |)
        |SELECT day, CAST(c AS BIGINT) AS c, round(trend, 6) AS trend,
        |  CASE WHEN trend IS NULL THEN CAST(NULL AS DOUBLE)
        |       ELSE round(seasonal, 6) END AS seasonal,
        |  CASE WHEN trend IS NULL THEN CAST(NULL AS DOUBLE)
        |       ELSE round(detr - seasonal, 6) END AS resid
        |FROM t2 LEFT JOIN dow ON day % 7 = dw
        |ORDER BY day""".stripMargin,

    "q_cache_coverage" -> {
      val sizes = Seq(10L, 100L, 1000L)
      val hs = sizes.map(c =>
        s"CAST(sum(CASE WHEN rk <= $c THEN cnt ELSE 0 END) AS BIGINT)" +
          s" AS h$c").mkString(",\n    ")
      val rows = sizes.map(c =>
        s"""SELECT CAST($c AS BIGINT) AS cache_size,
           |  CAST(n_keys AS BIGINT) AS n_keys,
           |  CAST(n_access AS BIGINT) AS n_access,
           |  CAST(h$c AS BIGINT) AS hits,
           |  round(CAST(h$c AS DOUBLE) / n_access, 6) AS hit_ratio
           |FROM a""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH freq AS (
         |  SELECT l_partkey AS k, count(*) AS cnt
         |  FROM lineitem GROUP BY 1
         |),
         |r AS (
         |  SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, k)
         |    AS BIGINT) AS rk
         |  FROM freq
         |),
         |a AS (
         |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_access,
         |    $hs
         |  FROM r
         |)
         |$rows
         |ORDER BY cache_size""".stripMargin
    },
  )
}
