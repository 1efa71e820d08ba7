package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-12 additions: Markov-chain journey analytics on the event
  * stream — the stationary distribution and entropy rate of the
  * session transition chain (the "where do users actually live"
  * summary), truncated absorbing-chain expected steps to conversion
  * (the funnel-length read-out), and association-rule confidence/lift
  * over per-user event-type baskets (the classic market-basket rule
  * mining the frequent-pair machinery stopped short of).
  *
  * Determinism: transition counts and basket supports are exact
  * BIGINTs off ONE shuffle each; every chain update is the house
  * per-term round-8 / decimal-sum / re-round spelling on a k-row
  * metadata grid (k = |event types|), unrolled identically in the
  * oracle; lift/confidence are one float chain over exact counts.
  */
object Wave12 {

  /** Power-iteration rounds for the stationary distribution and the
    * truncated absorbing-horizon — unrolled in the oracle. */
  private val MkRounds = 3
  private val AbsRounds = 6

  /** The absorbing (conversion) state of q_absorb_steps. */
  private val AbsState = "purchase"

  /** Shared transition-probability grid: (from_type, to_type, cnt, p)
    * with p = round(cnt/tot, 8) — consecutive-event pairs per user
    * under the (ts, event_id) total order (the q_transitions shape). */
  private def transP(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val cnt = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("from_type").agg(sum(col("cnt")).as("tot"))
    cnt.join(broadcast(tot), "from_type")
      .selectExpr("from_type", "to_type", "cnt",
        "round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 8) AS p")
  }

  /** Oracle twin of [[transP]], as a CTE ending in `tp`. */
  private val TransPSql: String =
    """pairs AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events
      |),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS cnt FROM pairs
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2
      |),
      |t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot
      |      FROM c GROUP BY from_type),
      |tp AS (
      |  SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
      |    round(CAST(c.cnt AS DOUBLE) / CAST(t.tot AS BIGINT), 8) AS p
      |  FROM c JOIN t USING (from_type)
      |)""".stripMargin

  val queries: Map[String, Q] = strictMap(

    // STATIONARY DISTRIBUTION + ENTROPY RATE of the session transition
    // chain: π from MkRounds power-iteration rounds (uniform start,
    // round-8 terms, decimal sums, sum-renormalized each round — the
    // Bradley-Terry float discipline), H(row i) = Σ_j −p_ij ln p_ij
    // over PRESENT cells, and the chain's entropy rate Σ_i π_i·H_i —
    // the "how predictable are journeys" scalar. ONE lead-window
    // shuffle builds the count matrix; every round is a k-row grid
    // (ckpt'd — the tiny table's LINEAGE is the windowed pair scan).
    "q_markov_stationary" -> ((s, dir) => {
      val tp = transP(s, dir).ckpt()
      val states = tp.select(col("from_type").as("st")).distinct()
        .unionByName(tp.select(col("to_type").as("st")).distinct())
        .distinct().ckpt()
      val k = states.count()
      var pi = states.withColumn("pi", expr(s"round(1.0 / $k, 8)")).ckpt()
      for (_ <- 1 to MkRounds) {
        val raw = tp.join(pi.select(col("st").as("from_type"), col("pi")),
            Seq("from_type"))
          .withColumn("t", expr("round(pi * p, 8)"))
          .groupBy(col("to_type").as("st"))
          .agg(dsum(col("t"), 8).as("m"))
        // states with no inbound mass keep 0 (full grid via left join)
        val dist = states.join(raw, Seq("st"), "left_outer")
          .selectExpr("st", "coalesce(m, 0.0) AS m")
        val tot = dist.agg(dsum(col("m"), 8).as("sm"))
        pi = dist.crossJoin(broadcast(tot))
          .selectExpr("st", "round(m / sm, 8) AS pi").ckpt()
      }
      val hrow = tp
        .withColumn("t", expr("round(-p * ln(p), 8)"))
        .groupBy(col("from_type").as("st"))
        .agg(dsum(col("t"), 8).as("h"))
      val joined = pi.join(hrow, Seq("st"), "left_outer")
        .selectExpr("st", "pi", "coalesce(h, 0.0) AS h")
      val hrate = joined
        .agg(expr("round(CAST(sum(CAST(round(pi * h, 8) AS DECIMAL(18,8)))" +
          " AS DOUBLE), 6)").as("hrate"))
      joined.crossJoin(broadcast(hrate))
        .selectExpr("st AS state", "round(pi, 6) AS pi",
          "round(h, 6) AS h_row", "hrate")
        .orderBy("state")
    }),

    // TRUNCATED ABSORBING-CHAIN expected steps to conversion: with
    // purchase absorbing, e_{t+1}(i) = 1 + Σ_j q_ij·e_t(j) over the
    // non-absorbing submatrix Q, iterated AbsRounds times from e_0 = 1
    // — the partial sums of the fundamental matrix (I−Q)⁻¹·1, a
    // DOCUMENTED truncated-horizon contract (exact inversion is not a
    // data-parallel primitive; the truncation is the streaming-safe
    // spelling). Round-8 terms, decimal sums; the grid is k−1 rows.
    "q_absorb_steps" -> ((s, dir) => {
      val q = transP(s, dir)
        .where(col("from_type") =!= AbsState && col("to_type") =!= AbsState)
        .ckpt()
      val states = q.select(col("from_type").as("st")).distinct()
        .unionByName(q.select(col("to_type").as("st")).distinct())
        .distinct().ckpt()
      var e = states.withColumn("e", lit(1.0)).ckpt()
      for (_ <- 1 to AbsRounds) {
        val raw = q.join(e.select(col("st").as("to_type"), col("e")),
            Seq("to_type"))
          .withColumn("t", expr("round(p * e, 8)"))
          .groupBy(col("from_type").as("st"))
          .agg(dsum(col("t"), 8).as("m"))
        e = states.join(raw, Seq("st"), "left_outer")
          .selectExpr("st", "round(1.0 + coalesce(m, 0.0), 8) AS e")
          .ckpt()
      }
      e.selectExpr("st AS state", "round(e, 6) AS exp_steps")
        .orderBy(desc("exp_steps"), asc("state"))
    }),

    // ASSOCIATION-RULE confidence and lift over per-user event-type
    // baskets: supp(a→b) = users with both / users with a, lift =
    // conf / P(b) — the rule-mining read-out the frequent-pair miner
    // (q_freq_pairs) stops short of. Baskets are DISTINCT types per
    // user (≤ k rows each, so the self-join is k²-bounded per user —
    // never |events|²); supports are exact BIGINTs; conf/lift one
    // float chain. Top rules by lift under a total order.
    "q_lift_rules" -> ((s, dir) => {
      val basket = table(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
      val suppA = basket.groupBy(col("event_type").as("a"))
        .agg(count(lit(1)).as("sa"))
      val n = basket.select("user_id").distinct().count()
      val ab = basket.alias("x").join(basket.alias("y"), Seq("user_id"))
        .where(col("x.event_type") =!= col("y.event_type"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("sab"))
      ab.join(broadcast(suppA), Seq("a"))
        .join(broadcast(suppA.select(col("a").as("b"), col("sa").as("sb"))),
          Seq("b"))
        .selectExpr("a", "b", "sab", "sa", "sb",
          "round(CAST(sab AS DOUBLE) / CAST(sa AS DOUBLE), 6) AS conf",
          s"round(CAST(sab AS DOUBLE) * $n" +
            " / (CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)), 6) AS lift")
        .orderBy(desc("lift"), asc("a"), asc("b")).limit(20)
    }),
  )

  /** One unrolled power-iteration round of the stationary chain. */
  private def mkRoundSql(r: Int): String =
    s"""raw$r AS (
       |  SELECT tp.to_type AS st,
       |    ${dsumSql(s"round(p${r - 1}.pi * tp.p, 8)", 8)} AS m
       |  FROM tp JOIN p${r - 1} ON p${r - 1}.st = tp.from_type
       |  GROUP BY tp.to_type
       |),
       |d$r AS (
       |  SELECT states.st, coalesce(raw$r.m, 0.0) AS m
       |  FROM states LEFT JOIN raw$r ON raw$r.st = states.st
       |),
       |p$r AS (
       |  SELECT st, round(m / (SELECT ${dsumSql("m", 8)} FROM d$r), 8) AS pi
       |  FROM d$r
       |)""".stripMargin

  /** One unrolled truncated-absorption round. */
  private def absRoundSql(r: Int): String =
    s"""raw$r AS (
       |  SELECT q.from_type AS st,
       |    ${dsumSql(s"round(q.p * e${r - 1}.e, 8)", 8)} AS m
       |  FROM q JOIN e${r - 1} ON e${r - 1}.st = q.to_type
       |  GROUP BY q.from_type
       |),
       |e$r AS (
       |  SELECT states.st, round(1.0 + coalesce(raw$r.m, 0.0), 8) AS e
       |  FROM states LEFT JOIN raw$r ON raw$r.st = states.st
       |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_markov_stationary" ->
      s"""WITH $TransPSql,
         |states AS (
         |  SELECT DISTINCT st FROM (
         |    SELECT from_type AS st FROM tp
         |    UNION SELECT to_type FROM tp)
         |),
         |p0 AS (
         |  SELECT st,
         |    round(1.0 / (SELECT count(*) FROM states), 8) AS pi
         |  FROM states
         |),
         |${(1 to MkRounds).map(mkRoundSql).mkString(",\n")},
         |hrow AS (
         |  SELECT from_type AS st, ${dsumSql("round(-p * ln(p), 8)", 8)} AS h
         |  FROM tp GROUP BY from_type
         |),
         |joined AS (
         |  SELECT p$MkRounds.st, p$MkRounds.pi, coalesce(hrow.h, 0.0) AS h
         |  FROM p$MkRounds LEFT JOIN hrow ON hrow.st = p$MkRounds.st
         |),
         |hr AS (
         |  SELECT round(${dsumSql("round(pi * h, 8)", 8)}, 6) AS hrate
         |  FROM joined
         |)
         |SELECT st AS state, round(pi, 6) AS pi, round(h, 6) AS h_row,
         |  hr.hrate
         |FROM joined CROSS JOIN hr ORDER BY state""".stripMargin,

    "q_absorb_steps" ->
      s"""WITH $TransPSql,
         |q AS (
         |  SELECT * FROM tp
         |  WHERE from_type <> '$AbsState' AND to_type <> '$AbsState'
         |),
         |states AS (
         |  SELECT DISTINCT st FROM (
         |    SELECT from_type AS st FROM q UNION SELECT to_type FROM q)
         |),
         |e0 AS (SELECT st, CAST(1.0 AS DOUBLE) AS e FROM states),
         |${(1 to AbsRounds).map(absRoundSql).mkString(",\n")}
         |SELECT st AS state, round(e, 6) AS exp_steps
         |FROM e$AbsRounds ORDER BY exp_steps DESC, state""".stripMargin,

    "q_lift_rules" ->
      s"""WITH basket AS (
         |  SELECT DISTINCT user_id, event_type FROM events
         |),
         |sa AS (SELECT event_type AS a, count(*) AS sa
         |       FROM basket GROUP BY 1),
         |n AS (SELECT count(DISTINCT user_id) AS n FROM basket),
         |ab AS (
         |  SELECT x.event_type AS a, y.event_type AS b, count(*) AS sab
         |  FROM basket x JOIN basket y
         |    ON x.user_id = y.user_id AND x.event_type <> y.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT ab.a, ab.b, CAST(ab.sab AS BIGINT) AS sab,
         |  CAST(sa.sa AS BIGINT) AS sa, CAST(sb.sa AS BIGINT) AS sb,
         |  round(CAST(ab.sab AS DOUBLE) / CAST(sa.sa AS DOUBLE), 6) AS conf,
         |  round(CAST(ab.sab AS DOUBLE) * (SELECT n FROM n)
         |    / (CAST(sa.sa AS DOUBLE) * CAST(sb.sa AS DOUBLE)), 6) AS lift
         |FROM ab
         |JOIN sa ON sa.a = ab.a
         |JOIN sa sb ON sb.a = ab.b
         |ORDER BY lift DESC, ab.a, ab.b LIMIT 20""".stripMargin,
  )
}
