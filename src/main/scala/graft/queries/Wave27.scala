package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-27 additions: pipeline parameter-sensitivity audits —
  *
  *  - q_session_gap_sensitivity: session counts under 10/30/60-minute
  *    inactivity gaps from ONE lag pass (no per-threshold re-scan) —
  *    the "is 30 minutes the right cut?" evidence behind q_sessionize's
  *    fixed constant,
  *  - q_entropy_rate: conditional entropy H(next|current) of the
  *    event-type Markov chain, per state and overall — the
  *    predictability number behind q_transitions / q_markov_stationary
  *    (uniform 5-state chain ⇒ ln 5 ≈ 1.609; lower = exploitable
  *    structure),
  *  - q_dup_growth: exact-duplicate rate at 25/50/75/100% corpus
  *    prefixes (hash-bucket subsets) — the duplication scaling curve
  *    that decides whether dedup must precede or can follow a corpus
  *    expansion (dup rate grows superlinearly when sources repeat).
  *
  * Determinism: gaps/counts are exact integers; entropy terms are
  * round-8 ln of exact integer rationals times integer counts,
  * decimal-summed; prefix membership is the shared md5 bucket. */
object Wave27 {

  /** Gap thresholds (minutes) for the sessionization sweep. */
  private val Gaps = Seq(10L, 30L, 60L)

  val queries: Map[String, Q] = strictMap(

    // GAP SENSITIVITY: n_sessions(T) = n_users + |{gaps > T}| — all
    // thresholds read the SAME lag pass (one per-user window, one
    // conditional-count aggregate; the ×3 expansion is 3 output rows).
    "q_session_gap_sensitivity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gaps = table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(byUser))
      val aggCols = count_distinct(col("user_id")).as("nu") +:
        count(lit(1)).as("ne") +:
        Gaps.map(t => sum(when(col("gap") > t * 60000000L, 1L)
          .otherwise(0L)).as(s"x$t"))
      val aggs = gaps.agg(aggCols.head, aggCols.tail: _*)
      aggs.selectExpr("stack(" + Gaps.size + ", " +
        Gaps.map(t => s"CAST($t AS BIGINT), nu + x$t").mkString(", ") +
        ") AS (gap_min, n_sessions)", "nu", "ne")
        .selectExpr("gap_min", "CAST(nu AS BIGINT) AS n_users",
          "CAST(ne AS BIGINT) AS n_events",
          "CAST(n_sessions AS BIGINT) AS n_sessions",
          "round(CAST(ne AS DOUBLE) / n_sessions, 6)" +
            " AS events_per_session")
        .orderBy("gap_min")
    }),

    // ENTROPY RATE: one lead pass (the q_transitions shuffle), then
    // H_i = −Σ_j (n_ij/n_i)·ln(n_ij/n_i) with round-8 ln terms scaled
    // by exact integer counts before the decimal sum; overall
    // H = Σ_i (n_i/N)·H_i rides the same per-state sums.
    "q_entropy_rate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cnt = table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy("from_type").agg(sum("cnt").as("tot"))
      val st = cnt.join(broadcast(tot), "from_type")
        .groupBy("from_type")
        .agg(first(col("tot")).as("n_i"),
          dsum(expr(
            "-cnt * round(ln(CAST(cnt AS DOUBLE) / tot), 8)"), 8).as("si"))
      val overall = st.agg(sum("n_i").as("nn"), dsum(col("si"), 8).as("ss"))
      st.crossJoin(broadcast(overall))
        .selectExpr("from_type", "CAST(n_i AS BIGINT) AS n_i",
          "round(si / n_i, 6) AS h_state",
          "round(ss / nn, 6) AS h_rate")
        .orderBy("from_type")
    }),

    // DUP GROWTH: one text-group shuffle; per group, the 4 prefix
    // member-counts are conditional sums over the shared md5 bucket —
    // no per-prefix corpus re-scan, no expansion before the terminal
    // 4-row stack. dup(p) = Σ max(members_p − 1, 0).
    "q_dup_growth" -> ((s, dir) => {
      val ps = Seq(25, 50, 75, 100)
      val cCols = ps.map(p => sum(when(col("b") < p, 1L).otherwise(0L))
        .as(s"c$p"))
      val g = table(s, dir, "documents")
        .selectExpr("text", s"$HashBucketSpark AS b")
        .groupBy("text")
        .agg(cCols.head, cCols.tail: _*)
      val aCols = ps.map(p => sum(col(s"c$p")).as(s"n$p")) ++
        ps.map(p => sum(greatest(col(s"c$p") - 1, lit(0L))).as(s"d$p"))
      val agg = g.agg(aCols.head, aCols.tail: _*)
      agg.selectExpr("stack(" + ps.size + ", " +
        ps.map(p => s"CAST($p AS BIGINT), n$p, d$p").mkString(", ") +
        ") AS (prefix_pct, n_docs, n_dups)")
        .selectExpr("prefix_pct", "CAST(n_docs AS BIGINT) AS n_docs",
          "CAST(n_dups AS BIGINT) AS n_dups",
          "CASE WHEN n_docs = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_dups AS DOUBLE) / n_docs, 6)" +
            " END AS dup_rate")
        .orderBy("prefix_pct")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_session_gap_sensitivity" -> {
      val xs = Gaps.map(t =>
        s"CAST(sum(CASE WHEN gap > ${t * 60000000L} THEN 1 ELSE 0 END)" +
          s" AS BIGINT) AS x$t").mkString(",\n    ")
      val rows = Gaps.map(t =>
        s"""SELECT CAST($t AS BIGINT) AS gap_min,
           |  CAST(nu AS BIGINT) AS n_users, CAST(ne AS BIGINT) AS n_events,
           |  CAST(nu + x$t AS BIGINT) AS n_sessions,
           |  round(CAST(ne AS DOUBLE) / (nu + x$t), 6)
           |    AS events_per_session
           |FROM a""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT user_id,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events
         |),
         |a AS (
         |  SELECT count(DISTINCT user_id) AS nu, count(*) AS ne,
         |    $xs
         |  FROM g
         |)
         |$rows
         |ORDER BY gap_min""".stripMargin
    },

    "q_entropy_rate" ->
      s"""WITH pairs AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM events
         |),
         |cnt AS (
         |  SELECT from_type, to_type, count(*) AS cnt
         |  FROM pairs WHERE to_type IS NOT NULL
         |  GROUP BY 1, 2
         |),
         |tot AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot
         |        FROM cnt GROUP BY from_type),
         |st AS (
         |  SELECT from_type, max(tot) AS n_i,
         |    ${dsumSql(
           "-cnt * round(ln(CAST(cnt AS DOUBLE) / tot), 8)", 8)} AS si
         |  FROM cnt JOIN tot USING (from_type)
         |  GROUP BY from_type
         |),
         |overall AS (SELECT CAST(sum(n_i) AS BIGINT) AS nn,
         |              CAST(sum(CAST(si AS DECIMAL(18,8))) AS DOUBLE) AS ss
         |            FROM st)
         |SELECT from_type, CAST(n_i AS BIGINT) AS n_i,
         |  round(si / n_i, 6) AS h_state,
         |  round(ss / nn, 6) AS h_rate
         |FROM st CROSS JOIN overall ORDER BY from_type""".stripMargin,

    "q_dup_growth" -> {
      val ps = Seq(25, 50, 75, 100)
      val cs = ps.map(p =>
        s"sum(CASE WHEN b < $p THEN 1 ELSE 0 END) AS c$p")
        .mkString(",\n    ")
      val ns = (ps.map(p => s"CAST(sum(c$p) AS BIGINT) AS n$p") ++
        ps.map(p => s"CAST(sum(greatest(c$p - 1, 0)) AS BIGINT) AS d$p"))
        .mkString(",\n    ")
      val rows = ps.map(p =>
        s"""SELECT CAST($p AS BIGINT) AS prefix_pct,
           |  CAST(n$p AS BIGINT) AS n_docs, CAST(d$p AS BIGINT) AS n_dups,
           |  CASE WHEN n$p = 0 THEN CAST(NULL AS DOUBLE)
           |       ELSE round(CAST(d$p AS DOUBLE) / n$p, 6) END AS dup_rate
           |FROM a""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT text,
         |    $cs
         |  FROM (SELECT text, $hashBucketSql AS b FROM documents)
         |  GROUP BY text
         |),
         |a AS (
         |  SELECT $ns
         |  FROM g
         |)
         |$rows
         |ORDER BY prefix_pct""".stripMargin
    },
  )
}
