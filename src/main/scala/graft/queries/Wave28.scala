package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-28 additions: audience structure, digraph reciprocity, and the
  * join-cardinality half of the CBO audit —
  *
  *  - q_audience_overlap: pairwise user-audience Jaccard + lift across
  *    event types from ONE distinct pass — the campaign-planning
  *    companion to q_source_ngram_overlap (same matrix shape, user
  *    sets instead of trigram sets),
  *  - q_reciprocity: edge reciprocity and flow-weighted asymmetry of
  *    the nation trade digraph (q_scc's edge rule) — how much of the
  *    flow network is two-way,
  *  - q_join_card_audit: the estimator's containment-assumption join
  *    cardinality |R|·|S|/max(ndv) vs the EXACT join size computed
  *    without materializing the join (Σ n_R(k)·n_S(k) over the key
  *    profile) for the three TPC-H FK joins — q_selectivity_audit's
  *    sibling for the join side of the cost model.
  *
  * Determinism: set sizes and join profiles are exact integers;
  * Jaccard/lift/ratios are terminal correctly-rounded divisions. */
object Wave28 {

  val queries: Map[String, Q] = strictMap(

    // AUDIENCE OVERLAP: distinct (type, user) once; the pair join is
    // per-user with ≤ C(5,2) pairs per user (types are a catalog
    // dimension) — corpus-linear, same discipline as the n-gram overlap
    // matrix. Jaccard over exact set sizes; lift = P(b|a)/P(b) with
    // the user universe as the base measure.
    "q_audience_overlap" -> ((s, dir) => {
      val tu = table(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id")).distinct()
        .ckpt() // feeds sizes + both pair sides + the universe
      val sz = tu.groupBy("t").agg(count(lit(1)).as("n"))
      val uni = tu.select("user_id").distinct()
        .agg(count(lit(1)).as("nu"))
      val co = tu.select(col("t").as("ta"), col("user_id"))
        .join(tu.select(col("t").as("tb"), col("user_id")), "user_id")
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("co"))
      co.join(broadcast(sz.select(col("t").as("ta"), col("n").as("na"))), "ta")
        .join(broadcast(sz.select(col("t").as("tb"), col("n").as("nb"))), "tb")
        .crossJoin(broadcast(uni))
        .selectExpr("ta", "tb", "CAST(na AS BIGINT) AS na",
          "CAST(nb AS BIGINT) AS nb", "CAST(co AS BIGINT) AS co",
          "round(CAST(co AS DOUBLE) / (na + nb - co), 6) AS jaccard",
          "round(CAST(co AS DOUBLE) * nu / (CAST(na AS DOUBLE) * nb), 6)" +
            " AS lift")
        .orderBy("ta", "tb")
    }),

    // RECIPROCITY: the q_scc flow aggregation once, self-joined on the
    // reversed key (dimension-scale). r = |reciprocated directed
    // edges| / |directed edges|; asymmetry = Σ|f_uv − f_vu| / Σ(f_uv +
    // f_vu) over unordered pairs — 0 = perfectly balanced trade.
    "q_reciprocity" -> ((s, dir) => {
      val f = table(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(table(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(table(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("cn"), col("s_nationkey").as("sn"))
        .agg(count(lit(1)).as("fl"))
        .where(col("cn") =!= col("sn"))
        .ckpt() // both sides of the reversed self-join
      val j = f.join(f.select(col("cn").as("bsn"), col("sn").as("bcn"),
          col("fl").as("rfl")),
          col("cn") === col("bcn") && col("sn") === col("bsn"),
          "left_outer")
        .select(col("cn"), col("sn"), col("fl"),
          coalesce(col("rfl"), lit(0L)).as("rfl"))
      j.agg(count(lit(1)).as("n_edges"),
          sum(when(col("rfl") > 0, 1L).otherwise(0L)).as("n_recip"),
          sum(expr("abs(fl - rfl)")).as("sasym"),
          sum(expr("fl + rfl")).as("stot"))
        .selectExpr("CAST(n_edges AS BIGINT) AS n_edges",
          "CAST(n_recip AS BIGINT) AS n_recip",
          "round(CAST(n_recip AS DOUBLE) / n_edges, 6) AS reciprocity",
          "round(CAST(sasym AS DOUBLE) / stot, 6) AS flow_asymmetry")
    }),

    // JOIN CARDINALITY AUDIT: per FK join, both sides' key profiles
    // (count per key — one partial-agg'd shuffle each), EXACT join size
    // as Σ n_R(k)·n_S(k) over the joined profiles (never materializing
    // the join), estimate as |R|·|S|/max(ndv). est_ratio = est/actual
    // is the CBO's error factor (1 = containment assumption holds —
    // true for clean FK joins, broken by filters/skew).
    "q_join_card_audit" -> ((s, dir) => {
      def audit(pair: String, r: DataFrame, rk: String,
                t: DataFrame, tk: String): DataFrame = {
        val pr = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("na"))
        val pt = t.groupBy(col(tk).as("k")).agg(count(lit(1)).as("nb"))
        val joined = pr.join(pt, "k")
          .agg(sum(expr("na * nb")).as("actual"))
        val stats = pr.agg(sum("na").as("nr"), count(lit(1)).as("dr"))
          .crossJoin(pt.agg(sum("nb").as("ns"), count(lit(1)).as("ds")))
        stats.crossJoin(joined)
          .selectExpr(s"'$pair' AS pair", "CAST(nr AS BIGINT) AS n_left",
            "CAST(ns AS BIGINT) AS n_right",
            "CAST(dr AS BIGINT) AS ndv_left",
            "CAST(ds AS BIGINT) AS ndv_right",
            "CAST(coalesce(actual, 0) AS BIGINT) AS actual_rows",
            "round(CAST(nr AS DOUBLE) * ns / greatest(dr, ds), 2)" +
              " AS est_rows",
            "CASE WHEN coalesce(actual, 0) = 0 THEN CAST(NULL AS DOUBLE)" +
              " ELSE round(CAST(nr AS DOUBLE) * ns / greatest(dr, ds)" +
              " / actual, 6) END AS est_ratio")
      }
      val a = audit("orders_x_lineitem",
        table(s, dir, "orders"), "o_orderkey",
        table(s, dir, "lineitem"), "l_orderkey")
      val b = audit("customer_x_orders",
        table(s, dir, "customer"), "c_custkey",
        table(s, dir, "orders"), "o_custkey")
      val c = audit("part_x_lineitem",
        table(s, dir, "part"), "p_partkey",
        table(s, dir, "lineitem"), "l_partkey")
      a.unionByName(b).unionByName(c).orderBy("pair")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_audience_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id FROM events),
        |sz AS (SELECT t, count(*) AS n FROM tu GROUP BY t),
        |uni AS (SELECT count(DISTINCT user_id) AS nu FROM tu),
        |co AS (
        |  SELECT a.t AS ta, b.t AS tb, count(*) AS co
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.t < b.t
        |  GROUP BY 1, 2
        |)
        |SELECT ta, tb, CAST(na.n AS BIGINT) AS na,
        |  CAST(nb.n AS BIGINT) AS nb, CAST(co AS BIGINT) AS co,
        |  round(CAST(co AS DOUBLE) / (na.n + nb.n - co), 6) AS jaccard,
        |  round(CAST(co AS DOUBLE) * nu / (CAST(na.n AS DOUBLE) * nb.n), 6)
        |    AS lift
        |FROM co
        |JOIN sz na ON na.t = co.ta
        |JOIN sz nb ON nb.t = co.tb
        |CROSS JOIN uni
        |ORDER BY ta, tb""".stripMargin,

    "q_reciprocity" ->
      """WITH f AS MATERIALIZED (
        |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn, count(*) AS fl
        |  FROM orders o
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2
        |  HAVING c.c_nationkey <> s.s_nationkey
        |),
        |j AS (
        |  SELECT a.cn, a.sn, a.fl, coalesce(b.fl, 0) AS rfl
        |  FROM f a LEFT JOIN f b ON b.cn = a.sn AND b.sn = a.cn
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(sum(CASE WHEN rfl > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_recip,
        |  round(CAST(sum(CASE WHEN rfl > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS reciprocity,
        |  round(CAST(sum(abs(fl - rfl)) AS DOUBLE)
        |    / sum(fl + rfl), 6) AS flow_asymmetry
        |FROM j""".stripMargin,

    "q_join_card_audit" -> {
      def side(pair: String, rt: String, rk: String, tt: String,
               tk: String) =
        s"""SELECT '$pair' AS pair, CAST(nr AS BIGINT) AS n_left,
           |  CAST(ns AS BIGINT) AS n_right, CAST(dr AS BIGINT) AS ndv_left,
           |  CAST(ds AS BIGINT) AS ndv_right,
           |  CAST(coalesce(actual, 0) AS BIGINT) AS actual_rows,
           |  round(CAST(nr AS DOUBLE) * ns / greatest(dr, ds), 2)
           |    AS est_rows,
           |  CASE WHEN coalesce(actual, 0) = 0 THEN CAST(NULL AS DOUBLE)
           |       ELSE round(CAST(nr AS DOUBLE) * ns / greatest(dr, ds)
           |       / actual, 6) END AS est_ratio
           |FROM (SELECT count(*) AS nr, count(DISTINCT $rk) AS dr FROM $rt)
           |CROSS JOIN (SELECT count(*) AS ns, count(DISTINCT $tk) AS ds
           |            FROM $tt)
           |CROSS JOIN (
           |  SELECT sum(na * nb) AS actual FROM
           |    (SELECT $rk AS k, count(*) AS na FROM $rt GROUP BY 1) pr
           |  JOIN (SELECT $tk AS k, count(*) AS nb FROM $tt GROUP BY 1) pt
           |    USING (k)
           |)""".stripMargin
      s"""${side("orders_x_lineitem", "orders", "o_orderkey",
             "lineitem", "l_orderkey")}
         |UNION ALL
         |${side("customer_x_orders", "customer", "c_custkey",
             "orders", "o_custkey")}
         |UNION ALL
         |${side("part_x_lineitem", "part", "p_partkey",
             "lineitem", "l_partkey")}
         |ORDER BY pair""".stripMargin
    },
  )
}
