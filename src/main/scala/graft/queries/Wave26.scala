package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-26 additions: directed-graph condensation, cooperative-game
  * attribution, and an optimizer-statistics audit —
  *
  *  - q_scc: strongly connected components of the dominant-direction
  *    nation trade graph (edge cn→sn iff flow(cn→sn) > flow(sn→cn)) by
  *    reflexive transitive closure with 5 doubling rounds (paths ≤ 2⁵ >
  *    |V|); scc(u) = min{v : u↔v} — the classic missing from the
  *    otherwise-complete graph family (CC/BFS/SSSP/PageRank/…),
  *  - q_shapley_attribution: EXACT Shapley credit per marketing channel
  *    over the 2⁴ exact-exposure coalitions (v(S) = conversion rate of
  *    users touched by exactly S) — the principled alternative to
  *    q_attribution's first/last-touch heuristics,
  *  - q_selectivity_audit: observed pairwise-conjunction selectivity vs
  *    the independence product the cardinality estimator assumes — the
  *    correlated-predicate evidence behind a CBO's misestimates.
  *
  * Determinism: closure and coalitions are integer/bitmask algebra;
  * Shapley weights s!(k−1−s)!/k! are build-time round-8 literals; every
  * division is correctly rounded from exact integer counts. */
object Wave26 {

  /** Marketing channels (alphabetical, bit i = 2^i) — the generator's
    * fixed non-purchase event taxonomy. */
  private val Channels = Seq("click", "error", "signup", "view")

  val queries: Map[String, Q] = strictMap(

    // SCC: the flow aggregation is the only data-scale stage (3 joins
    // sharing the TPC-H key shuffles, partial-agg'd counts). The graph
    // itself is the nations dimension (≤ 25² edge rows — metadata), so
    // closure-by-doubling costs 5 self-joins of a tiny frame AND gives
    // the DuckDB oracle an exact recursive twin — which is why this
    // query deliberately STAYS dimension-scale. The user-scale path is
    // [[graft.operators.Scc]] (forward/backward min-label peeling on the
    // Bfs/Ckpt machinery — O(V) state, O(E) per round, same output
    // schema), cross-checked against an in-memory Kosaraju and a planted
    // 10⁵-edge digraph in SccSpec; its driver-side fixpoint loop has no
    // oracle-SQL twin, so it is spec-gated rather than catalog-gated.
    "q_scc" -> ((s, dir) => {
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
      val e = f.as("a")
        .join(f.select(col("cn").as("bsn"), col("sn").as("bcn"),
          col("fl").as("bfl")),
          col("a.cn") === col("bcn") && col("a.sn") === col("bsn"),
          "left_outer")
        .where(col("a.cn") =!= col("a.sn") &&
          col("a.fl") > coalesce(col("bfl"), lit(0L)))
        .select(col("a.cn").as("u"), col("a.sn").as("v"))
      val nodes = e.select(col("u")).unionByName(e.select(col("v").as("u")))
        .distinct()
      var r = e.unionByName(nodes.select(col("u"), col("u").as("v")))
        .distinct().localCheckpoint(true)
      for (_ <- 1 to 5)
        r = r.unionByName(
            r.select(col("u"), col("v").as("w"))
              .join(r.select(col("u").as("w"), col("v")), "w")
              .select("u", "v"))
          .distinct().localCheckpoint(true)
      val scc = r.join(r.select(col("v").as("u"), col("u").as("v")),
          Seq("u", "v"))
        .groupBy("u").agg(min("v").as("scc"))
      val sizes = scc.groupBy("scc").agg(count(lit(1)).as("scc_size"))
      val summary = sizes.agg(count(lit(1)).as("n_scc"),
        max("scc_size").as("max_scc"))
      scc.join(broadcast(sizes), "scc")
        .crossJoin(broadcast(summary))
        .selectExpr("CAST(u AS BIGINT) AS nationkey",
          "CAST(scc AS BIGINT) AS scc",
          "CAST(scc_size AS BIGINT) AS scc_size",
          "CAST(n_scc AS BIGINT) AS n_scc",
          "CAST(max_scc AS BIGINT) AS max_scc")
        .orderBy("nationkey")
    }),

    // SHAPLEY: one user-level shuffle builds the exact-exposure bitmask
    // and conversion flag; everything after is the 16-row coalition
    // table × 4 channels (metadata). v(S∪i) − v(S) marginals weighted
    // by the pre-folded s!(k−1−s)!/k! literals; efficiency (Σφ =
    // v(full) − v(∅)) is spec-pinned.
    "q_shapley_attribution" -> ((s, dir) => {
      val um = table(s, dir, "events")
        .groupBy("user_id")
        .agg((Channels.zipWithIndex.map { case (c, i) =>
          max(when(col("event_type") === c, lit(1L << i)).otherwise(lit(0L)))
        }.reduce(_ + _)).as("m"),
          max(when(col("event_type") === "purchase", lit(1L))
            .otherwise(lit(0L))).as("conv"))
      val obs = um.groupBy("m")
        .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
      val vt = s.range(16).select(col("id").as("m"))
        .join(broadcast(obs), Seq("m"), "left_outer")
        .selectExpr("m",
          "CASE WHEN n IS NULL OR n = 0 THEN CAST(0 AS DOUBLE)" +
            " ELSE CAST(nc AS DOUBLE) / n END AS v")
      val chans = s.sql("SELECT stack(" + Channels.size + ", " +
        Channels.zipWithIndex.map { case (c, i) =>
          s"'$c', CAST(${1 << i} AS BIGINT)"
        }.mkString(", ") + ") AS (channel, bit)")
      val grid = s.range(16).select(col("id").as("sm"))
        .crossJoin(broadcast(chans))
        .where(expr("(sm & bit) = 0"))
        .join(broadcast(vt.select(col("m").as("sm"), col("v").as("v0"))),
          "sm")
        .join(broadcast(vt.select(col("m").as("smi"), col("v").as("v1"))),
          expr("smi = sm + bit"))
        .withColumn("w", expr("CASE WHEN bit_count(sm) = 0 THEN 0.25" +
          " WHEN bit_count(sm) = 3 THEN 0.25 ELSE 0.08333333 END"))
        .groupBy("channel")
        .agg(dsum(expr("round(CAST(w AS DOUBLE) * (v1 - v0), 8)"), 8)
          .as("phi"))
      val tot = obs.agg(sum("n").as("nu"), sum("nc").as("ncu"))
      grid.crossJoin(broadcast(tot))
        .selectExpr("channel", "round(phi, 6) AS shapley",
          "CAST(nu AS BIGINT) AS n_users",
          "round(CAST(ncu AS DOUBLE) / nu, 6) AS conv_rate")
        .orderBy("channel")
    }),

    // SELECTIVITY AUDIT: three correlated lineitem predicates, all
    // pairwise conjunctions measured in ONE scan (conditional-count
    // partials — constant state, any scale); independence_ratio =
    // sel(A∧B) / (sel(A)·sel(B)) is the correction factor a CBO's
    // independence assumption misses (1 = independent).
    "q_selectivity_audit" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
        .selectExpr(
          "CAST(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS BIGINT) AS a",
          "CAST(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS b",
          "CAST(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'" +
            " THEN 1 ELSE 0 END AS BIGINT) AS c")
      val agg = l.agg(count(lit(1)).as("n"),
        sum("a").as("na"), sum("b").as("nb"), sum("c").as("nc"),
        sum(expr("a * b")).as("nab"), sum(expr("a * c")).as("nac"),
        sum(expr("b * c")).as("nbc"))
      agg.selectExpr(
        "stack(3," +
          " 'quantity_x_discount', na, nb, nab," +
          " 'quantity_x_shipdate', na, nc, nac," +
          " 'discount_x_shipdate', nb, nc, nbc" +
          ") AS (pair, n1, n2, n12)", "n")
        .selectExpr("pair", "CAST(n AS BIGINT) AS n",
          "CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
          "CAST(n12 AS BIGINT) AS n12",
          "round(CAST(n1 AS DOUBLE) / n, 6) AS sel1",
          "round(CAST(n2 AS DOUBLE) / n, 6) AS sel2",
          "round(CAST(n12 AS DOUBLE) / n, 6) AS sel12",
          "CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n12 AS DOUBLE) * n" +
            " / (CAST(n1 AS DOUBLE) * n2), 6) END AS independence_ratio")
        .orderBy("pair")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_scc" -> {
      // AS MATERIALIZED: each doubling round references the previous one
      // twice — inlined CTEs would expand 2^k-fold (observed as DuckDB
      // re-opening the base parquet thousands of times)
      val rounds = (1 to 5).map { k =>
        s"""r$k AS MATERIALIZED (
           |  SELECT u, v FROM r${k - 1}
           |  UNION
           |  SELECT a.u, b.v FROM r${k - 1} a JOIN r${k - 1} b ON a.v = b.u
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS MATERIALIZED (
         |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
         |    count(*) AS fl
         |  FROM orders o
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON c.c_custkey = o.o_custkey
         |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  GROUP BY 1, 2
         |),
         |e AS (
         |  SELECT a.cn AS u, a.sn AS v
         |  FROM f a LEFT JOIN f b ON b.cn = a.sn AND b.sn = a.cn
         |  WHERE a.cn <> a.sn AND a.fl > coalesce(b.fl, 0)
         |),
         |nodes AS (SELECT u FROM e UNION SELECT v FROM e),
         |r0 AS MATERIALIZED (
         |  SELECT u, v FROM e UNION SELECT u, u AS v FROM nodes),
         |$rounds,
         |scc AS MATERIALIZED (
         |  SELECT r.u, min(r.v) AS scc
         |  FROM r5 r JOIN r5 b ON b.u = r.v AND b.v = r.u
         |  GROUP BY r.u
         |),
         |sizes AS (SELECT scc, count(*) AS scc_size FROM scc GROUP BY scc),
         |summary AS (SELECT count(*) AS n_scc, max(scc_size) AS max_scc
         |            FROM sizes)
         |SELECT CAST(u AS BIGINT) AS nationkey, CAST(scc AS BIGINT) AS scc,
         |  CAST(scc_size AS BIGINT) AS scc_size,
         |  CAST(n_scc AS BIGINT) AS n_scc,
         |  CAST(max_scc AS BIGINT) AS max_scc
         |FROM scc JOIN sizes USING (scc) CROSS JOIN summary
         |ORDER BY nationkey""".stripMargin
    },

    "q_shapley_attribution" -> {
      val maskExpr = Channels.zipWithIndex.map { case (c, i) =>
        s"max(CASE WHEN event_type = '$c' THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      val chanRows = Channels.zipWithIndex.map { case (c, i) =>
        s"SELECT '$c' AS channel, CAST(${1 << i} AS BIGINT) AS bit"
      }.mkString("\n  UNION ALL ")
      s"""WITH um AS (
         |  SELECT user_id, CAST($maskExpr AS BIGINT) AS m,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conv
         |  FROM events GROUP BY user_id
         |),
         |obs AS (SELECT m, count(*) AS n, CAST(sum(conv) AS BIGINT) AS nc
         |        FROM um GROUP BY m),
         |vt AS (
         |  SELECT g.m,
         |    CASE WHEN n IS NULL OR n = 0 THEN CAST(0 AS DOUBLE)
         |         ELSE CAST(nc AS DOUBLE) / n END AS v
         |  FROM (SELECT unnest(generate_series(0, 15)) AS m) g
         |  LEFT JOIN obs ON obs.m = g.m
         |),
         |chans AS (
         |  $chanRows
         |),
         |grid AS (
         |  SELECT channel, g.sm, bit,
         |    CASE WHEN bit_count(g.sm) = 0 THEN 0.25
         |         WHEN bit_count(g.sm) = 3 THEN 0.25
         |         ELSE 0.08333333 END AS w,
         |    v0.v AS v0, v1.v AS v1
         |  FROM (SELECT unnest(generate_series(0, 15)) AS sm) g
         |  CROSS JOIN chans
         |  JOIN vt v0 ON v0.m = g.sm
         |  JOIN vt v1 ON v1.m = g.sm + bit
         |  WHERE (g.sm & bit) = 0
         |),
         |phi AS (
         |  SELECT channel,
         |    ${dsumSql("round(CAST(w AS DOUBLE) * (v1 - v0), 8)", 8)}
         |      AS phi
         |  FROM grid GROUP BY channel
         |),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nu,
         |          CAST(sum(nc) AS BIGINT) AS ncu FROM obs)
         |SELECT channel, round(phi, 6) AS shapley,
         |  CAST(nu AS BIGINT) AS n_users,
         |  round(CAST(ncu AS DOUBLE) / nu, 6) AS conv_rate
         |FROM phi CROSS JOIN tot ORDER BY channel""".stripMargin
    },

    "q_selectivity_audit" -> {
      def side(pair: String, x1: String, x2: String, x12: String) =
        s"""SELECT '$pair' AS pair, CAST(n AS BIGINT) AS n,
           |  CAST($x1 AS BIGINT) AS n1, CAST($x2 AS BIGINT) AS n2,
           |  CAST($x12 AS BIGINT) AS n12,
           |  round(CAST($x1 AS DOUBLE) / n, 6) AS sel1,
           |  round(CAST($x2 AS DOUBLE) / n, 6) AS sel2,
           |  round(CAST($x12 AS DOUBLE) / n, 6) AS sel12,
           |  CASE WHEN $x1 = 0 OR $x2 = 0 THEN CAST(NULL AS DOUBLE)
           |       ELSE round(CAST($x12 AS DOUBLE) * n
           |       / (CAST($x1 AS DOUBLE) * $x2), 6) END
           |    AS independence_ratio
           |FROM agg""".stripMargin
      s"""WITH base AS (
         |  SELECT CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS b,
         |    CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |         THEN 1 ELSE 0 END AS c
         |  FROM lineitem
         |),
         |agg AS (
         |  SELECT count(*) AS n, sum(a) AS na, sum(b) AS nb,
         |    sum(c) AS nc, sum(a * b) AS nab, sum(a * c) AS nac,
         |    sum(b * c) AS nbc
         |  FROM base
         |)
         |${side("quantity_x_discount", "na", "nb", "nab")}
         |UNION ALL
         |${side("quantity_x_shipdate", "na", "nc", "nac")}
         |UNION ALL
         |${side("discount_x_shipdate", "nb", "nc", "nbc")}
         |ORDER BY pair""".stripMargin
    },
  )
}
