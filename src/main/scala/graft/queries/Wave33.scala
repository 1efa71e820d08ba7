package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-33 additions — pairing and dependency profiling:
  *
  *  - q_matching: greedy maximal matching (deterministic min-id mutual
  *    proposals, [[graft.operators.Matching]]) over the supplier
  *    co-purchase graph, bounded to 3 proposal rounds — the
  *    conflict-free pairing primitive (reviewer assignment, graph
  *    coarsening). The oracle unrolls the identical rounds.
  *  - q_fd_audit: functional-dependency audit over four candidate FDs
  *    with mixed outcomes (the profiling pass an ingestion pipeline runs
  *    to discover keys and denormalization errors): per FD the group
  *    count, violating-group count, max per-group NDV of the dependent,
  *    and the holds verdict.
  *
  * Determinism: matching is pure integer min algebra (the same matching
  * in any engine/partitioning); FD statistics are exact counts. */
object Wave33 {

  private val MatchMinW = 5
  private val MatchRounds = 3

  /** Candidate FDs: (table, lhs, rhs) — o_orderkey → o_custkey holds
    * (PK); the other three fail with real violation counts. */
  private val Fds = Seq(
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_partkey", "l_suppkey"))

  val queries: Map[String, Q] = strictMap(

    // MATCHING: one partial-agg'd proposal shuffle + two anti-joins per
    // round on the (already weight-thresholded) co-purchase edge list;
    // the 3-round bound is the contract (identical unrolled rounds in
    // the oracle; the operator's early exit on an empty remainder cannot
    // change the output).
    "q_matching" -> ((s, dir) => {
      val os = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val und = os.alias("a").join(os.alias("b"), Seq("ok"))
        .where(col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= MatchMinW)
        .select(col("u").as("src"), col("v").as("dst"))
      graft.operators.Matching.run(und, MatchRounds)
        .selectExpr("CAST(u AS BIGINT) AS u", "CAST(v AS BIGINT) AS v",
          "CAST(round AS BIGINT) AS round")
        .orderBy("round", "u")
    }),

    // FD AUDIT: each candidate is one partial-agg'd (lhs → ndv(rhs))
    // shuffle + a 1-row summary; the four summaries union to the audit
    // table. Exact count_distinct per group — group state is the rhs
    // value set, bounded by the FD's actual violation degree.
    "q_fd_audit" -> ((s, dir) => {
      val rows = Fds.map { case (t, lhs, rhs) =>
        table(s, dir, t)
          .groupBy(col(lhs)).agg(count_distinct(col(rhs)).as("ndv"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"),
            max("ndv").as("max_ndv"))
          .selectExpr(s"'$t' AS tbl", s"'$lhs' AS lhs", s"'$rhs' AS rhs",
            "CAST(n_groups AS BIGINT) AS n_groups",
            "CAST(n_violating AS BIGINT) AS n_violating",
            "CAST(max_ndv AS BIGINT) AS max_ndv",
            "CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT)" +
              " AS holds")
      }
      rows.reduce(_ unionByName _).orderBy("tbl", "lhs", "rhs")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_matching" -> {
      val rounds = (1 to MatchRounds).map { i =>
        s"""s$i AS (SELECT u AS a, v AS b FROM e${i - 1}
           |       UNION ALL SELECT v, u FROM e${i - 1}),
           |p$i AS (SELECT a, min(b) AS p FROM s$i GROUP BY a),
           |m$i AS (SELECT x.a AS u, x.p AS v
           |        FROM p$i x JOIN p$i y ON x.a = y.p AND x.p = y.a
           |        WHERE x.a < x.p),
           |mv$i AS (SELECT u AS x FROM m$i UNION ALL SELECT v FROM m$i),
           |e$i AS (SELECT u, v FROM e${i - 1}
           |        WHERE u NOT IN (SELECT x FROM mv$i)
           |          AND v NOT IN (SELECT x FROM mv$i))""".stripMargin
      }.mkString(",\n")
      val out = (1 to MatchRounds).map(i =>
        s"SELECT u, v, CAST($i AS BIGINT) AS round FROM m$i")
        .mkString("\nUNION ALL\n")
      s"""WITH os AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
         |),
         |e0 AS (
         |  SELECT a.sk AS u, b.sk AS v
         |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING count(*) >= $MatchMinW
         |),
         |$rounds
         |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, round
         |FROM ($out) ORDER BY round, u""".stripMargin
    },

    "q_fd_audit" -> {
      val rows = Fds.map { case (t, lhs, rhs) =>
        s"""SELECT '$t' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(max(ndv) AS BIGINT) AS max_ndv,
           |  CAST(CASE WHEN sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0
           |       THEN 1 ELSE 0 END AS BIGINT) AS holds
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS ndv
           |      FROM $t GROUP BY $lhs)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$rows\n) ORDER BY tbl, lhs, rhs"
    },
  )
}
