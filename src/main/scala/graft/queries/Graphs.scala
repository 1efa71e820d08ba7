package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Graph-analytics additions over the harness projections: link
  * prediction (Adamic-Adar) on the supplier co-purchase graph and the
  * HyperANF neighborhood function (Boldi-Vigna, WWW'11) on the
  * part↔supplier bipartite graph — per-vertex HyperLogLog registers
  * max-merged along edges, the sketch-based answer to "how big is each
  * vertex's t-hop ball" that runs in O(rounds · |E|) instead of an
  * all-pairs BFS.
  *
  * Determinism: Adamic-Adar follows the q_tfidf/q_bm25 float discipline
  * (ln pre-rounded to 8 decimals, one correctly-rounded division, 6-decimal
  * contribution rounding, decimal sums); HyperANF registers are md5-derived
  * integers with BIGINT harmonic sums (the q_sketch_hll machinery), so both
  * are partition- and engine-invariant.
  */
object Graphs {

  type Q = (SparkSession, String) => DataFrame

  /** Same co-occurrence graph as q_kcore (parts sharing ≥ 2 orders,
    * baskets capped at 64 items — the supplier projection is COMPLETE at
    * harness scale, useless for link prediction); wedge centers capped at
    * degree ≤ [[AaMaxDeg]] — the df-cap discipline: a 10⁶-degree hub
    * would fan out C(10⁶,2) wedges while its 1/ln(10⁶) contribution is
    * noise-level. */
  private val AaMinW = 2
  private val AaBasketCap = 64
  private val AaMaxDeg = 64

  /** Per-wedge Adamic-Adar contribution (column d = center degree ≥ 2):
    * ONE spelling both engines — ln pre-rounded 8, then a single
    * correctly-rounded IEEE division, then the 6-decimal round that makes
    * contributions decimal-summable. */
  private val AaContribExpr =
    "round(1.0 / round(ln(CAST(d AS DOUBLE)), 8), 6)"

  /** HyperANF register count per vertex and its alpha. */
  private val AnfM = 16
  private val AnfAlpha = "0.673"
  private val AnfRounds = 2

  /** rho upper bound: the 60-bit hash leaves a (60 − log2 m) = 56-bit
    * remainder, so rho = 57 − bitlength(rest) ∈ [1, 57] (rest = 0 → 57).
    * (The m = 64 sketches use 55 — per-m constants, NOT shared.) */
  private val AnfRhoMax = 57

  /** Shared estimate expression over (R, S) with S the dense harmonic sum
    * Σ 2^(R−reg) including the (m − n_nz) zero registers at 2^R. */
  private val AnfRawEstExpr =
    s"round($AnfAlpha * ${AnfM * AnfM} * pow(2, CAST(R AS DOUBLE)) / CAST(S AS DOUBLE), 2)"

  /** Flajolet small-range (linear counting) correction: raw ≤ 2.5m with
    * zero registers present → est = m·ln(m/zeros). The ln values are a
    * 15-entry literal table computed once here (2-decimal), so neither
    * engine evaluates a runtime log — without this, a singleton ball
    * estimates ~11 instead of ~1 at m = 16. */
  private val AnfEstExpr: String = {
    val lc = (1 until AnfM).map { z =>
      val v = BigDecimal(AnfM * Math.log(AnfM.toDouble / z))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      s"WHEN ${AnfM - z} THEN CAST($v AS DOUBLE)"
    }.mkString(" ")
    s"CASE WHEN n_nz < $AnfM AND $AnfRawEstExpr <= ${5 * AnfM / 2}.0" +
      s" THEN (CASE n_nz $lc END) ELSE $AnfRawEstExpr END"
  }

  val queries: Map[String, Q] = Map(

    // Link prediction by Adamic-Adar: for every non-adjacent supplier
    // pair (u, v), AA = Σ over common neighbors w of 1/ln(deg(w)) —
    // common neighbors enumerate as wedges through each center (the
    // q_triangles join shape, fan-out C(deg,2) bounded by the degree
    // cap), existing edges drop with one anti-join, and the top-20
    // predicted links select via TakeOrderedAndProject. Never an
    // all-pairs vertex join.
    "q_link_predict" -> ((s, dir) => {
      val b = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val small = b.groupBy("ok").agg(count(lit(1)).as("bs"))
        .where(col("bs") <= AaBasketCap).select("ok")
      val os = b.join(small, "ok")
      val und = os.alias("a").join(os.alias("b"), Seq("ok"))
        .where(col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= AaMinW).select("u", "v")
      val adj = und.select(col("u").as("ctr"), col("v").as("n"))
        .unionAll(und.select(col("v").as("ctr"), col("u").as("n")))
      val deg = adj.groupBy("ctr").agg(count(lit(1)).as("d"))
      val centers = adj.join(
          deg.where(col("d") >= 2 && col("d") <= AaMaxDeg), "ctr")
        .withColumn("contrib", expr(AaContribExpr))
      val wedges = centers.alias("x")
        .join(centers.alias("y"), Seq("ctr"))
        .where(col("x.n") < col("y.n"))
        .select(col("x.n").as("u"), col("y.n").as("v"),
          col("x.contrib").as("contrib"))
      wedges.join(und, Seq("u", "v"), "left_anti")
        .groupBy("u", "v")
        .agg(count(lit(1)).as("n_common"), dsum(col("contrib"), 6).as("aa"))
        .orderBy(desc("aa"), asc("u"), asc("v")).limit(20)
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"),
          col("n_common"), col("aa"))
    }),

    // HyperANF: the neighborhood function N(t) = Σ_v |Ball(v, t)|
    // estimated by per-vertex HLL registers max-merged along edges for
    // [[AnfRounds]] rounds — per round ONE edge join + one (v, bucket)
    // max aggregation (map-side partials; registers are sparse rows, the
    // dense zero-run folds into the harmonic sum arithmetically). The
    // distance-distribution / effective-diameter primitive at
    // O(rounds·|E|·m) instead of all-pairs BFS.
    "q_hyperanf" -> ((s, dir) => {
      val p0 = table(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), (col("l_suppkey") + 1000000L).as("sv"))
        .distinct()
      val edges = p0.select(col("p").as("src"), col("sv").as("dst"))
        .unionAll(p0.select(col("sv").as("src"), col("p").as("dst")))
      val verts = p0.select(col("p").as("v"))
        .union(p0.select(col("sv").as("v"))).distinct()
      // one register row per vertex: h = 60-bit md5 of the vertex id
      val r0 = verts
        .withColumn("h", expr(
          "CAST(conv(substring(md5(concat('anf-', CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
        .withColumn("bucket", col("h") % AnfM)
        .withColumn("rho", expr(
          s"CAST(CASE WHEN h div $AnfM = 0 THEN $AnfRhoMax ELSE $AnfRhoMax - length(bin(h div $AnfM)) END AS BIGINT)"))
        .select("v", "bucket", "rho")
      // localCheckpoint per round: every later round AND its estimate
      // branch reuse the materialized register table — without it the
      // 3 estimate branches re-execute the whole propagation chain
      // (measured 7.6 → ~2.5 s at sf0.1), and at depth the lineage stays
      // bounded (the PageRank/LabelProp discipline)
      val regs = (1 to AnfRounds).scanLeft(r0.ckpt()) { (r, _) =>
        r.unionAll(
            edges.join(r, edges("dst") === r("v"))
              .select(edges("src").as("v"), r("bucket"), r("rho")))
          .groupBy("v", "bucket").agg(max("rho").as("rho"))
          .ckpt()
      }
      regs.zipWithIndex.map { case (r, t) =>
        r.groupBy("v")
          .agg(count(lit(1)).as("n_nz"), max("rho").as("R"),
            sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), CAST($AnfRhoMax - rho AS INT)) AS BIGINT)"))
              .as("s1"))
          // re-base the per-bucket terms from 2^(rhoMax-rho) to 2^(R-rho)
          // exactly: s1 is divisible by 2^(rhoMax-R)
          .withColumn("S", expr(
            s"s1 div shiftleft(CAST(1 AS BIGINT), CAST($AnfRhoMax - R AS INT))" +
              s" + ($AnfM - n_nz) * shiftleft(CAST(1 AS BIGINT), CAST(R AS INT))"))
          .withColumn("est", expr(AnfEstExpr))
          .agg(count(lit(1)).as("n_verts"), dsum(col("est"), 2).as("sum_est"))
          .select(lit(t.toLong).as("t"), col("n_verts"), col("sum_est"))
      }.reduce(_ unionByName _).orderBy("t")
    }))

  private def anfRoundSql(i: Int): String =
    s"""r$i AS (
       |  SELECT v, bucket, max(rho) AS rho FROM (
       |    SELECT * FROM r${i - 1}
       |    UNION ALL
       |    SELECT e.src AS v, r.bucket, r.rho FROM e JOIN r${i - 1} r
       |      ON e.dst = r.v
       |  ) GROUP BY v, bucket
       |)""".stripMargin

  private def anfEstSql(t: Int): String =
    s"""SELECT CAST($t AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n_verts,
       |  ${dsumSql("est", 2)} AS sum_est
       |FROM (
       |  SELECT v, $AnfEstExpr AS est FROM (
       |    SELECT v, count(*) AS n_nz, max(rho) AS R,
       |      CAST(sum(1::BIGINT << CAST($AnfRhoMax - rho AS INT)) AS BIGINT) AS s1
       |    FROM r$t GROUP BY v
       |  ), LATERAL (SELECT s1 // (1::BIGINT << CAST($AnfRhoMax - R AS INT))
       |      + ($AnfM - n_nz) * (1::BIGINT << CAST(R AS INT)) AS S)
       |)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_link_predict" ->
      s"""WITH b AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |),
         |small AS (SELECT ok FROM b GROUP BY ok
         |          HAVING count(*) <= $AaBasketCap),
         |os AS (SELECT * FROM b JOIN small USING (ok)),
         |und AS (
         |  SELECT a.pk AS u, c.pk AS v
         |  FROM os a JOIN os c USING (ok) WHERE a.pk < c.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $AaMinW
         |),
         |adj AS (SELECT u AS ctr, v AS n FROM und
         |        UNION ALL SELECT v, u FROM und),
         |deg AS (SELECT ctr, count(*) AS d FROM adj GROUP BY ctr
         |        HAVING count(*) BETWEEN 2 AND $AaMaxDeg),
         |centers AS (
         |  SELECT adj.ctr, adj.n, $AaContribExpr AS contrib
         |  FROM adj JOIN deg USING (ctr)
         |),
         |wedges AS (
         |  SELECT x.n AS u, y.n AS v, x.contrib
         |  FROM centers x JOIN centers y USING (ctr) WHERE x.n < y.n
         |)
         |SELECT CAST(w.u AS BIGINT) AS u, CAST(w.v AS BIGINT) AS v,
         |  count(*) AS n_common, ${dsumSql("contrib", 6)} AS aa
         |FROM wedges w ANTI JOIN und ON w.u = und.u AND w.v = und.v
         |GROUP BY 1, 2
         |ORDER BY aa DESC, u, v LIMIT 20""".stripMargin,

    "q_hyperanf" ->
      s"""WITH p0 AS (
         |  SELECT DISTINCT l_partkey AS p, l_suppkey + 1000000 AS sv
         |  FROM lineitem
         |),
         |e AS (SELECT p AS src, sv AS dst FROM p0
         |      UNION ALL SELECT sv, p FROM p0),
         |verts AS (SELECT DISTINCT p AS v FROM p0
         |          UNION SELECT DISTINCT sv FROM p0),
         |r0 AS (
         |  SELECT v, h % $AnfM AS bucket,
         |    CAST(CASE WHEN h // $AnfM = 0 THEN $AnfRhoMax
         |         ELSE $AnfRhoMax - length(bin(h // $AnfM)) END AS BIGINT) AS rho
         |  FROM (SELECT v,
         |          ${hexLongSql("md5('anf-' || CAST(v AS VARCHAR))", 1, 15)} AS h
         |        FROM verts)
         |),
         |${(1 to AnfRounds).map(anfRoundSql).mkString(",\n")}
         |${(0 to AnfRounds).map(anfEstSql).mkString("", "\nUNION ALL\n", "")}
         |ORDER BY t""".stripMargin)
}
