package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-34 additions — connectivity structure audits over the supplier
  * co-purchase graph (the ConnectedComponents machinery, oracle-twinned
  * by DuckDB recursive CTEs — the q_dedup_components precedent):
  *
  *  - q_percolation: component structure under an edge-weight threshold
  *    sweep (w ≥ 5/8/12) — how the giant component dissolves as the
  *    co-purchase evidence bar rises; the bond-percolation view of
  *    "how much of this graph is real signal".
  *  - q_robustness: targeted-attack robustness — the giant component
  *    before and after removing the top-8 degree hubs (deterministic
  *    degree-desc, id-asc selection), the classic scale-free-network
  *    fragility audit (Albert-Jeong-Barabási).
  *
  * Determinism: thresholds, degrees and component labels are pure
  * integer algebra; min-label CC is engine- and partition-invariant. */
object Wave34 {

  // sweep starts AT the established co-purchase noise floor (w ≥ 5, the
  // q_triangles semantics): below it the projection is near-complete and
  // any component algorithm pays a quadratic-ish edge set for structure
  // that is one-off co-occurrence noise anyway
  private val PercThresholds = Seq(5L, 8L, 12L)
  private val RobustHubs = 8

  /** The weighted co-purchase projection (u < v, w = shared orders). */
  private def coPurchase(s: SparkSession, dir: String): DataFrame = {
    val os = table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    os.alias("a").join(os.alias("b"), Seq("ok"))
      .where(col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("w"))
  }

  /** Summary row over an edge set and its (already converged) labels. */
  private def summary(labels: DataFrame, e: DataFrame,
                      tag: org.apache.spark.sql.Column): DataFrame = {
    val sizes = labels.groupBy("l").agg(count(lit(1)).as("sz"))
    sizes.agg(count(lit(1)).as("nc"), max("sz").as("g"), sum("sz").as("nv"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("ne"))))
      .select(tag,
        expr("CAST(nc AS BIGINT) AS n_components"),
        expr("CAST(g AS BIGINT) AS giant_size"),
        expr("CAST(nv AS BIGINT) AS n_vertices"),
        expr("CAST(ne AS BIGINT) AS n_edges"))
  }

  val queries: Map[String, Q] = strictMap(

    // PERCOLATION: ONE weighted-projection shuffle (ckpt'd — all three
    // thresholds read it), then per threshold a filter + the O(log)
    // hooking CC; summaries are metadata. The thresholds are NESTED
    // (τ₁ < τ₂ < τ₃ ⇒ E₃ ⊆ E₂ ⊆ E₁), so the sweep runs τ DESCENDING and
    // each coarser graph's CONVERGED labels REFINE the next denser one
    // (ConnectedComponents.refine: contract by the labels, fixpoint on
    // the component-count-sized graph, relabel) — identical min-labels,
    // but only ONE full-size cold fixpoint instead of r7's three (the
    // r7 verdict task 5).
    "q_percolation" -> ((s, dir) => {
      val wt = coPurchase(s, dir).ckpt()
      var seed: DataFrame = null
      PercThresholds.sorted.reverse.map { thr =>
        val e = wt.where(col("w") >= thr)
          .select(col("u").as("a"), col("v").as("b"))
        val (labels, _) =
          if (seed == null) graft.operators.ConnectedComponents.labels(e)
          else graft.operators.ConnectedComponents.refine(e, seed)
        seed = labels
        summary(labels, e, lit(thr).as("threshold"))
      }.reduce(_ unionByName _).orderBy("threshold")
    }),

    // ROBUSTNESS: degrees from the thresholded edge list, a constant
    // top-8 hub selection (TakeOrderedAndProject — never a fraction of
    // the graph), two anti-joins drop hub-incident edges, CC twice —
    // the CUT graph runs first (cold) and its labels REFINE the base CC
    // (E_cut ⊆ E_base, the same contract-and-relabel trick; the reverse
    // direction would be unsound — base components are coarser).
    "q_robustness" -> ((s, dir) => {
      val e0 = coPurchase(s, dir).where(col("w") >= 5L)
        .select("u", "v").ckpt()
      val deg = e0.select(col("u").as("x"))
        .unionAll(e0.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val hubs = broadcast(deg.orderBy(desc("d"), asc("x"))
        .limit(RobustHubs).select("x"))
      val e1 = e0
        .join(hubs.select(col("x").as("u")), Seq("u"), "left_anti")
        .join(hubs.select(col("x").as("v")), Seq("v"), "left_anti")
        .select("u", "v")
      val eCut = e1.select(col("u").as("a"), col("v").as("b"))
      val eBase = e0.select(col("u").as("a"), col("v").as("b"))
      val (cutLabels, _) = graft.operators.ConnectedComponents.labels(eCut)
      val (baseLabels, _) =
        graft.operators.ConnectedComponents.refine(eBase, cutLabels)
      summary(baseLabels, eBase, lit("base").as("stage"))
        .unionByName(summary(cutLabels, eCut,
          lit("hubs_removed").as("stage")))
        .orderBy("stage")
    }),
  )

  private val CoPurchaseSql =
    """os AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
      |),
      |wt AS (
      |  SELECT a.sk AS u, b.sk AS v, count(*) AS w
      |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Recursive min-label closure + summary row over an edge CTE `e$sfx`
    * (columns a, b, one direction — mirrored internally). */
  private def ccSummarySql(sfx: String, tagExpr: String): String =
    s"""sym$sfx AS (SELECT a, b FROM e$sfx UNION ALL SELECT b, a FROM e$sfx),
       |verts$sfx AS (SELECT DISTINCT a AS v FROM sym$sfx),
       |reach$sfx AS (
       |  SELECT v, v AS l FROM verts$sfx
       |  UNION
       |  SELECT s.b AS v, r.l FROM reach$sfx r JOIN sym$sfx s ON s.a = r.v
       |),
       |comp$sfx AS (SELECT v, min(l) AS l FROM reach$sfx GROUP BY v),
       |sz$sfx AS (SELECT l, count(*) AS sz FROM comp$sfx GROUP BY l),
       |row$sfx AS (
       |  SELECT $tagExpr,
       |    CAST(count(*) AS BIGINT) AS n_components,
       |    CAST(max(sz) AS BIGINT) AS giant_size,
       |    CAST(sum(sz) AS BIGINT) AS n_vertices,
       |    (SELECT CAST(count(*) AS BIGINT) FROM e$sfx) AS n_edges
       |  FROM sz$sfx
       |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_percolation" -> {
      val per = PercThresholds.map { thr =>
        s"""e$thr AS (SELECT u AS a, v AS b FROM wt WHERE w >= $thr),
           |${ccSummarySql(thr.toString,
            s"CAST($thr AS BIGINT) AS threshold")}""".stripMargin
      }.mkString(",\n")
      val out = PercThresholds.map(t => s"SELECT * FROM row$t")
        .mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE $CoPurchaseSql,
         |$per
         |$out
         |ORDER BY threshold""".stripMargin
    },

    "q_robustness" ->
      s"""WITH RECURSIVE $CoPurchaseSql,
         |ebase AS (SELECT u AS a, v AS b FROM wt WHERE w >= 5),
         |deg AS (
         |  SELECT x, count(*) AS d FROM (
         |    SELECT a AS x FROM ebase UNION ALL SELECT b AS x FROM ebase
         |  ) GROUP BY x
         |),
         |hubs AS (SELECT x FROM deg ORDER BY d DESC, x LIMIT $RobustHubs),
         |ecut AS (
         |  SELECT a, b FROM ebase
         |  WHERE a NOT IN (SELECT x FROM hubs)
         |    AND b NOT IN (SELECT x FROM hubs)
         |),
         |${ccSummarySql("base", "'base' AS stage")},
         |${ccSummarySql("cut", "'hubs_removed' AS stage")}
         |SELECT * FROM rowbase
         |UNION ALL SELECT * FROM rowcut
         |ORDER BY stage""".stripMargin,
  )
}
