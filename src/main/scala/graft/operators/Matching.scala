package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Distributed greedy MAXIMAL matching — synchronous min-id proposal
  * rounds (the Israeli-Itai symmetry-breaking shape, made deterministic
  * by proposing to the MINIMUM-id neighbor instead of a random one):
  *
  *  per round, every unmatched vertex proposes to its smallest unmatched
  *  neighbor; an edge joins the matching iff the proposals are MUTUAL
  *  (p(u) = v ∧ p(v) = u); matched vertices leave the graph.
  *
  * Deterministic (pure integer min algebra — the same matching in any
  * engine or partitioning), one partial-agg'd proposal shuffle + two
  * anti-joins per round, O(V) state. Greedy-maximal, not maximum: every
  * remaining edge loses an endpoint once the loop drains, the 1/2-
  * approximation every distributed matcher settles for. Used for
  * conflict-free pairing (dedup reviewers, A/B partner assignment,
  * graph coarsening for multilevel partitioners).
  */
object Matching {

  /** @param edges0 (src, dst) BIGINT pairs, undirected (one direction
    *   suffices; self-loops and duplicates drop).
    * @param rounds proposal rounds to run (bounded contract — the
    *   result equals the same number of unrolled rounds; the loop exits
    *   early once no edge survives, which cannot change the output).
    * @return (u, v, round) — matched pairs, u < v, 1-based round. */
  def run(edges0: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 30, s"rounds must be in [1, 30], got $rounds")
    var rem = edges0
      .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
      .where(col("u") =!= col("v")).distinct().ckpt()
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 0
    while (r < rounds && !rem.isEmpty) {
      r += 1
      val sym = rem.select(col("u").as("a"), col("v").as("b"))
        .unionByName(rem.select(col("v").as("a"), col("u").as("b")))
      val prop = sym.groupBy("a").agg(min("b").as("p")).ckpt()
      val matched = prop.alias("x")
        .join(prop.alias("y"),
          col("x.a") === col("y.p") && col("x.p") === col("y.a") &&
            col("x.a") < col("x.p"))
        .select(col("x.a").as("u"), col("x.p").as("v"),
          lit(r.toLong).as("round"))
        .ckpt() // output + the two vertex-removal anti-joins
      out += matched
      val mv = matched.select(explode(array(col("u"), col("v"))).as("x"))
      rem = rem
        .join(mv.select(col("x").as("u")), Seq("u"), "left_anti")
        .join(mv.select(col("x").as("v")), Seq("v"), "left_anti")
        .select("u", "v")
        .ckpt()
    }
    if (out.isEmpty) rem.select(col("u"), col("v"), lit(0L).as("round"))
      .where(lit(false))
    else out.reduce(_ unionByName _)
  }
}
