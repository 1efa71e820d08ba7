package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial scale pins for the round-9 graph ladder operators
  * (round-10 verdict task 6): a planted 10⁴-vertex CHAIN plus one HUB
  * connected to every chain vertex — the pathological input where any
  * per-vertex sequential peel (or an unguarded fixpoint) degenerates to
  * ~10⁴ rounds — asserting that
  *
  *  - q_densest_subgraph's Bahmani threshold peel removes the ENTIRE
  *    chain in ONE round (en-masse removal is what makes the ladder
  *    O(log) instead of Charikar's serial O(V) peel), and the ladder's
  *    row count is a constant (PeelRounds+1) regardless of graph shape;
  *  - q_rich_club's φ(k) ladder is loop-free: exact club sizes/edges on
  *    the planted degrees, constant 4 output rows;
  *  - q_coreness's h-index iteration converges in ≤ 3 rounds when the
  *    fringe is hub-dominated (pendants collapse simultaneously), and —
  *    the contract, not a bug — FAILS LOUDLY at its round cap on the
  *    chain+hub, whose value-unraveling decays one vertex per round from
  *    each chain end (a genuine data dependency no synchronous exact
  *    decomposition beats; see Wave40.corenessHistogram's scaladoc).
  */
class GraphScaleSpec extends AnyFunSuite with SparkFixture {

  private val N = 10000L

  /** Canonical (u < v) undirected edges: chain 0-1-…-(N-1) plus hub N
    * joined to every chain vertex. |V| = N+1, |E| = 2N−1. */
  private def chainPlusHub: DataFrame = {
    val s = spark
    val chain = s.range(N - 1).selectExpr("id AS u", "id + 1 AS v")
    val hub = s.range(N).selectExpr("id AS u", s"CAST($N AS BIGINT) AS v")
    chain.unionByName(hub)
  }

  test("densest-subgraph ladder peels the 10k chain in ONE round, constant rows") {
    val ladder = graft.queries.Wave42.peelLadder(chainPlusHub, rounds = 6)
      .collect().sortBy(_.getLong(0))
    assert(ladder.length == 7, "ladder must emit exactly rounds+1 rows")
    val r0 = ladder(0)
    assert(r0.getLong(1) == N + 1 && r0.getLong(2) == 2 * N - 1)
    // threshold 2.2·|E|/|V| ≈ 4.4 > 3 = max chain degree: every chain
    // vertex (all 10⁴ of them) drops in the FIRST peel, leaving the hub
    // with no surviving edges — rounds are never a function of chain
    // length
    val r1 = ladder(1)
    assert(r1.getLong(1) == 0L && r1.getLong(2) == 0L,
      s"round 1 should have peeled the whole chain, got $r1")
  }

  test("rich-club ladder is loop-free and exact on the planted degrees") {
    val rows = graft.queries.Wave41
      .richClubLadder(spark, chainPlusHub)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // degrees: chain ends 2, chain interior 3, hub N
    val interior = N - 2
    assert(rows.toSeq == Seq(
      // k=1: everyone (d ≥ 2 > 1); all edges survive
      (1L, N + 1, 2 * N - 1),
      // k=2: interior + hub; chain edges between interiors = N-3,
      // hub edges to interiors = N-2
      (2L, interior + 1, (N - 3) + (N - 2)),
      // k=3, k=4: hub alone — no club edges
      (3L, 1L, 0L), (4L, 1L, 0L)))
  }

  test("coreness converges in ≤ 3 rounds on a hub-dominated 10k fringe") {
    // K4 clique (0..3) + 10⁴ pendants, each attached to clique vertex
    // id%4: pendants all drop degree→1 in ONE simultaneous h-index
    // round; clique settles at 3
    val s = spark
    val clique = s.range(4).selectExpr("id AS u")
      .crossJoin(s.range(4).selectExpr("id AS v")).where(col("u") < col("v"))
    val pendants = s.range(N).selectExpr("id % 4 AS u", "id + 4 AS v")
    val hist = graft.queries.Wave40
      .corenessHistogram(clique.unionByName(pendants), maxRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist == Seq((1L, N), (3L, 4L)),
      s"pendants must be coreness 1, the clique 3; got $hist")
  }

  test("coreness FAILS LOUDLY (not silently wrong) on the chain+hub unraveling") {
    // chain interiors start at h-index 3 and decay to the true coreness 2
    // one vertex per round from each end — ~N/2 rounds, far past any
    // sane cap; the contract is a loud require, never a partial answer
    val e = intercept[IllegalArgumentException] {
      graft.queries.Wave40.corenessHistogram(chainPlusHub, maxRounds = 6)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
