package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Planted-graph pins for the wave-42 peeling ladder and square census
  * (the streaming session processor itself is covered by StreamOpsSpec;
  * its sink round-trip is oracle-gated as q_stream_session_sink). */
class Wave42OpsSpec extends AnyFunSuite with SparkFixture {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  /** K5 with a pendant path hanging off vertex 1: 5-clique (density 2.0)
    * plus 100→101→102→1 tail. */
  private def cliqueWithTail: DataFrame = {
    val k5 = for {
      i <- 1L to 5L; j <- (i + 1) to 5L
    } yield (i, j)
    edges(k5 ++ Seq((1L, 102L), (100L, 101L), (101L, 102L)): _*)
  }

  test("peelLadder: peels the tail, keeps the K5 core at its exact density") {
    val ladder = graft.queries.Wave42
      .peelLadder(cliqueWithTail, rounds = 4).collect()
    assert(ladder.length == 5)
    val r0 = ladder.head
    assert(r0.getAs[Long]("n_vertices") == 8L
      && r0.getAs[Long]("n_edges") == 13L)
    assert(r0.getAs[Double]("density") == 1.625)
    // round-0 threshold: remove d <= 2.2 * 13/8 = 3.575 — all three tail
    // vertices (d = 1, 2, 2) go at once; the K5 (d >= 4) survives. The
    // round-1 threshold is then d > 2.2 * 10/5 = 4.4, which peels the whole
    // clique — so the ladder must show the clique row at exactly density
    // 2.0 before emptying (the 2(1+eps)-approximation witness).
    val r1 = ladder(1)
    assert(r1.getAs[Long]("n_vertices") == 5L
      && r1.getAs[Long]("n_edges") == 10L, r1)
    assert(r1.getAs[Double]("density") == 2.0)
    // max density over the ladder is the approximation answer
    val best = ladder.flatMap(r => Option(r.getAs[java.lang.Double]("density")))
      .map(_.doubleValue).max
    assert(best == 2.0)
    // once empty, rows stay (0, 0, NULL)
    val rLast = ladder.last
    assert(rLast.getAs[Long]("n_vertices") == 0L
      && rLast.isNullAt(rLast.fieldIndex("density")))
    spark.catalog.clearCache()
  }

  test("squareCensus: C4 and overlap counts on a planted butterfly graph") {
    // 4-cycle 1-2-3-4 plus chord 1-3: squares = 1; distance-2 pairs:
    // (1,3) via 2 and 4 (cn=2, adjacent via the chord), (2,4) via 1 and 3
    // (cn=2, non-adjacent) -> n_pairs counts pairs at distance <= 2 with a
    // common neighbor: (1,2),(1,3),(1,4),(2,3),(2,4),(3,4) all have cn>=1.
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val r = graft.queries.Wave42.squareCensus(g).collect().head
    assert(r.getAs[Long]("n_squares") == 1L, r)
    assert(r.getAs[Long]("max_cn") == 2L, r)
    assert(r.getAs[Long]("n_pairs") == 6L, r)
    assert(r.getAs[Long]("n_adj_pairs") == 5L, r)
    spark.catalog.clearCache()
  }

  test("squareCensus: K4 has 3 squares (every 4-cycle of the clique)") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = graft.queries.Wave42.squareCensus(k4).collect().head
    assert(r.getAs[Long]("n_squares") == 3L, r)
    assert(r.getAs[Long]("n_adj_pairs") == 6L, r)
    spark.catalog.clearCache()
  }
}
