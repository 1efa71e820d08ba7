package graft

import org.scalatest.funsuite.AnyFunSuite

/** The defining property of the wave-56 deferred-acceptance rounds: run to
  * convergence, every acceptor is matched (the fixture has more proposers
  * than acceptors at sf0.001 — 16×10, the unequal-sides case) and there is
  * NO BLOCKING PAIR, counting unmatched proposers as preferring anyone. */
class Wave56OpsSpec extends AnyFunSuite with SparkFixture {

  test("galeShapley converges: all acceptors matched, no blocking pair") {
    val pf = graft.queries.Wave56.prefTable(spark, Sf)
    val prefRows = pf.collect().map(r =>
      (r.getAs[Long]("p"), r.getAs[Long]("a")) ->
        (r.getAs[Int]("rank"), r.getAs[Long]("ascore"))).toMap
    val ps = prefRows.keySet.map(_._1)
    val as = prefRows.keySet.map(_._2)
    // 40 synchronized rounds >> worst case for these sizes: a free
    // proposer either wins or advances its pointer every round until its
    // list is exhausted
    val eng = graft.queries.Wave56
      .galeShapley(pf, rounds = 40)
      .collect().map(r => r.getAs[Long]("a") -> r.getAs[Long]("p")).toMap
    // with |A| <= |P|, convergence matches EVERY acceptor exactly once
    assert(eng.keySet == as, s"unmatched acceptors: ${as -- eng.keySet}")
    assert(eng.values.toSet.size == eng.size, "a proposer holds two matches")
    val matchOf = eng.map(_.swap) // matched proposer -> acceptor
    val blocking = for {
      p <- ps.toSeq; a <- as.toSeq if !matchOf.get(p).contains(a)
      // p prefers a: p is unmatched, or ranks a above its own match
      if matchOf.get(p).forall(m => prefRows((p, a))._1 < prefRows((p, m))._1)
      // a prefers p over its current holder
      if prefRows((p, a))._2 > prefRows((eng(a), a))._2
    } yield (p, a)
    assert(blocking.isEmpty, s"blocking pairs: $blocking")
    spark.catalog.clearCache()
  }
}
