package graft

import graft.operators.Matching
import org.scalatest.funsuite.AnyFunSuite

/** Greedy maximal matching (operators.Matching) — cross-checked against
  * an in-memory mirror of the SAME min-id mutual-proposal rounds, plus
  * the structural laws: matched pairs are disjoint real edges, and once
  * the loop drains no remaining edge has both endpoints unmatched
  * (maximality). */
class MatchingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def refRounds(edges0: Seq[(Long, Long)],
                        rounds: Int): Set[(Long, Long, Long)] = {
    var rem = edges0.filter(e => e._1 != e._2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (r <- 1 to rounds if rem.nonEmpty) {
      val prop = (rem ++ rem.map(_.swap)).groupBy(_._1)
        .map { case (a, es) => a -> es.map(_._2).min }
      val matched = rem.filter { case (u, v) =>
        prop(u) == v && prop(v) == u }
      matched.foreach { case (u, v) => out += ((u, v, r.toLong)) }
      val mv = matched.flatMap { case (u, v) => Seq(u, v) }.toSet
      rem = rem.filterNot { case (u, v) => mv(u) || mv(v) }
    }
    out.toSet
  }

  test("Matching matches the in-memory proposal mirror on random graphs") {
    val rnd = new scala.util.Random(555)
    for (trial <- 1 to 6) {
      val nV = 4 + rnd.nextInt(16)
      val nE = 5 + rnd.nextInt(45)
      val edges = Seq.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val got = Matching.run(edges.toDF("src", "dst"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == refRounds(edges, 5), s"trial $trial edges=$edges")
    }
  }

  test("Matching is maximal once the loop drains, and pairs are disjoint") {
    val rnd = new scala.util.Random(808)
    val nV = 40
    val edges = Seq.fill(200)(
      (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      .filter(e => e._1 != e._2)
    val got = Matching.run(edges.toDF("src", "dst"), 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mv = got.flatMap { case (u, v) => Seq(u, v) }
    assert(mv.distinct.length == mv.length, "matched vertices must be disjoint")
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got.forall(canon), "matched pairs must be real edges")
    val ms = mv.toSet
    assert(canon.forall { case (u, v) => ms(u) || ms(v) },
      "maximality: every edge must lose at least one endpoint")
  }

  test("a disjoint perfect matching is found entirely in round 1") {
    val edges = (0 until 10).map(i => (2L * i, 2L * i + 1))
    val got = Matching.run(edges.toDF("src", "dst"), 3).collect()
    assert(got.length == 10 && got.forall(_.getLong(2) == 1L))
  }
}
