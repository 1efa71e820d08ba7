package graft

import graft.operators.{KCore, RandomWalk, Sssp}
import org.scalatest.funsuite.AnyFunSuite

/** Unit evidence for the wave-3 graph operators beyond their single-input
  * DuckDB oracles: in-memory Bellman-Ford / peeling / walk reference
  * implementations cross-checked on randomized graphs, plus the
  * structural contracts (round-bounded reach, dead-end walkers, cascade
  * peeling, positive-weight enforcement). */
class Wave3OpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val rng = new scala.util.Random(421)

  private def randomWeightedDigraph(nv: Int, ne: Int): Seq[(Long, Long, Long)] =
    Seq.fill(ne)((rng.nextInt(nv).toLong, rng.nextInt(nv).toLong,
      1L + rng.nextInt(9))).filter(e => e._1 != e._2).distinct

  /** In-memory bounded Bellman-Ford: full relaxation sweeps. */
  private def refSssp(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                      rounds: Int): Map[Long, Long] = {
    var d = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (s, t, w) =>
        d.get(s).map(ds => t -> (ds + w)) }
      d = (d.toSeq ++ cand).groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2).min }
    }
    d
  }

  test("Sssp matches in-memory Bellman-Ford on random weighted digraphs") {
    for (_ <- 1 to 5) {
      val edges = randomWeightedDigraph(30, 120)
      val seeds = edges.map(_._1).distinct.take(3)
      val got = Sssp.run(edges.toDF("src", "dst", "w"),
          seeds.toDF("v"), 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refSssp(edges, seeds.toSet, 4))
    }
  }

  test("Sssp prefers a lighter multi-hop path over a heavy direct edge") {
    // 1→4 direct costs 100; 1→2→3→4 costs 3
    val edges = Seq((1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val d2 = Sssp.run(edges, Seq(1L).toDF("v"), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(4L) == 100L, "within 2 rounds only the direct edge reaches 4")
    val d3 = Sssp.run(edges, Seq(1L).toDF("v"), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3(4L) == 3L, "round 3 relaxes the lighter 3-hop path")
  }

  test("Sssp rejects non-positive weights at runtime") {
    val edges = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Sssp.run(edges, Seq(1L).toDF("v"), 1).collect()
    }
    assert(ex.getMessage != null)
  }

  /** In-memory peeling reference. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).map { case (v, xs) => v -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
  }

  test("KCore matches in-memory peeling on random graphs") {
    for (_ <- 1 to 5) {
      val edges = Seq.fill(80)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      val got = KCore.run(edges.toDF("src", "dst"), 3, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refKCore(edges, 3, 3))
    }
  }

  test("KCore peels a chain off a triangle over multiple rounds (cascade)") {
    // triangle 1-2-3 plus pendant chain 3-4-5: k=2 peels 5 in round 1,
    // which drops 4's degree to 1 so round 2 peels 4; the triangle stays
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val r1 = KCore.run(edges.toDF("src", "dst"), 2, 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L), "round 1 peels only the chain tip")
    val r2 = KCore.run(edges.toDF("src", "dst"), 2, 2)
      .collect().map(_.getLong(0)).toSet
    assert(r2 == Set(1L, 2L, 3L), "round 2 cascades to the next chain link")
  }

  test("RandomWalk is reproducible, neighbor-respecting, and stops at dead ends") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
      .toDF("src", "dst") // 4 is a dead end
    val seeds = Seq(1L, 2L, 4L).toDF("v")
    def walk() = RandomWalk.run(edges, seeds, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w1 = walk()
    assert(w1 == walk(), "identical across reruns")
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(3L, 4L), 3L -> Set(1L),
      4L -> Set.empty[Long])
    val bySeedStep = w1.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).toSeq).toMap
    for (((seed, step), vs) <- bySeedStep) {
      assert(vs.size == 1, s"one position per (seed=$seed, step=$step)")
      if (step > 0) {
        val prev = bySeedStep((seed, step - 1)).head
        assert(adj(prev).contains(vs.head),
          s"step $step of seed $seed moved $prev→${vs.head}: not an edge")
      }
    }
    // a walker that reaches the dead end emits nothing further; seed 4
    // starts there, so it has exactly the step-0 row
    assert(w1.filter(_._1 == 4L) == Set((4L, 0L, 4L)))
    // every step-k set is a (possibly improper) prefix of 0..3
    for (seed <- Seq(1L, 2L)) {
      val steps = w1.filter(_._1 == seed).map(_._2)
      assert(steps == (0L to steps.max).toSet, s"contiguous steps for $seed")
    }
  }

  test("RandomWalk result is invariant under input partitioning") {
    val edges = randomWeightedDigraph(20, 60).map(e => (e._1, e._2))
    val seeds = edges.map(_._1).distinct.take(4)
    def run(parts: Int) = RandomWalk.run(
        edges.toDF("src", "dst").repartition(parts),
        seeds.toDF("v"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(7))
  }
}
