package graft

import graft.operators.{Betweenness, Bfs}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks for the BFS family and bounded-seed Brandes —
  * in-memory references that mirror the operators' EXACT semantics
  * (bounded rounds, per-level σ accumulation, round-8 + decimal-summed δ),
  * so the distributed loops (including round 7's fused single-shuffle
  * frontier dedup) are pinned against an independent implementation on
  * arbitrary digraph shapes. */
class BfsBrandesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Bounded multi-source BFS: v -> min hop distance (≤ rounds). */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                     rounds: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    val dist = scala.collection.mutable.Map[Long, Long](
      seeds.toSeq.map(_ -> 0L): _*)
    var frontier = seeds
    for (d <- 1 to rounds) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(dist(_) = d.toLong)
    }
    dist.toMap
  }

  test("Bfs.run matches in-memory bounded BFS on random digraphs") {
    val rnd = new scala.util.Random(2024)
    for (trial <- 1 to 6) {
      val nV = 4 + rnd.nextInt(16)
      val nE = 6 + rnd.nextInt(50)
      val edges = Seq.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val seeds = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(nV).toLong).distinct
      val rounds = 1 + rnd.nextInt(4)
      val got = Bfs.run(edges.toDF("src", "dst"), seeds.toDF("v"), rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == refBfs(edges, seeds.toSet, rounds),
        s"trial $trial edges=$edges seeds=$seeds rounds=$rounds")
    }
  }

  test("Bfs.perSource matches per-seed in-memory BFS") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val nV = 4 + rnd.nextInt(12)
      val nE = 6 + rnd.nextInt(40)
      val edges = Seq.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val seeds = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(nV).toLong).distinct
      val got = Bfs.perSource(edges.toDF("src", "dst"),
          seeds.toDF("seed"), 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val want = seeds.flatMap(s =>
        refBfs(edges, Set(s), 3).map { case (v, d) => ((s, v), d) }).toMap
      assert(got == want, s"trial $trial edges=$edges seeds=$seeds")
    }
  }

  /** In-memory Brandes mirroring the operator's exact arithmetic:
    * truncated level sets, exact Long σ, per-edge term
    * round((σv/σw)·(1+δw), 8), per-vertex δ = round-8 decimal sum,
    * bc = round-6 decimal sum over seeds. */
  private def refBrandes(edges: Seq[(Long, Long)], seeds: Seq[Long],
                         depth: Int): Map[Long, (Long, Double)] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    def r8(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deltas = scala.collection.mutable.Map
      .empty[(Long, Long), BigDecimal] // (seed, v) -> δ at its level
    for (s <- seeds.distinct) {
      // forward: level sets + σ
      val lvl = scala.collection.mutable.Map[Long, Int](s -> 0)
      val sig = scala.collection.mutable.Map[Long, Long](s -> 1L)
      var frontier = Set(s)
      for (d <- 1 to depth) {
        val cand = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj(v))
          if (!lvl.contains(w) || lvl(w) == d)
            cand(w) = cand.getOrElse(w, 0L) + sig(v)
        frontier = cand.keySet.filterNot(w => lvl.contains(w) && lvl(w) < d).toSet
        for (w <- frontier) { lvl(w) = d; sig(w) = cand(w) }
      }
      // backward
      val delta = scala.collection.mutable.Map.empty[Long, BigDecimal]
      for (v <- lvl.keys if lvl(v) == depth) delta(v) = BigDecimal(0)
      for (d <- (depth - 1) to 1 by -1) {
        for (v <- lvl.keys if lvl(v) == d) {
          val terms = for {
            w <- adj(v) if lvl.get(w).contains(d + 1)
          } yield BigDecimal(r8(
            (sig(v).toDouble / sig(w).toDouble) * (1.0 + delta(w).toDouble)))
          val sum = terms.foldLeft(BigDecimal(0))(_ + _)
          delta(v) = BigDecimal(r8(sum.toDouble))
        }
      }
      for ((v, dd) <- delta if lvl(v) >= 1) deltas((s, v)) = dd
    }
    deltas.groupBy(_._1._2).map { case (v, m) =>
      val bd = m.values.map(_.setScale(8, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      v -> (m.size.toLong,
        bd.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("Betweenness matches an in-memory Brandes mirror on random digraphs") {
    val rnd = new scala.util.Random(314)
    for (trial <- 1 to 4) {
      val nV = 5 + rnd.nextInt(10)
      val nE = 8 + rnd.nextInt(40)
      val edges = Seq.fill(nE)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq.fill(2)(rnd.nextInt(nV).toLong).distinct
      val got = Betweenness.run(edges.toDF("src", "dst"),
          seeds.toDF("seed"), 3)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .toMap
      val want = refBrandes(edges, seeds, 3)
      assert(got.keySet == want.keySet,
        s"trial $trial vertices differ: edges=$edges seeds=$seeds\n" +
          s"got=${got.keySet.toSeq.sorted} want=${want.keySet.toSeq.sorted}")
      for ((v, (n, bc)) <- got) {
        assert(n == want(v)._1, s"trial $trial v=$v n_seeds")
        assert(math.abs(bc - want(v)._2) < 1e-9,
          s"trial $trial v=$v bc=$bc want=${want(v)._2}")
      }
    }
  }
}
