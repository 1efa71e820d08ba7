package graft

import graft.operators.Mst
import org.scalatest.funsuite.AnyFunSuite

/** Borůvka minimum spanning forest (operators.Mst) — cross-checked against
  * an in-memory Kruskal under the SAME (w, u, v) total order (so the edge
  * SETS must match exactly, not just the total weight), on random weighted
  * graphs and on a planted 150k-edge graph whose MST weight is known. */
class MstSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Kruskal with union-find under the (w, u, v) total order. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
      .groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).min) }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((u, v, w) <- canon.sortBy(e => (e._3, e._1, e._2))) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.toSet
  }

  test("Mst matches Kruskal's edge set on random weighted graphs") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 6) {
      val nV = 3 + rnd.nextInt(18)
      val nE = 4 + rnd.nextInt(50)
      val edges = Seq.fill(nE)((rnd.nextInt(nV).toLong,
        rnd.nextInt(nV).toLong, rnd.nextInt(20).toLong))
      val got = Mst.run(edges.toDF("src", "dst", "w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == kruskal(edges), s"trial $trial edges=$edges")
    }
  }

  test("Mst recovers the planted spanning tree of a 150k-edge graph") {
    // 50k vertices on a weight-1 path (the unique MST: every non-path
    // edge below has weight ≥ 2), plus 100k deterministic LCG chords of
    // weight 2..9 — connected by construction, MST weight = 49,999.
    val n = 50000
    val path = (0 until n - 1).map(i => (i.toLong, i + 1L, 1L))
    val chords = (0 until 100000).map { k =>
      val a = (k * 2654435761L % n + n) % n
      val b = ((k * 40503L + 12345) % n + n) % n
      (a, b, 2L + k % 8)
    }.filter(e => e._1 != e._2)
    val edges = path ++ chords
    assert(edges.size >= 140000)
    val got = Mst.run(edges.toDF("src", "dst", "w")).collect()
    assert(got.length == n - 1, s"forest size ${got.length}")
    assert(got.map(_.getLong(2)).sum == (n - 1).toLong) // all weight-1
    // and it IS the path: every chosen edge is consecutive
    assert(got.forall(r => r.getLong(1) == r.getLong(0) + 1))
  }
}
