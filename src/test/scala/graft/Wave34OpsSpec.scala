package graft

import graft.queries.Wave34
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-34 connectivity audits at sf0.001. */
class Wave34OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_percolation: giant and vertex counts shrink as the threshold rises") {
    val rows = Wave34.queries("q_percolation")(spark, Sf).collect()
    assert(rows.length == 3)
    val byThr = rows.sortBy(_.getLong(0))
    for (Array(lo, hi) <- byThr.sliding(2)) {
      assert(lo.getLong(2) >= hi.getLong(2), "giant_size monotone")
      assert(lo.getLong(3) >= hi.getLong(3), "n_vertices monotone")
      assert(lo.getLong(4) >= hi.getLong(4), "n_edges monotone")
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "giant within vertex count")
      assert(r.getLong(1) <= r.getLong(3), "components within vertex count")
    }
  }

  test("q_robustness: hub removal never grows the graph or the giant") {
    val rows = Wave34.queries("q_robustness")(spark, Sf).collect()
    assert(rows.length == 2)
    val base = rows.find(_.getString(0) == "base").get
    val cut = rows.find(_.getString(0) == "hubs_removed").get
    assert(cut.getLong(2) <= base.getLong(2), "giant can only shrink")
    assert(cut.getLong(3) <= base.getLong(3), "vertices can only shrink")
    assert(cut.getLong(4) < base.getLong(4),
      "removing 8 hubs from a connected co-purchase graph must drop edges")
  }

  test("ConnectedComponents.refine ≡ cold labels on a planted nested graph") {
    // full graph: 3 chains of 60 bridged into one 180-vertex component
    // plus a 20-vertex ring; subgraph: drop the two bridge edges and the
    // ring — refine(full, labels(sub)) must equal labels(full) exactly
    import spark.implicits._
    val chains = (0 until 3).flatMap { c =>
      (0 until 59).map(i => (c * 60L + i, c * 60L + i + 1))
    }
    val bridges = Seq((59L, 60L), (119L, 120L))
    val ring = (0 until 20).map(i => (200L + i, 200L + (i + 1) % 20))
    val full = (chains ++ bridges ++ ring).toDF("a", "b")
    val sub = chains.toDF("a", "b")
    val (subL, _) = graft.operators.ConnectedComponents.labels(sub)
    val (cold, _) = graft.operators.ConnectedComponents.labels(full)
    val (warm, _) = graft.operators.ConnectedComponents.refine(full, subL)
    val coldM = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val warmM = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warmM == coldM)
    assert(warmM.values.toSet == Set(0L, 200L), "two components, min labels")
    spark.catalog.clearCache()
  }
}
