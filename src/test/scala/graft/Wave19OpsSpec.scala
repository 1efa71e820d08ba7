package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-19 supervised-eval / network-structure
  * queries at sf0.001 — laws the value gate cannot express (confusion-
  * matrix mass conservation, the correlation-coefficient range and the
  * bipartite sign, MDE/powered consistency). */
class Wave19OpsSpec extends AnyFunSuite with SparkFixture {

  test("langid_accuracy: cell mass sums to n_docs, accuracy is the " +
    "diagonal share, per-lang shares sum to 1") {
    val rows = SparkEntry.queries("q_langid_accuracy")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.head.getLong(5)
    assert(rows.map(_.getLong(2)).sum == nDocs, "cells partition the docs")
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(diag == rows.head.getLong(6), "n_correct is the diagonal mass")
    assert(math.abs(rows.head.getDouble(7) - diag.toDouble / nDocs) < 1e-3)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3),
        s"lang_total of $lang is its row sum")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-3,
        s"shares of $lang sum to 1")
    }
  }

  test("assortativity: r in [-1, 1] and negative (bipartite hub-leaf), " +
    "m_endpoints = 2 * n_edges, vertex count matches the distinct keys") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_assortativity")(spark, Sf).head()
    assert(r.getLong(2) == 2 * r.getLong(1))
    val a = r.getDouble(3)
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"r out of range: $a")
    assert(a < 0, s"bipartite incidence graph must be disassortative: $a")
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val nv = li.select(countDistinct(col("l_suppkey"))).head().getLong(0) +
      li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(r.getLong(0) == nv, s"n_vertices ${r.getLong(0)} != $nv")
  }

  test("mde_power: rates in [0,1], mde_abs > 0 on a non-degenerate " +
    "metric, powered consistent with |lift| vs mde_abs, arms partition") {
    val r = SparkEntry.queries("q_mde_power")(spark, Sf).head()
    val (n0, x0, n1, x1) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(x0 <= n0 && x1 <= n1)
    val ev = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(n0 + n1 == ev, "arms partition the event stream")
    for (i <- 4 to 6)
      assert(r.getDouble(i) >= 0 && r.getDouble(i) <= 1.0)
    val mde = r.getDouble(7)
    assert(mde > 0, "event-grain conversion must not saturate")
    val powered = r.getLong(10)
    val lift = r.getDouble(9)
    // rounded display values; compare with a tolerance wide enough for
    // the round-6 but tight enough to catch an inverted flag
    if (math.abs(math.abs(lift) - mde) > 1e-5)
      assert(powered == (if (math.abs(lift) >= mde) 1L else 0L),
        s"powered=$powered inconsistent with |lift|=$lift vs mde=$mde")
  }
}
