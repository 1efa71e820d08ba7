package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-20 scale-planning audits at sf0.001 —
  * laws the value gate cannot express (diameter interpolation bounds,
  * percentile ordering within the frequency distribution, the
  * burstiness range and an independent in-memory recomputation). */
class Wave20OpsSpec extends AnyFunSuite with SparkFixture {

  test("effective_diameter: d90 <= t_max, interpolated d_eff in " +
    "(d90-1, d90], nf_inf positive") {
    val r = SparkEntry.queries("q_effective_diameter")(spark, Sf).head()
    val (tMax, nfInf, d90, dEff) =
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
    assert(nfInf > 0)
    assert(d90 >= 0 && d90 <= tMax)
    if (d90 == 0) assert(dEff == 0.0)
    else assert(dEff > d90 - 1 - 1e-9 && dEff <= d90 + 1e-9,
      s"d_eff $dEff outside (${d90 - 1}, $d90]")
  }

  test("skew_audit: one row per key, shared n_rows, " +
    "p50 <= p99 <= max, skew_factor >= 1, avg = n_rows / n_keys") {
    val rows = SparkEntry.queries("q_skew_audit")(spark, Sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    assert(rows.map(_.getLong(1)).distinct.length == 1,
      "all three audits scan the same row count")
    for (r <- rows) {
      val (nRows, nKeys, maxF, p50, p99) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7))
      assert(p50 >= 1 && p50 <= p99 && p99 <= maxF,
        s"${r.getString(0)}: p50=$p50 p99=$p99 max=$maxF")
      assert(math.abs(r.getDouble(4) - nRows.toDouble / nKeys) < 1e-3)
      assert(r.getDouble(5) >= 1.0 - 1e-9,
        "max frequency cannot be below the average")
    }
  }

  test("burstiness: B in [-1, 1], rows ordered by activity, mean is " +
    "scalar, and the top user's B matches an in-memory recomputation") {
    val rows = SparkEntry.queries("q_burstiness")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
    }
    for (r <- rows if !r.isNullAt(4))
      assert(r.getDouble(4) >= -1.0 - 1e-9 && r.getDouble(4) <= 1.0 + 1e-9)
    assert(rows.map(_.getDouble(6)).distinct.length == 1)
    // independent recomputation for the most active user
    val top = rows.head
    val us = graft.queries.table(spark, Sf, "events")
      .where(org.apache.spark.sql.functions.col("user_id") === top.getLong(0))
      .selectExpr("unix_micros(ts) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.map(_._1)
    val gaps = us.sliding(2).map(p => (p(1) - p(0)).toDouble).toArray
    assert(gaps.length == top.getLong(1), "gap count matches")
    val mu = gaps.sum / gaps.length
    val sigma = math.sqrt(gaps.map(g => g * g).sum / gaps.length - mu * mu)
    val want = (sigma - mu) / (sigma + mu)
    assert(math.abs(top.getDouble(4) - want) < 1e-4,
      s"engine B=${top.getDouble(4)} vs recomputed $want")
  }
}
