package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-23 split-hygiene/inference/sizing
  * queries at sf0.001 — laws the value gate cannot express (leak rows
  * really cross splits, the order-statistic CI brackets the median,
  * bloom sizing is monotone in the FPP target). */
class Wave23OpsSpec extends AnyFunSuite with SparkFixture {

  test("split_leakage: every row crosses splits with jac >= 0.5, " +
    "counters nest, leak_rate matches the counters") {
    val rows = SparkEntry.queries("q_split_leakage")(spark, Sf).collect()
    for (r <- rows) {
      assert(r.getString(2) != r.getString(3), "leaky pair must cross splits")
      assert(r.getDouble(4) >= 0.5 && r.getDouble(4) <= 1.0)
      val (cand, cross, leaky) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(leaky <= cross && cross <= cand)
      assert(leaky == rows.length.toLong,
        "n_leaky is the count of emitted rows")
      assert(math.abs(r.getDouble(8) - leaky.toDouble / cross) < 1e-4)
    }
  }

  test("median_ci: ci_lo <= median <= ci_hi and n matches an " +
    "independent per-type count") {
    val rows = SparkEntry.queries("q_median_ci")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val counts = spark.read
      .parquet(s"$Sf/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(1) == counts(r.getString(0)))
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9, "ci_lo <= median")
      assert(r.getDouble(2) <= r.getDouble(4) + 1e-9, "median <= ci_hi")
    }
  }

  test("bloom_planner: two plans per type, tighter FPP costs more " +
    "bits, m_mib prices m_bits, k fixed per target") {
    val rows = SparkEntry.queries("q_bloom_planner")(spark, Sf).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.values.forall(_.length == 2))
    for ((_, Array(p100, p10)) <- byType.view.mapValues(_.sortBy(-_.getLong(1)))) {
      assert(p100.getLong(1) == 100L && p10.getLong(1) == 10L)
      assert(p100.getLong(2) == p10.getLong(2), "audience identical")
      assert(p10.getLong(3) > p100.getLong(3), "0.1% FPP needs more bits")
      assert(p100.getLong(4) == 7L && p10.getLong(4) == 10L)
      for (p <- Seq(p100, p10)) {
        assert(p.getLong(3) >= p.getLong(2) * 9, "≥9 bits/key at ≤1% FPP")
        assert(math.abs(p.getDouble(5) - p.getLong(3).toDouble / (1 << 23)) <
          1e-4 / 2 + 1e-9)
      }
    }
  }
}
