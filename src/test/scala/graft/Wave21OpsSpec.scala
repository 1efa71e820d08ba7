package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-21 composition/monitoring queries at
  * sf0.001 — laws the value gate cannot express (Jaccard symmetry
  * bounds, gains-curve monotonicity and end-point identities, PSI
  * non-negativity and bin-mass conservation). */
class Wave21OpsSpec extends AnyFunSuite with SparkFixture {

  test("source_ngram_overlap: jac in [0,1], co <= min(sza, szb), " +
    "pairs are canonical (sa < sb) and unique") {
    val rows = SparkEntry.queries("q_source_ngram_overlap")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      val (co, sza, szb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(co >= 1 && co <= math.min(sza, szb))
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0 + 1e-9)
    }
  }

  test("gains_lift: 10 deciles, cumulative capture nondecreasing to 1, " +
    "lift nonincreasing-to-1 at the last decile, masses conserve") {
    val rows = SparkEntry.queries("q_gains_lift")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(4) + 1e-9,
        "capture must be nondecreasing")
    }
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9,
      "full population captures everything")
    assert(math.abs(rows.last.getDouble(5) - 1.0) < 1e-9,
      "lift at decile 10 is the base rate ratio = 1")
    assert(rows.map(_.getLong(2)).sum == rows.last.getLong(3),
      "per-decile positives sum to the final cumulative")
  }

  test("psi: 10 bins, psi >= 0 (Laplace-smoothed shares), scalar psi, " +
    "period masses conserve against the event count") {
    val rows = SparkEntry.queries("q_psi")(spark, Sf).collect()
    assert(rows.length == 10)
    val psi = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == psi), "psi is a scalar")
    // PSI is a symmetrized-KL-style sum of (p-q)ln(p/q) terms, each >= 0
    assert(psi >= -1e-9, s"PSI must be nonnegative: $psi")
    for (r <- rows) {
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 1)
      assert(r.getDouble(4) > 0 && r.getDouble(4) < 1)
    }
    val ev = graft.queries.table(spark, Sf, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == ev,
      "bin masses partition the event stream")
  }
}
