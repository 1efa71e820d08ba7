package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-27 sensitivity-audit queries at
  * sf0.001 — monotonicity laws and entropy bounds the value gate
  * cannot express. */
class Wave27OpsSpec extends AnyFunSuite with SparkFixture {

  test("session_gap_sensitivity: sessions nonincreasing in the gap, " +
    "bounded by [n_users, n_events], events/session consistent") {
    val rows = SparkEntry.queries("q_session_gap_sensitivity")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 30L, 60L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) >= b.getLong(3),
        "a larger gap can only merge sessions")
    }
    for (r <- rows) {
      val (nu, ne, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns >= nu && ns <= ne)
      assert(math.abs(r.getDouble(4) - ne.toDouble / ns) < 1e-5)
    }
  }

  test("entropy_rate: per-state entropy in [0, ln k], overall is the " +
    "count-weighted mean of the states") {
    val rows = SparkEntry.queries("q_entropy_rate")(spark, Sf).collect()
    val k = rows.length
    assert(k > 1)
    val hRate = rows.map(_.getDouble(3)).distinct
    assert(hRate.length == 1)
    var wsum = 0.0; var n = 0L
    for (r <- rows) {
      val h = r.getDouble(2)
      assert(h >= -1e-9 && h <= math.log(k) + 1e-6,
        s"state entropy $h outside [0, ln $k]")
      wsum += h * r.getLong(1); n += r.getLong(1)
    }
    assert(math.abs(hRate.head - wsum / n) < 1e-4,
      "overall rate is the stationary-count mixture of state entropies")
  }

  test("dup_growth: docs and dups nondecreasing in the prefix, full " +
    "prefix matches the exact-dup count") {
    val rows = SparkEntry.queries("q_dup_growth")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(25L, 50L, 75L, 100L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2))
    }
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val full = rows.last
    assert(full.getLong(1) == docs.count())
    val exactDups = docs.count() -
      docs.select("text").distinct().count()
    assert(full.getLong(2) == exactDups,
      "prefix 100 reproduces the corpus exact-dup count")
  }
}
