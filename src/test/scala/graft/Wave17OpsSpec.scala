package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-17 calibration queries (ANN recall,
  * BPE fertility, dedup threshold sweep) at sf0.001 — laws the value
  * gate cannot express (recall bounds and its macro-average identity,
  * fertility lower bounds, sweep monotonicity in τ) which must hold
  * at ANY scale or partitioning. */
class Wave17OpsSpec extends AnyFunSuite with SparkFixture {

  test("ann_recall: per-query recall in [0,1], k_exact <= 5, " +
    "mean_recall is the macro average") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val mean = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == mean), "mean_recall is a scalar")
    for (r <- rows) {
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 5)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    val want = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(mean - want) < 1e-3, s"mean $mean vs $want")
  }

  test("bpe_fertility: tokens_per_word >= 1 (merges only shrink, " +
    "never below one symbol), chars_per_token >= 1, ratios consistent") {
    val rows = SparkEntry.queries("q_bpe_fertility")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nw, nt, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt >= nw, "each word is at least one token")
      assert(nc >= nt, "each token is at least one char")
      assert(math.abs(r.getDouble(4) - nt.toDouble / nw) < 1e-4)
      assert(math.abs(r.getDouble(5) - nc.toDouble / nt) < 1e-4)
    }
  }

  test("dedup_threshold_sweep: pairs-over and docs-removed are " +
    "non-increasing in the threshold, bounded by the total") {
    val rows = SparkEntry.queries("q_dedup_threshold_sweep")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val total = rows.head.getLong(3)
    assert(rows.forall(_.getLong(3) == total))
    for (r <- rows) {
      assert(r.getLong(1) <= total)
      assert(r.getLong(2) <= r.getLong(1),
        "removed docs cannot exceed qualifying pairs")
    }
    for (Seq(a, b) <- rows.toSeq.sliding(2)) {
      assert(a.getLong(1) >= b.getLong(1), "pairs monotone in tau")
      assert(a.getLong(2) >= b.getLong(2), "removals monotone in tau")
    }
  }
}
