package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-22 quality/sizing audits at sf0.001 —
  * laws the value gate cannot express (the flag's exact-integer gate
  * vs the display fraction, variance decomposition bounds, collision
  * monotonicity in width). */
class Wave22OpsSpec extends AnyFunSuite with SparkFixture {

  test("gopher_ngram_frac: n_dup <= n_tri, dup never counts singles, " +
    "flag agrees with the exact 0.2 cross-multiply") {
    val rows = SparkEntry.queries("q_gopher_ngram_frac")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nTri, nDup, flag) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nDup >= 0 && nDup <= nTri)
      assert(nDup != 1, "a duplicated trigram contributes >= 2 occurrences")
      assert(flag == (if (5 * nDup > nTri) 1L else 0L))
    }
  }

  test("stl_strength: var_resid <= var_total (dow means are the " +
    "least-squares fit within groups), strength in [0, 1]") {
    val r = SparkEntry.queries("q_stl_strength")(spark, Sf).head()
    val (vt, vr) = (r.getDouble(1), r.getDouble(2))
    assert(vt >= 0 && vr >= 0)
    assert(vr <= vt + 1e-6,
      "group-mean residual variance cannot exceed total variance")
    if (!r.isNullAt(3))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("hash_collision_audit: collisions nonincreasing in width, " +
    "expectation halves 256x per 8 bits, n_keys constant") {
    val rows = SparkEntry.queries("q_hash_collision_audit")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 24L, 32L))
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) >= b.getLong(3),
        "a wider hash cannot collide more")
      // display values are round-4, so compare the ratio loosely and
      // only when the smaller expectation survives the rounding
      if (b.getDouble(4) >= 0.005)
        assert(math.abs(a.getDouble(4) / b.getDouble(4) - 256.0) < 16.0,
          "birthday expectation scales by 2^-8 per 8 bits")
    }
  }
}
