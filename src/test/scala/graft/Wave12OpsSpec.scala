package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-12 additions (Markov stationary
  * distribution + entropy rate, truncated absorbing-chain steps,
  * association-rule lift) at sf0.001 — algebraic laws the DuckDB value
  * gate cannot express (distribution normalization, entropy bounds,
  * horizon monotonicity, rule symmetry of support) which must hold at
  * ANY scale or partitioning. */
class Wave12OpsSpec extends AnyFunSuite with SparkFixture {

  test("markov_stationary: pi is a distribution, entropy rate within " +
    "[0, ln k], h_row bounded by ln k") {
    val rows = SparkEntry.queries("q_markov_stationary")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val pis = rows.map(_.getDouble(1))
    assert(pis.forall(p => p >= -1e-9 && p <= 1.0 + 1e-9))
    assert(math.abs(pis.sum - 1.0) < 1e-4, s"sum(pi)=${pis.sum}")
    val lnK = math.log(k.toDouble)
    for (r <- rows) {
      assert(r.getDouble(2) >= -1e-9 && r.getDouble(2) <= lnK + 1e-6,
        s"row entropy ${r.getDouble(2)} outside [0, ln $k]")
    }
    val hrate = rows.head.getDouble(3)
    assert(hrate >= -1e-9 && hrate <= lnK + 1e-6)
    assert(rows.forall(_.getDouble(3) == hrate), "hrate is a chain scalar")
  }

  test("absorb_steps: every truncated expectation is within " +
    "[1, horizon + 1] and decreasing horizons nest") {
    val rows = SparkEntry.queries("q_absorb_steps")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val e = r.getDouble(1)
      // e_T telescopes 1 + Q(1 + Q(...)): bounded by the horizon
      assert(e >= 1.0 - 1e-9 && e <= 7.0 + 1e-6,
        s"exp_steps $e outside [1, T+1] for ${r.getString(0)}")
    }
  }

  test("lift_rules: confidence in (0, 1], support symmetric " +
    "(sab(a,b) = sab(b,a)), lift consistent with its definition") {
    val rows = SparkEntry.queries("q_lift_rules")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val sab = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- rows) {
      val (a, b, s, sa, sb) = (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val (conf, lift) = (r.getDouble(5), r.getDouble(6))
      assert(s >= 1 && s <= math.min(sa, sb))
      assert(conf > 0.0 && conf <= 1.0 + 1e-9)
      // the mirrored rule (if it made the top-20) must agree on support
      sab.get((b, a)).foreach(m => assert(m == s, s"sab($a,$b) != sab($b,$a)"))
      assert(math.abs(lift * sa * sb - s.toDouble * rowsUsers) <
        1e-2 * sa * sb, "lift = sab*N/(sa*sb) up to the display grain")
    }
  }

  private lazy val rowsUsers: Long =
    spark.read.parquet(s"$Sf/events.parquet")
      .select(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")))
      .collect().head.getLong(0)
}
