package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-13 additions (log-rank, Mantel-
  * Haenszel, capture-recapture, Good-Turing, α-sampling) at sf0.001 —
  * algebraic laws the DuckDB value gate cannot express (convexity of
  * the pooled OR, estimator ordering, distribution normalization,
  * boost monotonicity) which must hold at ANY scale or partitioning.
  */
class Wave13OpsSpec extends AnyFunSuite with SparkFixture {

  test("logrank: arm sizes partition the user base, observed deaths " +
    "bounded by arm-1 size, variance positive, z finite") {
    val r = SparkEntry.queries("q_logrank")(spark, Sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (n0, n1, o1) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (e1, v, z) = (row.getDouble(3), row.getDouble(4), row.getDouble(5))
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(n0 + n1 == users, s"arms $n0+$n1 != $users users")
    assert(o1 >= 0 && o1 <= n1, "O1 bounded by arm-1 size")
    assert(e1 > 0 && e1 <= n0 + n1)
    assert(v > 0, s"hypergeometric variance $v must be positive")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("mh_or: cells partition each stratum, pooled OR is a convex " +
    "combination of defined stratum ORs") {
    val rows = SparkEntry.queries("q_mh_or")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val perLang = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orMh = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == orMh), "or_mh is a scalar")
    val strata = rows.flatMap(r =>
      if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    for (r <- rows) {
      val cells = (1 to 4).map(r.getLong).sum
      assert(cells == perLang(r.getString(0)),
        s"${r.getString(0)}: 2x2 cells $cells != ${perLang(r.getString(0))}")
    }
    if (strata.nonEmpty && rows.forall(!_.isNullAt(5))) {
      // MH OR = Σ w_i·OR_i / Σ w_i with w_i = b·c/n ⇒ convexity
      assert(orMh >= strata.min - 1e-4 && orMh <= strata.max + 1e-4,
        s"or_mh $orMh outside [${strata.min}, ${strata.max}]")
    }
  }

  test("capture_recapture: overlap bounded, truth covers both samples, " +
    "Chapman consistent with its closed form") {
    val r = SparkEntry.queries("q_capture_recapture")(spark, Sf)
      .collect().head
    val (n1, n2, m, nt) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (chapman, lincoln) = (r.getDouble(4), r.getDouble(5))
    assert(m <= math.min(n1, n2))
    assert(nt >= math.max(n1, n2), "true population covers each sample")
    assert(math.abs(
      chapman - ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)) < 1e-3)
    if (m > 0)
      assert(math.abs(lincoln - n1.toDouble * n2 / m) < 1e-3)
    // Chapman never exceeds Lincoln-Petersen (bias correction shrinks)
    if (m > 0) assert(chapman <= lincoln + 1e-9)
  }

  test("good_turing: p0 in (0,1], r_star recomputable from the " +
    "returned frequency-of-frequencies rows") {
    val rows = SparkEntry.queries("q_good_turing")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val p0 = rows.head.getDouble(3)
    assert(p0 > 0 && p0 <= 1.0)
    assert(rows.forall(_.getDouble(3) == p0), "p0 is a corpus scalar")
    val nr = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows; rr = r.getLong(0) if nr.contains(rr + 1)) {
      val expected = (rr + 1).toDouble * nr(rr + 1) / nr(rr)
      assert(math.abs(r.getDouble(2) - expected) < 1e-4,
        s"r=$rr: r_star ${r.getDouble(2)} != $expected")
    }
  }

  test("alpha_sampling: shares and alpha-weights are distributions, " +
    "boost strictly decreasing in corpus size") {
    val rows = SparkEntry.queries("q_alpha_sampling")(spark, Sf).collect()
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    // p ∝ √n ⇒ boost = p/share ∝ 1/√n: smaller langs up-sample more
    val byN = rows.sortBy(_.getLong(1))
    for (Seq(a, b) <- byN.toSeq.sliding(2) if a.getLong(1) < b.getLong(1))
      assert(a.getDouble(4) > b.getDouble(4),
        s"boost not decreasing: ${a.getString(0)} vs ${b.getString(0)}")
  }
}
