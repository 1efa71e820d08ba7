package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-15 additions (Cohen's kappa,
  * Cochran-Armitage trend, McNemar, Neyman allocation) at sf0.001 —
  * algebraic laws the DuckDB value gate cannot express (kappa
  * identity, z²/z consistency, cell partitions, quota rounding
  * bounds) which must hold at ANY scale or partitioning. */
class Wave15OpsSpec extends AnyFunSuite with SparkFixture {

  test("cohens_kappa: cells partition the tokenized docs, kappa " +
    "reconstructs from po/pe, kappa <= 1") {
    val rows = SparkEntry.queries("q_cohens_kappa")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val (po, pe, kappa) =
      (rows.head.getDouble(3), rows.head.getDouble(4), rows.head.getDouble(5))
    assert(rows.forall(r => r.getDouble(3) == po && r.getDouble(5) == kappa))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(kappa <= 1.0 + 1e-9)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-4)
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val n = rows.map(_.getLong(2)).sum
    assert(math.abs(po - diag.toDouble / n) < 1e-6)
  }

  test("cochran_armitage: doses partition the user base, z*z = z2, " +
    "t_stat sign matches z") {
    val rows = SparkEntry.queries("q_cochran_armitage")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    val (t, z2, z) =
      (rows.head.getDouble(4), rows.head.getDouble(5), rows.head.getDouble(6))
    assert(rows.forall(r => r.getDouble(5) == z2 && r.getDouble(6) == z))
    assert(math.abs(z * z - z2) < 1e-4, s"z²=${z * z} vs z2=$z2")
    if (z != 0) assert((t < 0) == (z < 0), "t_stat and z disagree on sign")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "x <= n per dose")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }

  test("mcnemar: 2x2 partitions the corpus, chi2_cc recomputable, " +
    "flag consistent") {
    val r = SparkEntry.queries("q_mcnemar")(spark, Sf).collect().head
    val (a, b, c, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(a + b + c + d == total)
    val chi = if (b + c > 0)
      (math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) / (b + c)
    else 0.0
    assert(math.abs(r.getDouble(4) - chi) < 1e-5)
    assert((r.getLong(5) == 1L) == (chi > 3.841))
  }

  test("neyman_alloc: quotas sum exactly to the budget and sit within " +
    "1 of the real-valued Neyman share") {
    val rows = SparkEntry.queries("q_neyman_alloc")(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sum == 10000L, "exact budget exhaustion")
    val w = rows.map(r => r.getLong(1) * r.getDouble(2))
    val wt = w.sum
    for ((r, wi) <- rows.zip(w)) {
      val ideal = 10000.0 * wi / wt
      assert(math.abs(r.getLong(3) - ideal) <= 1.0 + 1e-6,
        s"${r.getString(0)}: alloc ${r.getLong(3)} vs ideal $ideal")
      assert(r.getDouble(2) >= 0, "sigma non-negative")
    }
  }
}
