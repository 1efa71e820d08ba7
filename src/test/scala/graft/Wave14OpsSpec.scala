package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-14 additions (IPF raking, W₁ drift,
  * log-domain BH-FDR, SRM audit) at sf0.001 — algebraic laws the
  * DuckDB value gate cannot express (fitted margins hit their
  * targets, W₁ dominates nothing/bounded by the range, BH step-up
  * monotonicity, χ² additivity of the pooled row) which must hold at
  * ANY scale or partitioning. */
class Wave14OpsSpec extends AnyFunSuite with SparkFixture {

  test("ipf_raking: fitted joint hits the uniform lang margin and the " +
    "50/50 parity margin; weights reconstruct the fit from the counts") {
    val rows = SparkEntry.queries("q_ipf_raking")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val langs = rows.map(_.getString(0)).distinct
    val rowM = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getDouble(3)).sum }
    val colM = rows.groupBy(_.getLong(1))
      .map { case (_, rs) => rs.map(_.getDouble(3)).sum }
    for (m <- rowM)
      assert(math.abs(m - 1.0 / langs.length) < 1e-4,
        s"lang margin $m != ${1.0 / langs.length}")
    for (m <- colM) assert(math.abs(m - 0.5) < 1e-4, s"parity margin $m")
    val n = rows.map(_.getLong(2)).sum
    for (r <- rows)
      assert(math.abs(
        r.getDouble(4) - r.getDouble(3) * n / r.getLong(2)) < 1e-2,
        s"w != p_fit·N/n for ${r.getString(0)}/${r.getLong(1)}")
  }

  test("wasserstein1: W1 bounded by the mean-difference lower bound " +
    "and the bucket-range upper bound") {
    val r = SparkEntry.queries("q_wasserstein1")(spark, Sf).collect().head
    val (n0, n1, nb, w1) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n0 > 0 && n1 > 0 && nb > 0)
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$Sf/events.parquet")
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("CAST(floor(value) AS BIGINT)").as("b"))
    val m = e.groupBy("event_type").agg(avg("b")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    val range = e.agg(max("b") - min("b")).collect().head.getLong(0)
    // W1(F0,F1) >= |E0 - E1| (Jensen) and <= the support range
    assert(w1 >= math.abs(m("purchase") - m("click")) - 1e-3,
      s"w1 $w1 below mean-gap lower bound")
    assert(w1 <= range + 1e-9, s"w1 $w1 exceeds bucket range $range")
  }

  test("bh_fdr: ranks are a permutation, lnp non-decreasing in rank, " +
    "thresholds increasing, rejections are exactly ranks <= k_star") {
    val rows = SparkEntry.queries("q_bh_fdr")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ks = rows.head.getLong(7)
    assert(rows.forall(_.getLong(7) == ks), "k_star is a scalar")
    val byRank = rows.sortBy(_.getLong(4))
    assert(byRank.map(_.getLong(4)).toSeq == (1L to rows.length).toSeq)
    for (Seq(a, b) <- byRank.toSeq.sliding(2)) {
      assert(a.getDouble(3) <= b.getDouble(3) + 1e-12, "lnp sorted")
      assert(a.getDouble(5) < b.getDouble(5), "thr strictly increasing")
    }
    for (r <- byRank)
      assert((r.getLong(6) == 1L) == (r.getLong(4) <= ks),
        s"rejected flag inconsistent at rank ${r.getLong(4)}")
    // step-up property: every rank <= k_star is rejected even if its own
    // lnp > thr (that is the POINT of BH) — verified by the flag identity
    // above; and k_star itself must pass
    if (ks > 0) {
      val at = byRank(ks.toInt - 1)
      assert(at.getDouble(3) <= at.getDouble(5), "k_star row passes")
    }
  }

  test("srm_check: daily counts partition the event table, chi2 " +
    "recomputable, pooled chi2 consistent with summed arms") {
    val rows = SparkEntry.queries("q_srm_check")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    for (r <- rows) {
      val (o0, o1) = (r.getLong(1), r.getLong(2))
      val chi = (o0 - o1).toDouble * (o0 - o1) / (o0 + o1)
      assert(math.abs(r.getDouble(3) - chi) < 1e-5)
      assert((r.getLong(4) == 1L) == (r.getDouble(3) > 3.841))
    }
    val (t0, t1) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val pooled = (t0 - t1).toDouble * (t0 - t1) / (t0 + t1)
    assert(math.abs(rows.head.getDouble(5) - pooled) < 1e-5)
  }
}
