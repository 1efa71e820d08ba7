package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-10 additions (Wilcoxon signed-rank,
  * Friedman blocked ranks, DP exponential-mechanism median, SemDeDup)
  * at sf0.001 — algebraic laws the DuckDB value gate cannot express
  * (rank-sum bounds, χ² range, mechanism noise bounds, keep-first
  * survival) which must hold at ANY scale or partitioning. */
class Wave10OpsSpec extends AnyFunSuite with SparkFixture {

  test("wilcoxon: W+ bounded by the total rank sum, n bounded by days") {
    val r = SparkEntry.queries("q_wilcoxon")(spark, Sf).collect().head
    val (n, wplus) = (r.getLong(0), r.getLong(1))
    assert(n > 0 && wplus >= 0 && wplus <= n * (n + 1) / 2)
    val nDays = graft.queries.table(spark, Sf, "events")
      .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
      .distinct().count()
    assert(n <= nDays)
    assert(!r.isNullAt(2) && !r.getDouble(2).isNaN)
  }

  test("friedman: chi2 within its algebraic range [0, n(k-1)]") {
    val r = SparkEntry.queries("q_friedman")(spark, Sf).collect().head
    val (k, n, chi2) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(k >= 2 && n > 0)
    assert(chi2 >= -1e-9, s"chi2=$chi2")
    assert(chi2 <= n * (k - 1) + 1e-6,
      s"chi2=$chi2 exceeds the identical-rankings maximum ${n * (k - 1)}")
  }

  test("dp_quantile: exactly one release, monotone cumulative counts, " +
    "utility non-positive, Gumbel noise within the PRF grid bounds") {
    val rows = SparkEntry.queries("q_dp_quantile")(spark, Sf).collect()
    assert(rows.length == 20)
    assert(rows.count(_.getBoolean(5)) == 1, "exactly one chosen bucket")
    var prevCum = 0L
    for (r <- rows) {
      val (nb, cum, u, score) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(cum == prevCum + nb, "cumulative must accumulate exactly")
      prevCum = cum
      assert(u <= 0)
      // g = −ln(−ln(u)) with u on the (2j+1)/2·10⁶ grid: g ∈ [−2.7, 14.6]
      val g = score - 0.125 * u
      assert(g >= -3.0 && g <= 15.0, s"gumbel part $g out of grid bounds")
    }
    val total = graft.queries.table(spark, Sf, "events")
      .select(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")))
      .collect().head.getLong(0)
    assert(rows.last.getLong(2) == total, "last cum = all users")
  }

  test("semdedup: keep-first survival (the smallest id per cluster " +
    "never drops), kept <= total, totals cover all nonzero vectors") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_semdedup")(spark, Sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    for (r <- rows) {
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept >= 1 && kept <= n,
        "the smallest id in a cluster has no smaller neighbor - it survives")
      assert(!r.isNullAt(3) && r.getLong(3) <= r.getLong(4))
      total += n
    }
    // q is integer-quantized (the house ×1000 fixed-point spelling), so
    // the nonzero-norm count is engine-independent
    val nonzero = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("aggregate(transform(embedding," +
        " x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))," +
        " CAST(0 AS BIGINT), (acc, x) -> acc + x*x) AS nq")
      .where(col("nq") > 0).count()
    assert(total == nonzero, s"cluster sizes must partition the $nonzero " +
      "nonzero-norm vectors")
  }
}
