package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-30 measurement-loop queries at
  * sf0.001. */
class Wave30OpsSpec extends AnyFunSuite with SparkFixture {

  test("bloom_fpp_measured: bitset bounded by k·members, fill in (0,1), " +
    "prediction is fill^k, members+probes = users") {
    val r = SparkEntry.queries("q_bloom_fpp_measured")(spark, Sf).head()
    val (m, k, nm, nb, np) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(5))
    assert(m == 131072L && k == 7L)
    assert(nb <= k * nm && nb <= m)
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(nm + np == users)
    val fill = r.getDouble(4)
    assert(fill > 0 && fill < 1)
    assert(math.abs(r.getDouble(8) - math.pow(nb.toDouble / m, 7)) < 1e-5,
      "prediction is the fill ratio to the k-th power")
    if (!r.isNullAt(7)) {
      val fpp = r.getDouble(7)
      assert(fpp >= 0 && fpp <= 1)
    }
  }

  test("seasonal_decompose: c = trend + seasonal + resid on complete " +
    "windows, trend null exactly on incomplete/gapped windows") {
    val rows = SparkEntry.queries("q_seasonal_decompose")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    var complete = 0
    for (r <- rows if !r.isNullAt(2)) {
      complete += 1
      val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(recon - r.getLong(1)) < 2e-6,
        s"day ${r.getLong(0)}: decomposition must reconstruct the count")
    }
    assert(complete > 0, "at least one complete 7-day window expected")
    // boundary days (first/last 3) can never have a complete window
    assert(rows.take(3).forall(_.isNullAt(2)))
    assert(rows.takeRight(3).forall(_.isNullAt(2)))
  }

  test("cache_coverage: hit ratio nondecreasing in cache size, " +
    "bounded by 1, hits bounded by accesses") {
    val rows = SparkEntry.queries("q_cache_coverage")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 100L, 1000L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3), "a bigger cache hits more")
    }
    for (r <- rows) {
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0)
      if (r.getLong(0) >= r.getLong(1))
        assert(r.getLong(3) == r.getLong(2),
          "a cache holding every key absorbs every access")
    }
  }
}
