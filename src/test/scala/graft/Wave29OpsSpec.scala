package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-29 privacy/LRD/geometry queries at
  * sf0.001. */
class Wave29OpsSpec extends AnyFunSuite with SparkFixture {

  test("uniqueness_ladder: monotone in the level, min_k = 1 iff " +
    "uniques exist, rows conserved") {
    val rows = SparkEntry.queries("q_uniqueness_ladder")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1),
        "more quasi-identifiers cannot merge combos")
      assert(a.getLong(2) <= b.getLong(2),
        "a customer unique at level L stays unique at L+1")
      assert(a.getLong(3) >= b.getLong(3), "min_k can only shrink")
    }
    for (r <- rows)
      assert((r.getLong(3) == 1L) == (r.getLong(2) > 0L))
  }

  test("hurst: one exponent, plausibly in (0, 1), mean R/S grows " +
    "with the block width") {
    val rows = SparkEntry.queries("q_hurst")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    assert(!rows.head.isNullAt(3), "at least 2 widths must fit")
    val h = rows.map(_.getDouble(3)).distinct
    assert(h.length == 1)
    assert(h.head > 0 && h.head < 1.2, s"implausible Hurst ${h.head}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) > a.getDouble(2),
        "R/S must grow with block size for a positive-H series")
    case _ => ()
    }
    for (r <- rows) assert(r.getDouble(2) > 0)
  }

  test("embedding_norms: percentiles ordered, mean within [p10, p90] " +
    "bracket, zero count consistent, center ratio in (0, 1]") {
    val r = SparkEntry.queries("q_embedding_norms")(spark, Sf).head()
    val (p10, p50, p90) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(p10 <= p50 && p50 <= p90)
    assert(r.getDouble(5) >= p10 - 1e-9 && r.getDouble(5) <= p90 + 1e-9,
      "mean norm inside the p10..p90 bracket for this distribution")
    val zeros = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("aggregate(transform(embedding," +
        " x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))," +
        " CAST(0 AS BIGINT), (a, x) -> a + x*x) AS nq")
      .where("nq = 0").count()
    assert(r.getLong(1) == zeros)
    assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1.0 + 1e-9,
      "the mean vector cannot be longer than the mean norm (Jensen)")
  }
}
