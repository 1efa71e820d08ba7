package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-24 spectral/effect-size queries at
  * sf0.001 — laws the value gate cannot express (eigen bounds, Parseval
  * non-negativity, the Cramér range). */
class Wave24OpsSpec extends AnyFunSuite with SparkFixture {

  test("pca_top1: unit-inf-norm loading, lambda between mean and total " +
    "spectrum mass, one ev_share per query") {
    val rows = SparkEntry.queries("q_pca_top1")(spark, Sf).collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getDouble(1))
    assert(loadings.forall(l => l >= -1.0 && l <= 1.0))
    assert(math.abs(loadings.map(math.abs).max - 1.0) < 1e-8,
      "max-abs normalization pins the top loading to 1")
    val share = rows.map(_.getDouble(3)).distinct
    assert(share.length == 1)
    assert(share.head >= 1.0 / 64 - 1e-6,
      "top eigenvalue is at least the spectrum average")
    assert(share.head <= 1.0 + 1e-6, "lambda cannot exceed trace")
    assert(rows.map(_.getDouble(2)).head > 0)
  }

  test("periodogram: powers nonnegative, dominant period consistent " +
    "with the powers") {
    val rows = SparkEntry.queries("q_periodogram")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (p7, p30, dom) = (r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(p7 >= 0 && p30 >= 0)
      assert(dom == 7L || dom == 30L)
      if (dom == 7L) assert(p7 >= p30 - 1e-3) else assert(p30 >= p7 - 1e-3)
    }
  }

  test("cramers_v: V in [0,1], correction only shrinks, " +
    "levels match the distinct counts") {
    val r = SparkEntry.queries("q_cramers_v")(spark, Sf).head()
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) ==
      docs.select("lang").distinct().count())
    assert(r.getLong(2) ==
      docs.select("source").distinct().count())
    val v = r.getDouble(4)
    assert(r.getDouble(3) >= 0)
    assert(v >= 0 && v <= 1.0 + 1e-6)
    if (!r.isNullAt(5))
      assert(r.getDouble(5) <= v + 1e-6, "bias correction cannot inflate V")
  }
}
