package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Property checks of the sketch primitives on randomized data — the
  * distributed-merge guarantees the single-corpus oracle can't exercise. */
class SketchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val M = 64

  test("HLL merge law: registers(A ∪ B) = elementwise max of the halves") {
    val rnd = new scala.util.Random(3)
    val a = Seq.fill(400)(rnd.nextInt(10000).toLong)
    val b = Seq.fill(400)(rnd.nextInt(10000).toLong)
    def regs(xs: Seq[Long]) =
      Sketches.hllRegisters(xs.toDF("k"), "k", M)
    val merged = Sketches.hllMerge(regs(a), regs(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val whole = regs(a ++ b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == whole)
  }

  test("HLL estimate tracks cardinality within ~3 standard errors") {
    // standard error for m=64 is 1.04/sqrt(64) = 13%
    for (n <- Seq(200L, 2000L, 20000L)) {
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(spark.range(n).select($"id".as("k")), "k", M),
        M, 0.709).head().getDouble(0)
      assert(math.abs(est - n) / n < 0.39, s"n=$n est=$est")
    }
  }

  test("CMS never underestimates, and is exact without collisions") {
    val rnd = new scala.util.Random(9)
    val keys = Seq.fill(3000)(s"k${rnd.nextInt(40)}")
    val got = Sketches.cmsEstimates(keys.toDF("k"), "k", depth = 4, width = 64)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.nonEmpty)
    got.foreach { case (k, (nTrue, nEst)) =>
      assert(nTrue == truth(k), s"$k true-count mismatch")
      assert(nEst >= nTrue, s"$k underestimated: $nEst < $nTrue")
    }
    // wide sketch → no collisions → exact everywhere
    val exact = Sketches.cmsEstimates(keys.toDF("k"), "k", depth = 4, width = 4096)
      .collect()
    exact.foreach(r => assert(r.getLong(2) == r.getLong(1)))
  }

  test("grouped CMS sketches are independent per group") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(2000)((s"g${rnd.nextInt(3)}", s"k${rnd.nextInt(30)}"))
    val grouped = Sketches
      .cmsEstimates(rows.toDF("g", "k"), "k", 4, 32, Seq("g"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // a group's sketch must equal the ungrouped sketch built from ONLY
    // that group's rows — other groups' mass can't leak into its cells
    for (g <- Seq("g0", "g1", "g2")) {
      val alone = Sketches
        .cmsEstimates(rows.filter(_._1 == g).map(_._2).toDF("k"), "k", 4, 32)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      alone.foreach { case (k, v) => assert(grouped((g, k)) == v, s"$g/$k") }
    }
  }
}
