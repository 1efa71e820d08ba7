package graft

import graft.queries.Wave32
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-32 queries at sf0.001. */
class Wave32OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_weak_supervision: majority vote beats every single LF's accuracy floor") {
    val rows = Wave32.queries("q_weak_supervision")(spark, Sf).collect()
    assert(rows.length == 4)
    val byLf = rows.map(r => r.getAs[String]("lf") -> r).toMap
    assert(byLf.keySet == Set("lf0", "lf1", "lf2", "mv"))
    for (j <- 0 to 2) {
      val r = byLf(s"lf$j")
      val cov = r.getAs[Double]("coverage")
      val acc = r.getAs[Double]("accuracy")
      // abstention rate is (3+j)/10 by construction
      assert(math.abs(cov - (1.0 - (3 + j) / 10.0)) < 0.05,
        s"lf$j coverage=$cov")
      // accuracy over VOTES: flips at (10+5j)% of all hashes, so ≥ ~75%
      assert(acc > 0.7 && acc <= 1.0, s"lf$j accuracy=$acc")
      assert(r.getAs[Double]("conflict") <= r.getAs[Double]("overlap"),
        s"lf$j conflict>overlap")
    }
    val mv = byLf("mv")
    assert(mv.isNullAt(mv.fieldIndex("overlap")))
    assert(mv.getAs[Double]("accuracy") > 0.75)
  }

  test("q_woe_binning: bins partition rows, IV consistent and non-negative") {
    val rows = Wave32.queries("q_woe_binning")(spark, Sf).collect()
    assert(rows.length == 4)
    val n = rows.map(_.getAs[Long]("n")).sum
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .where("value IS NOT NULL").count()
    assert(n == ev, s"bins hold $n of $ev rows")
    // equal-frequency: bins differ by at most ... n/4 ± 1
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1, s"sizes=${sizes.toSeq}")
    val iv = rows.head.getAs[Double]("iv")
    assert(rows.forall(_.getAs[Double]("iv") == iv))
    assert(iv >= 0.0, s"IV=$iv (each term (g%-b%)*ln(g%/b%) is >= 0)")
  }
}
