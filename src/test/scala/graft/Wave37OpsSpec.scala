package graft

import graft.queries.Wave37
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-37 queries at sf0.001. */
class Wave37OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_blocking_quality: coverage and reduction are well-formed") {
    val rows = Wave37.queries("q_blocking_quality")(spark, Sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("scheme")).toSet ==
      Set("prefix2", "length", "sorted_neighborhood"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_truth"), r)
      assert(r.getAs[Double]("completeness") >= 0.0
        && r.getAs[Double]("completeness") <= 1.0, r)
      assert(r.getAs[Double]("reduction") >= 0.0
        && r.getAs[Double]("reduction") <= 1.0, r)
      // covered truth pairs are a SUBSET of each scheme's candidates
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_covered"), r)
    }
    spark.catalog.clearCache()
  }

  test("q_single_linkage: clusters have >= 2 members and distinct labels") {
    val rows = Wave37.queries("q_single_linkage")(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_members") >= 2L))
    val labels = rows.map(_.getAs[Long]("cluster"))
    assert(labels.distinct.length == labels.length)
    spark.catalog.clearCache()
  }

  test("q_nn_descent: one round never worsens the neighbor (cos1 >= cos0)") {
    val rows = Wave37.queries("q_nn_descent")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c0 = r.getAs[Double]("cos0"); val c1 = r.getAs[Double]("cos1")
      // nn0's own edge is in the candidate set, so the rescored top-1
      // can only match or beat it
      assert(c1 >= c0, r)
      assert((r.getAs[Long]("improved") == 1L) == (c1 > c0), r)
    }
    spark.catalog.clearCache()
  }
}
