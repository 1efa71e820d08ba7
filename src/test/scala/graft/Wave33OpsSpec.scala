package graft

import graft.queries.Wave33
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-33 queries at sf0.001. */
class Wave33OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_matching: disjoint vertices, rounds within the bound") {
    val rows = Wave33.queries("q_matching")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val mv = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(mv.distinct.length == mv.length)
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("q_fd_audit: the PK dependency holds, the known-violating ones do not") {
    val rows = Wave33.queries("q_fd_audit")(spark, Sf).collect()
    assert(rows.length == 4)
    val byFd = rows.map(r => (r.getAs[String]("lhs"), r)).toMap
    assert(byFd("o_orderkey").getAs[Long]("holds") == 1L,
      "o_orderkey is a primary key")
    assert(byFd("o_orderkey").getAs[Long]("max_ndv") == 1L)
    for (lhs <- Seq("o_custkey", "c_nationkey", "l_partkey")) {
      val r = byFd(lhs)
      assert(r.getAs[Long]("holds") == 0L, s"$lhs FD should fail")
      assert(r.getAs[Long]("n_violating") >= 1)
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("max_ndv") > 1)
    }
  }
}
