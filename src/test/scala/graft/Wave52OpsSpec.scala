package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-verified planted lattice for the wave-52 transitive reduction. */
class Wave52OpsSpec extends AnyFunSuite with SparkFixture {

  test("latticeReduction on keys 1..12 drops exactly the x6 detour edges") {
    import spark.implicits._
    // edges within range 12:
    //   x2: (1,2) (2,4) (3,6) (4,8) (5,10) (6,12)
    //   x3: (1,3) (2,6) (3,9) (4,12)
    //   x6: (1,6) (2,12)
    // redundant: (1,6) via 1->2->6 (and 1->3->6); (2,12) via 2->4->12
    // (and 2->6->12); every x2/x3 edge has no longer detour in range.
    val got = graft.queries.Wave52
      .latticeReduction((1L to 12L).toDF("k"), rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> (6L, 0L), 3L -> (4L, 0L), 6L -> (2L, 2L)), got)
    spark.catalog.clearCache()
  }
}
