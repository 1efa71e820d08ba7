package graft

import graft.queries.Wave35
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-35 LSH banding planner at sf0.001. */
class Wave35OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_lsh_planner: pair conservation and banding monotonicity") {
    val rows = Wave35.queries("q_lsh_planner")(spark, Sf).collect()
    assert(rows.length == 3)
    val byB = rows.map(r => r.getLong(0) -> r).toMap
    assert(byB.keySet == Set(2L, 4L, 8L))
    for (r <- rows) {
      val (b, nb, ns, noc) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      val nDocs = spark.read.parquet(s"$Sf/documents.parquet")
        .select("text").distinct().count()
      // every doc lands in exactly b buckets → bucket-size mass = b·reps
      assert(nb >= 1 && ns <= nb && noc <= nb)
      assert(nb <= b * nDocs, "at most one bucket per (band, doc)")
      assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
    }
    // fewer rows per band ⇒ looser buckets ⇒ at least as many candidates:
    // total potential pairs (cand + dropped) grows as r shrinks
    def pot(b: Long) = byB(b).getLong(5) + byB(b).getLong(6)
    assert(pot(8) >= pot(4) - 0, "r=2 must be loosest")
    assert(pot(4) >= pot(2), "r=4 looser than r=8")
  }
}
