package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-25 dedup-evidence/PR/variance queries
  * at sf0.001 — including full brute-force recomputations of AP and the
  * Brown–Forsythe W from collected rows (tractable at this sf). */
class Wave25OpsSpec extends AnyFunSuite with SparkFixture {

  private def events = spark.read.parquet(s"$Sf/events.parquet")
    .selectExpr("event_type", "event_id",
      "CAST(floor(value*100 + 0.5) AS BIGINT) AS v").collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("dedup_longest_run: run positive iff jac positive, span is the " +
    "exact affine image of the run") {
    val rows = SparkEntry.queries("q_dedup_longest_run")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (jac, run, span) = (r.getDouble(2), r.getLong(3), r.getLong(4))
      assert((run > 0) == (jac > 0),
        "a shared shingle is exactly a matched position")
      if (run > 0) assert(span == (run - 1) * 3 + 8) else assert(span == 0)
    }
  }

  test("pr_auc matches a brute-force average precision") {
    val r = SparkEntry.queries("q_pr_auc")(spark, Sf).head()
    val scored = events
      .map { case (t, id, v) => (v, id, if (t == "purchase") 1 else 0) }
      .sortBy { case (v, id, _) => (-v, id) }
    val npos = scored.map(_._3).sum
    var cum = 0
    val terms = scored.zipWithIndex.collect { case ((_, _, 1), i) =>
      cum += 1; cum.toDouble / (i + 1)
    }
    assert(r.getLong(0) == scored.length && r.getLong(1) == npos)
    assert(math.abs(r.getDouble(2) - terms.sum / npos) < 1e-5)
  }

  test("levene matches a brute-force Brown-Forsythe W") {
    val r = SparkEntry.queries("q_levene")(spark, Sf).head()
    val groups = events.groupBy(_._1).values.map { g =>
      val vs = g.map(_._3).sorted
      val med = vs((vs.length - 1) / 2) // lower median, rk = (n+1) DIV 2
      g.map(e => math.abs(e._3 - med).toDouble)
    }.toSeq
    val k = groups.length
    val n = groups.map(_.length).sum
    val zbar = groups.flatten.sum / n
    val num = groups.map(g => g.length * math.pow(g.sum / g.length - zbar, 2)).sum
    val den = groups.map(g => { val m = g.sum / g.length; g.map(z => (z - m) * (z - m)).sum }).sum
    val w = (n - k).toDouble / (k - 1) * num / den
    assert(r.getLong(0) == n && r.getLong(1) == k)
    assert(math.abs(r.getDouble(2) - w) < 1e-3)
  }
}
