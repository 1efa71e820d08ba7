package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-11 additions (TOST equivalence, KL
  * domain drift, jackknife ratio variance) at sf0.001 — algebraic laws
  * the DuckDB value gate cannot express (one-sided ordering, Gibbs'
  * inequality, non-negative variance) which must hold at ANY scale or
  * partitioning. */
class Wave11OpsSpec extends AnyFunSuite with SparkFixture {

  test("tost: z_low > z_high always (they differ by 2δ/se > 0), arms " +
    "partition the purchases, verdict consistent with the z pair") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_tost")(spark, Sf).collect().head
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    val total = spark.read.parquet(s"$Sf/events.parquet")
      .where(col("event_type") === "purchase").count()
    assert(n0 + n1 == total)
    val (zl, zh) = (r.getDouble(4), r.getDouble(5))
    assert(zl > zh, "z_low - z_high = 2*delta/se must be positive")
    val equivalent = zl >= 1.645 && zh <= -1.645
    assert(r.getString(6) == (if (equivalent) "equivalent"
                              else "not_equivalent"))
  }

  test("kl_drift: KL >= 0 for every source (Gibbs), sources partition " +
    "the corpus, output ordered by drift") {
    val rows = SparkEntry.queries("q_kl_drift")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    var prev = Double.MaxValue
    for (r <- rows) {
      val kl = r.getDouble(2)
      // smoothing keeps the comparison distribution strictly positive,
      // so Gibbs' inequality holds up to the round-8 term grain
      assert(kl >= -1e-6, s"KL(${r.getString(0)}) = $kl < 0")
      assert(kl <= prev + 1e-9, "output must be ordered by drift desc")
      prev = kl
    }
  }

  test("jackknife: se >= 0 and the leave-one-out ratios bracket the " +
    "full-sample ratio") {
    val r = SparkEntry.queries("q_jackknife")(spark, Sf).collect().head
    val (b, ratio, se) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(b >= 2 && b <= 20)
    assert(ratio > 0.0)
    assert(se >= 0.0 && !se.isNaN,
      "jackknife variance is a sum of squares - never negative")
    // loose sanity: the delete-one se of a stable ratio is far below
    // the ratio itself on this corpus
    assert(se < ratio, s"se=$se ratio=$ratio")
  }
}
