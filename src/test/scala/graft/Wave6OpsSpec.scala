package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-6 additions (FIFO allocation, CUPED,
  * KS, budget selection, Simpson, readability) at sf0.001 — algebraic
  * laws the DuckDB value gate cannot express (conservation, bounds,
  * Σquota = B) and which must hold at ANY scale or partitioning. */
class Wave6OpsSpec extends AnyFunSuite with SparkFixture {

  test("fifo_alloc conserves quantity: filled + unfilled = total demand, " +
    "filled ≤ supply") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_fifo_alloc")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // INDEPENDENT per-part demand, straight off lineitem — the invariant
    // is checked against a quantity the query under test never computed
    val demand = spark.read.parquet(s"$Sf/lineitem.parquet")
      .where(col("l_partkey") % 10 === 0)
      .groupBy(col("l_partkey").cast("long").as("pk"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))
        .cast("double").as("td"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- rows) {
      val pk = r.getLong(0)
      val (filled, unfilled) = (r.getDouble(2), r.getDouble(4))
      assert(filled >= 0 && unfilled >= 0,
        s"negative allocation for pk=$pk")
      // supply per part is Σ lots = 3 lots of 5..34 units → ≤ 102
      assert(filled <= 102.0 + 1e-9, s"filled exceeds max supply: $filled")
      assert(math.abs(filled + unfilled - demand(pk)) < 1e-6,
        s"pk=$pk: filled=$filled + unfilled=$unfilled != demand=${demand(pk)}")
    }
    // every demanded part with a positive allocation appears exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("token_budget quotas sum exactly to the budget") {
    val rows = SparkEntry.queries("q_token_budget")(spark, Sf).collect()
    assert(rows.map(_.getLong(2)).sum == 1000000L)
    // quota within 1 unit of the exact proportional share
    val ctot = rows.map(_.getLong(1)).sum
    for (r <- rows) {
      val base = 1000000L * r.getLong(1) / ctot
      assert(r.getLong(2) == base || r.getLong(2) == base + 1)
    }
  }

  test("ks_test D is in [0, 1] and gap_scaled = D·n0·n1 pre-rounding") {
    val r = SparkEntry.queries("q_ks_test")(spark, Sf).collect().head
    val (gap, n0, n1) = (r.getLong(1), r.getLong(3), r.getLong(4))
    val d = r.getDouble(2)
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - gap.toDouble / (n0 * n1)) <= 5e-7)
  }

  test("budget_select stays under budget and takes a contiguous top band") {
    val r = SparkEntry.queries("q_budget_select")(spark, Sf).collect().head
    val (cost, left) = (r.getLong(2), r.getLong(4))
    assert(cost + left == 50000L && cost >= 0 && left >= 0)
  }

  test("simpson pooled row equals the sum of the segment rows") {
    val rows = SparkEntry.queries("q_simpson")(spark, Sf).collect()
    val (all, segs) = rows.partition(_.getString(0) == "__all__")
    assert(all.length == 1)
    for (i <- 1 to 4) // n0, c0, n1, c1
      assert(all.head.getLong(i) == segs.map(_.getLong(i)).sum)
  }

  test("readability totals are consistent (syllables ≤ word chars, " +
    "n_docs > 0)") {
    val rows = SparkEntry.queries("q_readability")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) > 0)
      // every word has ≥1 vowel run only if it has a vowel; totals must
      // at least be non-negative and bounded by total characters
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2) * 20)
    }
  }
}
