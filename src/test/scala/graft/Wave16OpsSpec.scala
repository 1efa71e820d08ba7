package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-16 additions (Cliff's delta, Wilson
  * ranking, diff-in-diff, forecast skill) at sf0.001 — algebraic laws
  * the DuckDB value gate cannot express (probability partition of the
  * pair space, Wilson bound dominated by the rate, DiD identity,
  * MAE positivity) which must hold at ANY scale or partitioning. */
class Wave16OpsSpec extends AnyFunSuite with SparkFixture {

  test("cliffs_delta: p_gt + p_lt + p_tie = 1, delta = p_gt - p_lt, " +
    "delta in [-1, 1]") {
    val r = SparkEntry.queries("q_cliffs_delta")(spark, Sf).collect().head
    val (pgt, plt, ptie, delta) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(pgt + plt + ptie - 1.0) < 1e-4,
      s"pair-space partition: $pgt + $plt + $ptie")
    assert(math.abs(delta - (pgt - plt)) < 1e-5)
    assert(delta >= -1.0 - 1e-9 && delta <= 1.0 + 1e-9)
  }

  test("wilson_rank: lb < rate for every cohort with 0 < x < n, lb " +
    "recomputable, ranks are permutations") {
    val rows = SparkEntry.queries("q_wilson_rank")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val z = 1.96
    for (r <- rows) {
      val (n, x, rate, lb) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      if (x > 0 && x < n) assert(lb < rate, s"lb $lb !< rate $rate")
      val p = x.toDouble / n
      val want = (p + z * z / (2 * n) -
        z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) /
        (1 + z * z / n)
      assert(math.abs(lb - want) < 1e-4)
      assert(lb >= -1e-9 && lb <= 1.0)
    }
    val m = rows.length.toLong
    assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to m).toSeq)
    assert(rows.map(_.getLong(6)).sorted.toSeq == (1L to m).toSeq)
  }

  test("diff_in_diff: 4 cells partition the events, did reconstructs " +
    "from the cell means") {
    val rows = SparkEntry.queries("q_diff_in_diff")(spark, Sf).collect()
    assert(rows.length == 4)
    val total = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    val want = m((1L, 1L)) - m((1L, 0L)) - (m((0L, 1L)) - m((0L, 0L)))
    assert(math.abs(rows.head.getDouble(5) - want) < 1e-4)
    assert(rows.forall(_.getDouble(5) == rows.head.getDouble(5)))
  }

  test("forecast_skill: scored window excludes the first 7 days, " +
    "MAE sums non-negative, skill = ratio") {
    val r = SparkEntry.queries("q_forecast_skill")(spark, Sf).collect().head
    val (ns, aen, aes, skill) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    import org.apache.spark.sql.functions._
    // through the normalizing reader — the raw parquet ts is nanosecond
    // INT64 at this SF, so unix_micros on the raw column would misindex
    val days = graft.queries.table(spark, Sf, "events")
      .select(expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"))
      .distinct().count()
    assert(ns == days - 7, s"scored $ns != $days - 7")
    assert(aen >= 0 && aes >= 0)
    if (aen > 0) assert(math.abs(skill - aes.toDouble / aen) < 1e-5)
  }
}
