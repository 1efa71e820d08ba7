package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the wave-3 catalog queries at sf0.001 —
  * cheap cross-checks that hold regardless of corpus content, on top of
  * the DuckDB value gate. */
class AnalyticsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("q_filter_funnel stages are monotonically non-increasing") {
    val r = SparkEntry.queries("q_filter_funnel")(spark, Sf).collect().head
    val chain = (0 to 5).map(i => r.getLong(i))
    assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $chain")
    assert(chain.head > 0)
  }

  test("q_join_lateral equals the hand-written aggregate join") {
    val lateral = SparkEntry.queries("q_join_lateral")(spark, Sf).collect()
    val c = spark.read.parquet(s"$Sf/customer.parquet")
      .where(col("c_custkey") % 50 === 0).select("c_custkey")
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(max(col("o_totalprice")), 2).as("max_price"))
    val twin = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"), col("max_price"))
      .orderBy("c_custkey").collect()
    assert(lateral.toSeq == twin.toSeq)
  }

  test("q_sql_recursive depth is the halving-chain length of each start") {
    val rows = SparkEntry.queries("q_sql_recursive")(spark, Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val orig = r.getLong(0)
      var (cur, d, sum) = (orig, 0L, orig)
      while (cur > 0) { cur /= 2; d += 1; sum += cur }
      assert(r.getLong(1) == d, s"depth of $orig")
      assert(r.getLong(2) == sum, s"path sum of $orig")
    }
  }

  test("q_variant_extract: missing path extracts to null everywhere") {
    val rows = SparkEntry.queries("q_variant_extract")(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) == 0L), "n_missing must be 0 in every group")
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$Sf/orders.parquet").count())
  }

  test("gini in [0,1); coverage monotone; keywords exactly ≤3/doc; bounce consistent") {
    val g = SparkEntry.queries("q_gini")(spark, Sf).collect().head
    assert(g.getDouble(2) >= 0.0 && g.getDouble(2) < 1.0)
    val v = SparkEntry.queries("q_vocab_coverage")(spark, Sf).collect().head
    assert(v.getDouble(2) <= v.getDouble(3) && v.getDouble(3) <= 1.0,
      s"coverage not monotone: $v")
    val kw = SparkEntry.queries("q_keywords")(spark, Sf).collect()
      .groupBy(_.getLong(0))
    assert(kw.values.forall(_.length <= 3))
    val b = SparkEntry.queries("q_bounce")(spark, Sf).collect().head
    assert(b.getLong(1) + b.getLong(2) <= b.getLong(0), "bounce+long ≤ sessions")
    assert(b.getLong(3) >= b.getLong(0), "events ≥ sessions")
  }

  test("q_bootstrap replicates: weights average ~1 and means bracket the truth") {
    val rows = SparkEntry.queries("q_bootstrap")(spark, Sf).collect()
    assert(rows.length == 32)
    val n = spark.read.parquet(s"$Sf/events.parquet").count().toDouble
    val mean = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("avg(CAST(floor(value*100 + 0.5) AS DOUBLE) / 100)")
      .collect().head.getDouble(0)
    for (r <- rows) {
      // Poisson(1) effective sample size concentrates around n
      assert(math.abs(r.getLong(1) - n) < 5 * math.sqrt(n),
        s"rep ${r.getLong(0)}: n_eff=${r.getLong(1)} far from n=$n")
    }
    val mus = rows.map(_.getDouble(2))
    assert(mus.min <= mean && mean <= mus.max,
      s"replicate means [${mus.min}, ${mus.max}] do not bracket $mean")
  }

  test("q_sssp distances are bounded by hop-count × max weight and ≥ BFS-reachability") {
    val sssp = SparkEntry.queries("q_sssp")(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = SparkEntry.queries("q_bfs")(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same seed rule and graph ⇒ identical reachable set within 3 rounds
    assert(sssp.keySet == bfs.keySet)
    // dist respects the hop lower bound (weights ≥ 1) and the 3-hop cap
    val maxW = 50L * 3
    for ((v, d) <- sssp) {
      assert(d >= bfs(v), s"dist($v)=$d below hop count ${bfs(v)}")
      assert(d <= maxW, s"dist($v)=$d above 3-hop × max-quantity bound")
    }
  }
}
