package graft

import graft.queries.Wave40
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-40 queries at sf0.001. */
class Wave40OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_ann_multiprobe: multi-probe recall dominates single-probe") {
    val rows = Wave40.queries("q_ann_multiprobe")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("k_exact") >= 1L, r)
      // the single-probe candidates are a subset of the multi-probe
      // candidates, so recall can only improve
      assert(r.getAs[Long]("hit_single") <= r.getAs[Long]("hit_multi"), r)
      assert(r.getAs[Double]("recall_multi") <= 1.0
        && r.getAs[Double]("recall_single") >= 0.0, r)
    }
    val m = rows.head
    assert(m.getAs[Double]("mean_recall_single") <=
      m.getAs[Double]("mean_recall_multi"))
    spark.catalog.clearCache()
  }

  test("q_coreness: core numbers satisfy the k-core defining property") {
    val rows = Wave40.queries("q_coreness")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // partition sanity: counts and checksums positive, coreness >= 1
    rows.foreach { r =>
      assert(r.getAs[Long]("coreness") >= 1L, r)
      assert(r.getAs[Long]("n_vertices") >= 1L, r)
    }
    // rebuild labels driver-side and check: within the subgraph induced
    // by {v : core(v) >= k}, every vertex has degree >= k (the k-core
    // property for every realized k)
    val e = graft.queries.table(spark, Sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val small = e.groupBy("ok").agg(count(lit(1)).as("n"))
      .where(col("n") <= 64).select("ok")
    val bb = e.join(small, "ok")
    val edges = bb.select(col("ok"), col("pk").as("u"))
      .join(bb.select(col("ok"), col("pk").as("v")), "ok")
      .where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("s"))
      .where(col("s") >= 2L)
      .select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // recompute coreness driver-side by sequential peeling (Batagelj-
    // Zaversnik style) and compare the histogram
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    val deg = scala.collection.mutable.Map(adj.toSeq.map { case (k, s) => k -> s.size }: _*)
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    var k = 1L
    while (alive.nonEmpty) {
      val peel = alive.filter(v => deg(v) <= k)
      if (peel.isEmpty) k += 1
      else peel.foreach { v =>
        core(v) = k; alive -= v
        adj(v).foreach { n => if (alive(n)) deg(n) = deg(n) - 1 }
      }
    }
    val expect = core.groupBy(_._2).map { case (c, m) =>
      c -> (m.size.toLong, m.keys.sum)
    }
    val got = rows.map(r => r.getAs[Long]("coreness") ->
      (r.getAs[Long]("n_vertices"), r.getAs[Long]("sum_v"))).toMap
    assert(got == expect, s"got $got expect $expect")
    spark.catalog.clearCache()
  }

  test("q_stream_typecount_sink: final counts equal the batch group-by") {
    val rows = Wave40.queries("q_stream_typecount_sink")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val expect = graft.queries.table(spark, Sf, "events")
      .groupBy(col("user_id").cast("long").as("u"), col("event_type").as("t"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[String]("t")) ->
        r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
      assert(expect(key) == r.getAs[Long]("n"), s"$key")
    }
    assert(rows.length == expect.size)
    spark.catalog.clearCache()
  }
}
