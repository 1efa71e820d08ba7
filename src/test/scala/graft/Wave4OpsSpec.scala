package graft

import graft.operators.MatViews
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent in-memory cross-checks for the wave-4 additions — evidence
  * beyond the single-corpus DuckDB oracle: the incremental join-view
  * refresh is compared to a from-scratch rebuild across several batch
  * splits, and the graph / privacy / statistics queries are re-derived by
  * brute force from the same sf0.001 inputs.
  */
class Wave4OpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("refreshJoinIncremental equals a from-scratch rebuild for any split") {
    val fact = (1L to 300L).map(i => (i, i % 7, (i * 13 % 100) + 1)).toDF("id", "k", "m")
    val dim = (0L to 6L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    def rebuild(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, Seq("k")).groupBy("g")
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(col("m").cast("decimal(18,2)")).as("sm"))
    for (mod <- Seq(2, 3, 9)) {
      val existing = rebuild(fact.where(col("id") % mod =!= 0))
      val got = MatViews.refreshJoinIncremental(existing,
          fact.where(col("id") % mod === 0), dim, Seq("k"), Seq("g"),
          Seq("sm" -> col("m").cast("decimal(18,2)")))
        .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      val want = rebuild(fact).orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      assert(got.toSeq == want.toSeq, s"mod=$mod")
    }
  }

  /** The q_lcc / q_triangles co-purchase projection, in memory. */
  private def suppGraph(): (Seq[(Long, Long)], Map[Long, Int]) = {
    val os = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = os.groupBy(_._1).values.flatMap { b =>
      val sks = b.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.size) yield (sks(i), sks(j))
    }.groupBy(identity).filter(_._2.size >= 5).keys.toSeq
    // (NOT Map.collect yielding tuples — that would rebuild a Map keyed on
    // the first vertex and silently drop edges)
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, vs) => v -> vs.size }
    (und, deg)
  }

  test("q_lcc matches brute-force triangle counting") {
    val (und, deg) = suppGraph()
    val adj = und.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val triOf = deg.keys.map { v =>
      val ns = adj(v).toSeq
      v -> (for (i <- ns.indices; j <- i + 1 until ns.size
                 if adj(ns(i)).contains(ns(j))) yield 1).size
    }.toMap
    val want = deg.toSeq.filter(_._2 >= 2).map { case (v, d) =>
      val t = triOf(v)
      val lcc = BigDecimal(2.0 * t / (d.toLong * (d - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (v, d.toLong, t.toLong, lcc)
    }.sortBy { case (v, d, _, l) => (-l, -d, v) }.take(30)
    val got = SparkEntry.queries("q_lcc")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
  }

  test("q_tcloseness matches the EMD definition by brute force") {
    val rows = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderpriority"),
        least(floor(col("o_totalprice") / 50000), lit(9)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bins = rows.map(_._2).distinct.sorted
    val k = bins.size
    val n = rows.length.toLong
    val globCum = bins.map(b => b -> rows.count(_._2 <= b).toLong).toMap
    val want = rows.groupBy(_._1).toSeq.map { case (g, rs) =>
      val ng = rs.length.toLong
      val s = bins.map(b => math.abs(rs.count(_._2 <= b) * n - globCum(b) * ng)).sum
      val t = BigDecimal(s.toDouble / (ng * n * (k - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, ng, t)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_tcloseness")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want)
  }

  test("q_chi2 matches the direct statistic and is ~0 on independent data") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val langs = rows.map(_._1).distinct
    val srcs = rows.map(_._2).distinct
    val chi2 = (for (l <- langs; s <- srcs) yield {
      val o = rows.count(r => r == ((l, s))).toLong
      val r = rows.count(_._1 == l).toLong
      val c = rows.count(_._2 == s).toLong
      val d = o * n - r * c
      BigDecimal((d * d).toDouble / (r * c * n).toDouble)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }).sum.toDouble
    val row = SparkEntry.queries("q_chi2")(spark, Sf).collect().head
    assert(row.getLong(0) == langs.size.toLong * srcs.size)
    assert(row.getLong(1) == (langs.size - 1).toLong * (srcs.size - 1))
    assert(math.abs(row.getDouble(2) - chi2) < 1e-9)
  }
}
