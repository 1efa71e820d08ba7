package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Invariant checks for the wave-26 SCC/Shapley/selectivity queries at
  * sf0.001 — including a from-scratch Kosaraju SCC and the Shapley
  * efficiency axiom. */
class Wave26OpsSpec extends AnyFunSuite with SparkFixture {

  test("scc matches a brute-force Kosaraju on the dominant-direction graph") {
    val rows = SparkEntry.queries("q_scc")(spark, Sf).collect()
    // rebuild the edge list independently (plain SQL over the tables)
    Seq("orders", "lineitem", "customer", "supplier").foreach { t =>
      spark.read.parquet(s"$Sf/$t.parquet").createOrReplaceTempView(s"w26_$t")
    }
    val edges = spark.sql(
      """WITH f AS (
        |  SELECT c.c_nationkey AS cn, s.s_nationkey AS sn, count(*) AS fl
        |  FROM w26_orders o
        |  JOIN w26_lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN w26_customer c ON c.c_custkey = o.o_custkey
        |  JOIN w26_supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2)
        |SELECT CAST(a.cn AS BIGINT) AS cn, CAST(a.sn AS BIGINT) AS sn
        |FROM f a
        |LEFT JOIN f b ON b.cn = a.sn AND b.sn = a.cn
        |WHERE a.cn <> a.sn AND a.fl > coalesce(b.fl, 0)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rg = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val visited = mutable.Set[Long](); val order = mutable.ArrayBuffer[Long]()
    def dfs1(s0: Long): Unit = {
      val stack = mutable.Stack[(Long, Iterator[Long])](
        (s0, g.getOrElse(s0, Array.empty[Long]).iterator))
      visited += s0
      while (stack.nonEmpty) {
        val (n, it) = stack.top
        it.find(!visited(_)) match {
          case Some(w) =>
            visited += w; stack.push((w, g.getOrElse(w, Array.empty[Long]).iterator))
          case None => order += n; stack.pop()
        }
      }
    }
    nodes.foreach(u => if (!visited(u)) dfs1(u))
    val comp = mutable.Map[Long, Long]()
    for (u <- order.reverse if !comp.contains(u)) {
      val stack = mutable.Stack(u); comp(u) = u
      while (stack.nonEmpty) {
        val n = stack.pop()
        for (w <- rg.getOrElse(n, Array.empty[Long]) if !comp.contains(w)) {
          comp(w) = u; stack.push(w)
        }
      }
    }
    // compare as PARTITIONS (labels differ: query uses min-member)
    val mine = nodes.groupBy(comp).values.map(_.toSet).toSet
    val theirs = rows.groupBy(_.getLong(1)).values
      .map(_.map(_.getLong(0)).toSet).toSet
    assert(rows.length == nodes.length)
    assert(mine == theirs, "SCC partitions disagree with Kosaraju")
    for (r <- rows) assert(r.getLong(1) <= r.getLong(0),
      "label is the min member")
    assert(rows.map(_.getLong(1)).distinct.length == r0(rows),
      "n_scc matches the distinct labels")
  }

  private def r0(rows: Array[org.apache.spark.sql.Row]): Int =
    rows.head.getLong(3).toInt

  test("shapley satisfies the efficiency axiom: sum phi = v(full) - v(empty)") {
    val rows = SparkEntry.queries("q_shapley_attribution")(spark, Sf).collect()
    assert(rows.length == 4)
    val masks = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) +" +
          "max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END) +" +
          "max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) +" +
          "max(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END)").as("m"),
        org.apache.spark.sql.functions.expr(
          "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)")
          .as("conv"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    def v(mask: Int): Double = {
      val in = masks.filter(_._1 == mask)
      if (in.isEmpty) 0.0 else in.map(_._2).sum.toDouble / in.length
    }
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - (v(15) - v(0))) < 1e-4,
      s"efficiency violated: sum=$total vs ${v(15) - v(0)}")
  }

  test("selectivity_audit: conjunction counts nest and the ratio " +
    "reprices the independence product") {
    val rows = SparkEntry.queries("q_selectivity_audit")(spark, Sf).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val (n, n1, n2, n12) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n12 <= math.min(n1, n2) && n12 >= math.max(0L, n1 + n2 - n))
      if (!r.isNullAt(8)) {
        val expect = n12.toDouble * n / (n1.toDouble * n2)
        assert(math.abs(r.getDouble(8) - expect) < 1e-5)
      }
    }
  }
}
