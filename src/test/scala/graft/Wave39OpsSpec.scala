package graft

import graft.queries.Wave39
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-39 queries at sf0.001. */
class Wave39OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_scc_user: labels are a valid SCC partition of the succession graph") {
    val rows = Wave39.queries("q_scc_user")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // label = min member id of its group; sizes consistent with the group
    val byScc = rows.groupBy(_.getAs[Long]("scc"))
    byScc.foreach { case (l, members) =>
      assert(members.map(_.getAs[Long]("suppkey")).min == l,
        s"scc label $l is not the min member id")
      assert(members.forall(_.getAs[Long]("scc_size") == members.length),
        s"scc_size inconsistent for component $l")
    }
    // every member of a nontrivial SCC must have an in- AND out-edge
    // inside its component (necessary for strong connectivity)
    import org.apache.spark.sql.expressions.Window
    val seq = graft.queries.table(spark, Sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_suppkey").as("sk"))
    val e = seq.alias("a")
      .join(seq.alias("b"),
        col("a.ok") === col("b.ok") && col("b.ln") === col("a.ln") + 1)
      .where(col("a.sk") =!= col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(desc("w"), asc("v"))))
      .where(col("rn") <= 3)
      .select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lbl = rows.map(r =>
      r.getAs[Long]("suppkey") -> r.getAs[Long]("scc")).toMap
    byScc.filter(_._2.length >= 2).foreach { case (l, members) =>
      members.map(_.getAs[Long]("suppkey")).foreach { m =>
        assert(e.exists { case (u, v) => u == m && lbl(v) == l },
          s"$m has no out-edge inside SCC $l")
        assert(e.exists { case (u, v) => v == m && lbl(u) == l },
          s"$m has no in-edge inside SCC $l")
      }
    }
    spark.catalog.clearCache()
  }

  test("q_stream_recent_sink: final windows equal the batch newest-3 per user") {
    val rows = Wave39.queries("q_stream_recent_sink")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // batch twin: newest 3 (epoch-ms, event_id) per user, ascending
    val ev = graft.queries.table(spark, Sf, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        (unix_micros(col("ts")) / 1000).cast("long").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._3, e._2)).sorted.takeRight(3).map(_._2)
        .mkString(",")
    }
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[String]("event_ids") == expect(u),
        s"user $u window mismatch")
    }
    assert(rows.length == expect.size)
    spark.catalog.clearCache()
  }
}
