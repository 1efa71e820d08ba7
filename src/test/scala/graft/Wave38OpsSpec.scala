package graft

import graft.queries.Wave38
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-38 queries at sf0.001. */
class Wave38OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_knn_classify: per-label accuracies are well-formed") {
    val rows = Wave38.queries("q_knn_classify")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"), r)
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0, r)
    }
    spark.catalog.clearCache()
  }

  test("q_corpus_overlap: overlap counts bounded by both set sizes") {
    val rows = Wave38.queries("q_corpus_overlap")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"), r)
      assert(r.getAs[Long]("n_common") <=
        math.min(r.getAs[Long]("n_s1"), r.getAs[Long]("n_s2")), r)
      assert(r.getAs[Double]("containment_in_s1") <= 1.0
        && r.getAs[Double]("containment_in_s2") <= 1.0, r)
    }
    spark.catalog.clearCache()
  }

  test("q_mis: the selected set is INDEPENDENT in the part graph") {
    val mis = Wave38.queries("q_mis")(spark, Sf)
    val rows = mis.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("round") >= 1L
      && r.getAs[Long]("round") <= 3L))
    // rebuild the same q_kcore-style part edges; no edge may connect two
    // MIS members (independence — the defining property)
    val b0 = graft.queries.table(spark, Sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val small = b0.groupBy("ok").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= 64).select("ok")
    val bb = b0.join(small, "ok")
    val e0 = bb.select(col("ok"), col("pk").as("u"))
      .join(bb.select(col("ok"), col("pk").as("v")), "ok")
      .where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .where(col("support") >= 2L)
      .selectExpr("CAST(u AS BIGINT) AS u", "CAST(v AS BIGINT) AS v")
    val m = mis.select(col("v").as("x"))
    val violations = e0.join(m.withColumnRenamed("x", "u"), Seq("u"))
      .join(m.withColumnRenamed("x", "v"), Seq("v")).count()
    assert(violations == 0L, s"$violations edges inside the MIS")
    spark.catalog.clearCache()
  }
}
