package graft

import graft.queries.Wave31
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the wave-31 queries at sf0.001 — structural laws
  * the DuckDB hash-compare cannot express. */
class Wave31OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_fleiss_kappa: 3 ratings per item, po/pe/kappa in range") {
    val r = Wave31.queries("q_fleiss_kappa")(spark, Sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nItems = row.getAs[Long]("n_items")
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(nItems == nDocs)
    assert(row.getAs[Long]("n_raters") == 3L)
    val po = row.getAs[Double]("po")
    val pe = row.getAs[Double]("pe")
    assert(po >= 0.0 && po <= 1.0, s"po=$po")
    assert(pe > 0.0 && pe <= 1.0, s"pe=$pe") // 3 cats → pe ≥ 1/3 actually
    assert(pe >= 1.0 / 3 - 1e-9, s"pe=$pe below the 3-category floor")
    val kappa = row.getAs[Double]("kappa")
    assert(kappa >= -1.0 && kappa <= 1.0, s"kappa=$kappa")
    // raters agree on the base category 70% of the time — far above chance
    assert(kappa > 0.1, s"kappa=$kappa should show real agreement")
  }

  test("q_interval_union: coverage bounded by sum and max of durations") {
    val rows = Wave31.queries("q_interval_union")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_events")
      val ni = r.getAs[Long]("n_islands")
      val cov = r.getAs[Long]("covered_us")
      assert(ni >= 1 && ni <= ne, s"islands $ni events $ne")
      // every interval is 1..60 s: union ≤ 60s·n, and ≥ one interval
      assert(cov >= 1000000L, s"cov=$cov below a single minimum interval")
      assert(cov <= 60000000L * ne, s"cov=$cov exceeds the duration sum")
    }
  }

  test("q_critical_path: levels partition the vertices, level 0 nonempty") {
    val rows = Wave31.queries("q_critical_path")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val levels = rows.map(r =>
      (r.getAs[Long]("level"), r.getAs[Long]("n_vertices"))).toMap
    assert(levels.keySet.forall(l => l >= 0 && l <= 4))
    assert(levels.getOrElse(0L, 0L) >= 1,
      "a DAG orientation must leave at least one source at level 0")
    // vertex count conservation against an independent degree count
    import org.apache.spark.sql.functions._
    val os = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val nv = os.alias("a").join(os.alias("b"), Seq("ok"))
      .where(col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("w")).where(col("w") >= 5)
      .select(explode(array(col("u"), col("v"))).as("x"))
      .distinct().count()
    assert(levels.values.sum == nv, s"levels sum ${levels.values.sum} != $nv")
  }

  test("q_conformal: coverage near 1 - alpha on every split type") {
    val rows = Wave31.queries("q_conformal")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qhat = r.getAs[Double]("qhat")
      assert(qhat >= 0.0)
      if (!r.isNullAt(r.fieldIndex("coverage"))) {
        val cov = r.getAs[Double]("coverage")
        // split-conformal guarantee is ≥ 1−α in expectation; at sf0.001
        // sample sizes allow slack but gross miscalibration must fail
        assert(cov >= 0.75 && cov <= 1.0, s"coverage=$cov")
      }
    }
  }
}
