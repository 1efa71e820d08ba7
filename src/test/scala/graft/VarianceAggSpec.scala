package graft

import graft.functions.VarianceAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VarianceAggSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val varUdaf = udaf(VarianceAgg)

  test("matches built-in var_samp (within decimal quantization)") {
    val e = graft.queries.table(spark, Sf, "events")
    val rows = e.groupBy("event_type")
      .agg(varUdaf(col("value")).as("custom"),
        var_samp(col("value")).as("builtin"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-6,
        s"${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
  }

  test("deterministic under repartitioning (exact decimal buffer)") {
    val e = graft.queries.table(spark, Sf, "events")
    def run(n: Int): Map[String, Double] =
      e.repartition(n).groupBy("event_type")
        .agg(varUdaf(col("value")).as("v"))
        .as[(String, Double)].collect().toMap
    val base = run(1)
    assert(run(3) == base && run(13) == base) // bit-identical, not approx
  }

  test("approx_count_distinct lands within 10% of exact") {
    val e = graft.queries.table(spark, Sf, "events")
    val r = e.agg(countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id").as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"$approx vs $exact")
  }
}
