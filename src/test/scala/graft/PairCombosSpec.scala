package graft

import org.scalatest.funsuite.AnyFunSuite

/** pair_combos generator: C(n,2) index-ordered pairs, SQL-reachable
  * (the q_adamic_adar wedge-enumeration primitive). */
class PairCombosSpec extends AnyFunSuite with SparkFixture {

  test("emits exactly C(n,2) value-ordered pairs over a sorted array") {
    val rows = spark.sql(
      "SELECT pair_combos(sort_array(array(3L, 1L, 2L))) AS (p, q)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("degenerate inputs emit nothing; null input emits nothing") {
    assert(spark.sql("SELECT pair_combos(array(7L))").count() == 0)
    assert(spark.sql(
      "SELECT pair_combos(CAST(array() AS ARRAY<BIGINT>)) AS (p, q)")
      .count() == 0)
    assert(spark.sql(
      "SELECT pair_combos(CAST(NULL AS ARRAY<BIGINT>)) AS (p, q)")
      .count() == 0)
  }

  test("pair count matches the wedge formula on a real neighbor-list frame") {
    import org.apache.spark.sql.functions._
    val df = spark.range(50).select(
      (col("id") % 7).as("z"), col("id").as("x"))
    val nbrs = df.groupBy("z").agg(sort_array(collect_list("x")).as("nb"))
    val pairs = nbrs.selectExpr("z", "pair_combos(nb) AS (p, q)")
    val expected = nbrs.selectExpr("size(nb) AS n")
      .selectExpr("CAST(sum(n * (n - 1) / 2) AS BIGINT) AS w")
      .collect()(0).getLong(0)
    assert(pairs.count() == expected)
    // every pair value-ordered (sorted input)
    assert(pairs.where("p >= q").count() == 0)
  }
}
