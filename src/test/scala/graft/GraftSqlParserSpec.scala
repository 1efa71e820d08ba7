package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GRAFT TOPK dialect must be purely additive: every normal statement
  * delegates verbatim to Spark's parser, the dialect itself builds the
  * native operator, and malformed dialect text fails loudly. */
class GraftSqlParserSpec extends AnyFunSuite with SparkFixture {

  test("normal SQL statements delegate untouched") {
    assert(spark.sql("SELECT 1 AS x").collect().head.getInt(0) == 1)
    // multi-line + subqueries + window functions all still parse
    assert(spark.sql(
      """SELECT x, row_number() OVER (ORDER BY x) AS rn
        |FROM (SELECT explode(array(3, 1, 2)) AS x)""".stripMargin)
      .count() == 3)
  }

  test("GRAFT TOPK parses over a subquery relation and matches the window twin") {
    spark.read.parquet(s"$Sf/events.parquet")
      .select("event_id", "event_type", "value")
      .createOrReplaceTempView("ev_parser_spec")
    val got = spark.sql(
      """GRAFT TOPK 2 PER event_type ORDER BY value DESC, event_id ASC
        |FROM (SELECT * FROM ev_parser_spec WHERE value > 0) t""".stripMargin)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    val want = spark.table("ev_parser_spec").where(col("value") > 0)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("malformed ordering term fails loudly, unknown columns fail analysis") {
    intercept[IllegalArgumentException] {
      spark.sql("GRAFT TOPK 2 PER k ORDER BY v SIDEWAYS FROM tbl")
    }
    spark.range(3).toDF("id").createOrReplaceTempView("r3_parser_spec")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("GRAFT TOPK 2 PER nope ORDER BY id ASC FROM r3_parser_spec")
        .collect()
    }
  }
}
