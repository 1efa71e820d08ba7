package graft.operators

import graft.plans.SummaryRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions._

/** Summary-table (materialized-view) maintenance for [[SummaryRewrite]]:
  * builds the (dims → cnt, partial sums) rollup of a fact parquet, persists
  * it, and registers it so aggregates over the fact are answered from the
  * summary. See [[SummaryRewrite]] for the subsumption and staleness
  * contracts.
  */
object MatViews {

  /** Build + persist + register a summary.
    * @param measures summary column name -> the fact expression whose SUM
    *                 the summary pre-aggregates (use an exact type — e.g. a
    *                 decimal cast — so re-merging partials is lossless)
    * @param minMeasures / maxMeasures: summary column name -> fact
    *                 expression whose MIN / MAX the summary pre-aggregates
    *                 (min of partial mins IS the min, so re-merge is exact
    *                 for any type) */
  def registerSummary(spark: SparkSession, factPath: String,
                      dims: Seq[String], measures: Seq[(String, Column)],
                      outPath: String,
                      minMeasures: Seq[(String, Column)] = Nil,
                      maxMeasures: Seq[(String, Column)] = Nil): DataFrame = {
    val fact = spark.read.parquet(factPath)
    val aggs = count(lit(1)).as("cnt") +:
      (measures.map { case (n, c) => sum(c).as(n) } ++
        minMeasures.map { case (n, c) => min(c).as(n) } ++
        maxMeasures.map { case (n, c) => max(c).as(n) })
    fact.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(outPath)
    val summary = spark.read.parquet(outPath)
    // canonical measure key: the RESOLVED sql of the agg child over the
    // fact schema — the same string a user query's Sum/Min/Max child
    // resolves to
    def keysOf(ms: Seq[(String, Column)]): Map[String, String] =
      ms.map { case (n, c) =>
        val resolved = fact.select(c.as("m")).queryExecution.analyzed
          .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
        resolved.sql -> n
      }.toMap
    SummaryRewrite.register(SummaryRewrite.Summary(
      factPath, dims, "cnt", keysOf(measures), summary.queryExecution.analyzed,
      mins = keysOf(minMeasures), maxs = keysOf(maxMeasures)))
    summary
  }
}
