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
  /** @param factSubset when set, the summary covers only the matching
    *   fact rows (a deliberately STALE summary — pair with
    *   [[refreshIncremental]] to fold in the rest; registering it answers
    *   queries as of the subset, per the staleness contract). */
  def registerSummary(spark: SparkSession, factPath: String,
                      dims: Seq[String], measures: Seq[(String, Column)],
                      outPath: String,
                      minMeasures: Seq[(String, Column)] = Nil,
                      maxMeasures: Seq[(String, Column)] = Nil,
                      factSubset: Option[Column] = None): DataFrame = {
    val fact0 = spark.read.parquet(factPath)
    val fact = factSubset.map(fact0.where).getOrElse(fact0)
    val aggs = count(lit(1)).as("cnt") +:
      (measures.map { case (n, c) => sum(c).as(n) } ++
        minMeasures.map { case (n, c) => min(c).as(n) } ++
        maxMeasures.map { case (n, c) => max(c).as(n) })
    fact.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(outPath)
    registerFrom(spark, factPath, dims, measures, outPath,
      minMeasures, maxMeasures)
  }

  /** Incremental summary maintenance — the answer to the staleness
    * contract: when a batch lands in the fact, aggregate THE BATCH ONLY,
    * merge its partials into the existing summary (count/sum re-add;
    * min/max re-min/re-max — all four are self-decomposable, so the merge
    * is exact), write the result to `newOutPath`, and re-register. The
    * existing fact data is never re-scanned: refresh cost is O(batch) +
    * O(summary), which at 100 TB is the difference between an ingest-time
    * tick and a full recompute. `newOutPath` must differ from the current
    * summary's path (immutable-storage discipline: a parquet dir is never
    * overwritten while it is being read; the caller alternates paths or
    * versions them).
    *
    * Measure definitions must match the original registration — they are
    * re-resolved against the fact schema so the rewrite keys stay
    * identical. */
  def refreshIncremental(spark: SparkSession, factPath: String,
                         batch: DataFrame, oldOutPath: String,
                         dims: Seq[String], measures: Seq[(String, Column)],
                         newOutPath: String,
                         minMeasures: Seq[(String, Column)] = Nil,
                         maxMeasures: Seq[(String, Column)] = Nil): DataFrame = {
    require(newOutPath != oldOutPath,
      s"refresh must write to a fresh path, got $newOutPath twice")
    val existing = spark.read.parquet(oldOutPath)
    val batchAggs = count(lit(1)).as("cnt") +:
      (measures.map { case (n, c) => sum(c).as(n) } ++
        minMeasures.map { case (n, c) => min(c).as(n) } ++
        maxMeasures.map { case (n, c) => max(c).as(n) })
    val batchSummary = batch.groupBy(dims.map(col): _*)
      .agg(batchAggs.head, batchAggs.tail: _*)
    val mergeAggs = sum(col("cnt")).cast("long").as("cnt") +:
      (measures.map { case (n, _) => sum(col(n)).as(n) } ++
        minMeasures.map { case (n, _) => min(col(n)).as(n) } ++
        maxMeasures.map { case (n, _) => max(col(n)).as(n) })
    existing.unionByName(batchSummary.select(existing.columns.map(col): _*))
      .groupBy(dims.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
      .write.mode("overwrite").parquet(newOutPath)
    // re-register off the refreshed summary (same measure keys — they are
    // a function of the fact schema, which did not change)
    registerFrom(spark, factPath, dims, measures, newOutPath,
      minMeasures, maxMeasures)
  }

  /** Incremental maintenance of a JOIN-aggregate view
    * `V = Σ (fact ⋈ dim) GROUP BY dims`: when a fact batch lands, join the
    * BATCH ONLY against the (unchanged) dimension, aggregate it, and merge
    * the partials into the existing summary — the historical fact is never
    * re-joined or re-scanned, so a refresh tick costs
    * O(|batch| ⋈ dim) + O(|summary|) instead of O(|fact|). Count and
    * decimal-sum partials re-merge exactly (self-decomposable), so the
    * refreshed view is bit-identical to a from-scratch rebuild — the
    * query-catalog oracle recomputes the full join to prove it.
    *
    * Contract: `dim` must be the same relation the existing summary was
    * built against (dimension updates need a view REBUILD or a
    * delta-join maintenance pass over the changed dim keys — out of scope
    * here, documented rather than silently wrong). Pure DataFrame-in /
    * DataFrame-out: persistence/versioning is the caller's concern. */
  def refreshJoinIncremental(existing: DataFrame, batch: DataFrame,
                             dim: DataFrame, joinCols: Seq[String],
                             dims: Seq[String],
                             measures: Seq[(String, Column)]): DataFrame = {
    val batchAggs = count(lit(1)).cast("long").as("cnt") +:
      measures.map { case (n, c) => sum(c).as(n) }
    val batchSummary = batch.join(dim, joinCols)
      .groupBy(dims.map(col): _*).agg(batchAggs.head, batchAggs.tail: _*)
    val mergeAggs = sum(col("cnt")).cast("long").as("cnt") +:
      measures.map { case (n, _) => sum(col(n)).as(n) }
    existing.unionByName(batchSummary.select(existing.columns.map(col): _*))
      .groupBy(dims.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Register an ALREADY-BUILT summary parquet (shared by the initial
    * build and incremental refresh paths). */
  private def registerFrom(spark: SparkSession, factPath: String,
                           dims: Seq[String], measures: Seq[(String, Column)],
                           outPath: String,
                           minMeasures: Seq[(String, Column)],
                           maxMeasures: Seq[(String, Column)]): DataFrame = {
    val fact = spark.read.parquet(factPath)
    val summary = spark.read.parquet(outPath)
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
