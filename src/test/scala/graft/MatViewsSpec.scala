package graft

import graft.operators.MatViews
import graft.plans.SummaryRewrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** SummaryRewrite: subsumption-cone rewrites hit the summary, everything
  * else is untouched, and values are identical either way. */
class MatViewsSpec extends AnyFunSuite with SparkFixture {

  private val factPath = s"$Sf/lineitem.parquet"
  private val out = s"${graft.queries.TmpRoot}/mv_spec"

  private def registered[A](body: => A): A =
    try {
      MatViews.registerSummary(spark, factPath,
        Seq("l_returnflag", "l_linestatus"),
        Seq("s_qty" -> col("l_quantity").cast(DecimalType(18, 2))),
        out)
      body
    } finally SummaryRewrite.clear()

  private def query() = spark.read.parquet(factPath)
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("q"))
    .orderBy("l_returnflag")

  test("rewrite produces identical values to the direct fact aggregate") {
    val direct = query().collect().toSeq
    val viaSummary = registered {
      val df = query()
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("sum(cnt#"), p) // partials re-merged from the summary
      df.collect().toSeq
    }
    assert(viaSummary == direct)
  }

  test("finer grouping (both dims) and a dim filter also rewrite") {
    registered {
      val df = spark.read.parquet(factPath)
        .where(col("l_linestatus") === "O")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("sum(cnt#"), p)
      val direct = spark.read.parquet(factPath)
        .where(col("l_linestatus") === "O")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val got = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == direct)
    }
  }

  test("no rewrite: unregistered measure, non-dim grouping, distinct agg") {
    registered {
      val m = spark.read.parquet(factPath).groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice")).as("s"))
      assert(!m.queryExecution.optimizedPlan.toString.contains("cnt#"))
      val g = spark.read.parquet(factPath).groupBy("l_partkey")
        .agg(count(lit(1)).as("n"))
      assert(!g.queryExecution.optimizedPlan.toString.contains("cnt#"))
      val d = spark.read.parquet(factPath).groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n"))
      assert(!d.queryExecution.optimizedPlan.toString.contains("cnt#"))
    }
  }

  test("cleared registry leaves plans untouched") {
    val df = query()
    assert(!df.queryExecution.optimizedPlan.toString.contains("cnt#"))
  }

  test("min/max measures rewrite from partials; unregistered min stays direct") {
    try {
      MatViews.registerSummary(spark, factPath,
        Seq("l_returnflag", "l_linestatus"),
        Seq("s_qty" -> col("l_quantity").cast(DecimalType(18, 2))),
        out + "_mm",
        minMeasures = Seq("mn_p" -> col("l_extendedprice").cast(DecimalType(18, 2))),
        maxMeasures = Seq("mx_p" -> col("l_extendedprice").cast(DecimalType(18, 2))))
      def q() = spark.read.parquet(factPath).groupBy("l_returnflag")
        .agg(min(col("l_extendedprice").cast(DecimalType(18, 2))).as("mn"),
          max(col("l_extendedprice").cast(DecimalType(18, 2))).as("mx"))
        .orderBy("l_returnflag")
      val df = q()
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("min(mn_p#") && p.contains("max(mx_p#"), p)
      val viaSummary = df.collect().toSeq
      SummaryRewrite.clear()
      assert(viaSummary == q().collect().toSeq)

      // a min over an UNREGISTERED measure must leave the plan untouched
      MatViews.registerSummary(spark, factPath,
        Seq("l_returnflag", "l_linestatus"),
        Seq("s_qty" -> col("l_quantity").cast(DecimalType(18, 2))),
        out + "_mm")
      val direct = spark.read.parquet(factPath).groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("mn"))
      assert(!direct.queryExecution.optimizedPlan.toString.contains("mn_p#"))
    } finally SummaryRewrite.clear()
  }

  test("incremental refresh: stale summary + batch partials == full rebuild") {
    try {
      val dims = Seq("l_returnflag", "l_linestatus")
      val sums = Seq("s_qty" -> col("l_quantity").cast(DecimalType(18, 2)))
      val mins = Seq("mn_p" -> col("l_extendedprice").cast(DecimalType(18, 2)))
      val maxs = Seq("mx_p" -> col("l_extendedprice").cast(DecimalType(18, 2)))
      // stale: only keys not divisible by 7
      MatViews.registerSummary(spark, factPath, dims, sums, out + "_v0",
        minMeasures = mins, maxMeasures = maxs,
        factSubset = Some(col("l_orderkey") % 7 =!= 0))
      val refreshed = MatViews.refreshIncremental(spark, factPath,
        spark.read.parquet(factPath).where(col("l_orderkey") % 7 === 0),
        out + "_v0", dims, sums, out + "_v1",
        minMeasures = mins, maxMeasures = maxs)
      // the refreshed summary is cell-identical to a from-scratch rebuild
      SummaryRewrite.clear()
      val rebuilt = MatViews.registerSummary(spark, factPath, dims, sums,
        out + "_full", minMeasures = mins, maxMeasures = maxs)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(dims.map(col): _*).collect().toSeq
      assert(canon(refreshed) == canon(rebuilt))
      // and a double refresh to the same path is refused
      SummaryRewrite.clear()
      intercept[IllegalArgumentException] {
        MatViews.refreshIncremental(spark, factPath,
          spark.read.parquet(factPath).limit(1),
          out + "_v1", dims, sums, out + "_v1")
      }
    } finally SummaryRewrite.clear()
  }

  test("double fact reference: both rewrites get distinct exprIds and run") {
    registered {
      // union of two aggregates over the SAME fact — each rewrite must
      // splice a FRESH summary instance, or the two subtrees would share
      // attribute ids and mis-resolve
      def one(flag: String) = spark.read.parquet(factPath)
        .where(col("l_returnflag") === flag)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val df = one("A").unionByName(one("R"))
      val p = df.queryExecution.optimizedPlan
      assert("sum\\(cnt#".r.findAllIn(p.toString).length == 2, p)
      // distinct exprIds for the two summary scans
      val cntIds = p.collectLeaves().flatMap(_.output)
        .filter(_.name == "cnt").map(_.exprId).distinct
      assert(cntIds.length == 2, s"summary spliced verbatim twice: $cntIds")
      val direct = Seq("A", "R").map(f => spark.read.parquet(factPath)
        .where(col("l_returnflag") === f).count())
      assert(df.orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq == direct)
    }
  }

  test("global count(*) with a zero-match dim filter rewrites to 0, not null") {
    registered {
      val df = spark.read.parquet(factPath)
        .where(col("l_returnflag") === "ZZZ") // matches no summary row
        .agg(count(lit(1)).as("n"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("sum(cnt#"), p) // the rewrite DID fire…
      val r = df.collect()
      assert(r.length == 1 && !r(0).isNullAt(0) && r(0).getLong(0) == 0L, r.toSeq)
    }
  }

  test("rewrite applies through the SQL front door too") {
    registered {
      val df = spark.sql(
        s"""SELECT l_returnflag, count(*) AS n
           |FROM parquet.`$factPath`
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("sum(cnt#"), p)
      val direct = spark.read.parquet(factPath).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n")).orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == direct)
    }
  }
}
