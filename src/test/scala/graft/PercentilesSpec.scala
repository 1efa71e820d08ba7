package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed-selection percentile must bit-match Spark's built-in
  * exact percentile() (whose whole-group buffer it exists to avoid) on
  * arbitrary group shapes — including the shape that motivates it: one
  * group far larger than every other, where the built-in would pile all
  * values into a single task's aggregation buffer. */
class PercentilesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val Ps = Seq(0.25, 0.5, 0.75)

  private def builtin(df: org.apache.spark.sql.DataFrame): Map[(String, Double), Double] =
    df.groupBy("k")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("qs"))
      .collect()
      .flatMap { r =>
        val qs = r.getSeq[Double](1)
        Ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> qs(i) }
      }.toMap

  private def ours(df: org.apache.spark.sql.DataFrame, parts: Int): Map[(String, Double), Double] =
    Percentiles.exact(df, "k", "v", Ps, parts)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  test("matches percentile() on random groups with ties and tiny groups") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 5000).map { _ =>
      val k = s"g${rnd.nextInt(7)}"
      // coarse quantization → plenty of exact ties
      (k, math.floor(rnd.nextDouble() * 50) / 10.0)
    } ++ Seq(("lonely", 42.0)) // n = 1: every percentile is the value itself
    val df = rows.toDF("k", "v")
    assert(ours(df, 16) == builtin(df))
  }

  test("skewed: one group holds 100k values, parts bound the per-task slice") {
    val rnd = new scala.util.Random(97)
    val rows = (1 to 100000).map(_ => ("whale", rnd.nextDouble() * 1000)) ++
      (1 to 50).map(_ => ("minnow", rnd.nextDouble()))
    val df = rows.toDF("k", "v")
    // with 8 range partitions the whale group spans ~8 slices of ~12.5k
    // rows each — no single task ever ranks the whole group
    assert(ours(df, 8) == builtin(df))
  }

  test("null values are ignored; all-null keys yield no rows") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", None)).toDF("k", "v")
    val got = ours(df, 4)
    assert(got.keySet.map(_._1) == Set("a"))
    assert(got(("a", 0.5)) == 1.5)
  }
}
