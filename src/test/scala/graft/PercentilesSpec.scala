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

  // ---- weighted ----

  private def weightedReplay(rows: Seq[(String, Double, Long)])
      : Map[(String, Double), Double] =
    rows.groupBy(_._1).flatMap { case (k, g) =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      Ps.map { p =>
        val t = math.max(1L, math.ceil(
          (BigDecimal(p) * tw).toDouble).toLong)
        var cum = 0L
        var q = sorted.last._1
        val it = sorted.iterator
        var found = false
        while (it.hasNext && !found) {
          val (v, w) = it.next(); cum += w
          if (cum >= t) { q = v; found = true }
        }
        (k, p) -> q
      }
    }

  test("weighted: matches an in-memory replay, invariant across partitionings") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { _ =>
      (s"g${rnd.nextInt(5)}", math.floor(rnd.nextDouble() * 200) / 2.0,
        (rnd.nextInt(9) + 1).toLong)
    } :+ (("solo", 7.0, 3L))
    val df = rows.toDF("k", "v", "w")
    val want = weightedReplay(rows)
    for (parts <- Seq(3, 16)) {
      val got = Percentiles.weighted(df, "k", "v", "w", Ps, parts)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("weighted with w ≡ 1 equals the lower order statistic at ⌈p·n⌉") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 999).map(i => ("k", rnd.nextInt(100).toDouble, 1L))
    val df = rows.toDF("k", "v", "w")
    val sorted = rows.map(_._2).sorted
    val got = Percentiles.weighted(df, "k", "v", "w", Ps, 8)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    for (p <- Ps)
      assert(got(p) == sorted(math.ceil(p * rows.size).toInt - 1))
  }
}
