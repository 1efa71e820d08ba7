package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-graph pins for the wave-43 greedy coloring (the two streaming
  * sketches are covered per-micro-batch by StreamOpsSpec; their sink
  * round-trips are oracle-gated as q_stream_cms_sink / q_stream_hll_sink). */
class Wave43OpsSpec extends AnyFunSuite with SparkFixture {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("greedyColorClasses: id-priority layers on a path are the known peel") {
    // path 1-2-3-4-5: each round's local-max-by-id layer is the current
    // largest endpoint — sel0={5}, sel1={4}, sel2={3}, sel3={2}, rest={1}
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = graft.queries.Wave43.greedyColorClasses(g, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 0L, 4L -> 1L, 3L -> 2L, 2L -> 3L, 1L -> -1L))
    spark.catalog.clearCache()
  }

  test("greedyColorClasses: a star colors in two rounds either way") {
    // star centered at 10 with leaves 1..4: center is the local max ->
    // color 0; all leaves then have no uncolored neighbor -> color 1
    val g = edges((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
    val got = graft.queries.Wave43.greedyColorClasses(g, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 0L)
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    spark.catalog.clearCache()
  }

  test("every non-remainder color class is INDEPENDENT on a planted graph") {
    // K4 plus a triangle sharing vertex 4 — adversarial overlap
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val classes = graft.queries.Wave43.greedyColorClasses(g, rounds = 4)
      .where(col("color") >= 0L)
    val m1 = classes.select(col("x").as("u"), col("color").as("cu"))
    val m2 = classes.select(col("x").as("v"), col("color").as("cv"))
    val conflicts = g.join(m1, Seq("u")).join(m2, Seq("v"))
      .where(col("cu") === col("cv")).count()
    assert(conflicts == 0L, s"$conflicts same-color edges")
    spark.catalog.clearCache()
  }
}
