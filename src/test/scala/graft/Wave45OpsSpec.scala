package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-chain pins for the wave-45 ancestor-closure doubling. */
class Wave45OpsSpec extends AnyFunSuite with SparkFixture {

  test("closeAncestors: planted div-10 chain closes with exact path products") {
    import spark.implicits._
    // forest under parent(k) = k div 10: 1234 -> 123 -> 12 -> 1, plus 7
    val vs = Seq(1L, 12L, 123L, 1234L, 7L)
    val parts = vs.toDF("v")
    val base = parts.select(col("v"), col("v").as("a"), lit(1L).as("q"))
      .unionAll(parts.where(col("v") >= 10L)
        .select(col("v"), expr("v div 10").as("a"), expr("v % 3 + 1").as("q")))
    val anc = graft.queries.Wave45.closeAncestors(base, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // qty(12) = 12%3+1 = 1, qty(123) = 123%3+1 = 1, qty(1234) = 1234%3+1 = 2
    assert(anc((1234L, 123L)) == 2L)
    assert(anc((1234L, 12L)) == 2L * 1L)
    assert(anc((1234L, 1L)) == 2L * 1L * 1L)
    assert(anc((123L, 1L)) == 1L)
    assert(anc((7L, 7L)) == 1L)
    // closure size: reflexive 5 + chain pairs 3+2+1 = 11, no duplicates
    assert(anc.size == 11)
    // every vertex's depth (proper ancestors) matches its digit count - 1
    val depths = anc.keys.groupBy(_._1).view.mapValues(_.size - 1).toMap
    assert(depths == Map(1L -> 0, 12L -> 1, 123L -> 2, 1234L -> 3, 7L -> 0))
    spark.catalog.clearCache()
  }
}
