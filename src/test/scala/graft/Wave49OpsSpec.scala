package graft

import org.scalatest.funsuite.AnyFunSuite

/** The consistent-hash ring's defining properties on harness data. */
class Wave49OpsSpec extends AnyFunSuite with SparkFixture {

  test("ring scale-out moves keys ONLY to the new shard (monotone movement)") {
    val rows = graft.queries.Wave49
      .queries("q_consistent_hash_ring")(spark, Sf).collect()
    assert(rows.length == 5)
    val byShard = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // the new shard starts empty and gains everything that moved
    assert(byShard(4L)._1 == 0L)
    assert(byShard(4L)._2 > 0L, "scale-out moved nothing — ring degenerate")
    // old shards never GAIN keys when a shard is added (they only donate)
    for (s <- 0L to 3L)
      assert(byShard(s)._2 <= byShard(s)._1, s"shard $s gained keys: $byShard")
    // conservation: both placements cover every doc exactly once
    assert(rows.map(_.getLong(1)).sum == rows.map(_.getLong(2)).sum)
    spark.catalog.clearCache()
  }
}
