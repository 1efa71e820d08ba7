package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the two round-5 iterative-operator fixes:
  * stats-truncating checkpoints (Ckpt) and Shiloach–Vishkin hooking in
  * ConnectedComponents. Both bugs only detonate on inputs needing many
  * rounds, so each is pinned by a construction that forces the rounds.
  */
class CkptSpec extends AnyFunSuite with SparkFixture {

  /** One self-joining "round" of the shape every iterative operator uses:
    * the Catalyst size estimator multiplies the join children's sizes, so
    * whatever stats the checkpoint carries forward get SQUARED here. */
  private def round(df: org.apache.spark.sql.DataFrame) = {
    val j = df.as("x").join(df.as("y"), col("x.l") === col("y.v"))
      .select(col("x.v").as("v"), col("y.l").as("l"))
    j.unionByName(df).groupBy("v").agg(min(col("l")).as("l"))
  }

  test("plain localCheckpoint compounds estimated stats; ckpt does not") {
    import spark.implicits._
    import graft.operators.Ckpt._
    val base = (0L to 99L).map(v => (v, v)).toDF("v", "l")

    var plain = base.localCheckpoint()
    var fixed = base.ckpt()
    for (_ <- 1 to 8) {
      plain = round(plain).localCheckpoint()
      fixed = round(fixed).ckpt()
    }
    val plainBits = plain.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    val fixedBits = fixed.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    // 8 squarings from a ~2^12-byte base → thousands of bits if carried
    // estimates compound (the round-18 version of this hangs the planner
    // for hours); measured stats stay at real-data size.
    assert(plainBits > 500, s"expected compounding without the fix, got $plainBits bits")
    assert(fixedBits < 64, s"ckpt stats must be real-size, got $fixedBits bits")
  }

  test("ckpt preserves rows, schema, and values exactly") {
    import spark.implicits._
    import graft.operators.Ckpt._
    val df = (1L to 1000L).map(v => (v, s"s$v", v * 0.5)).toDF("a", "b", "c")
    val ck = df.ckpt()
    assert(ck.schema == df.schema)
    assert(ck.orderBy("a").collect().toSeq == df.orderBy("a").collect().toSeq)
  }

  test("CC converges in O(log) rounds on a row-major grid (id-plateau case)") {
    import spark.implicits._
    // 30×30 4-neighbor grid, ids row-major: the min label must cross the
    // whole grid; without hooking this takes ~diameter rounds (measured
    // live: a 64×64 blob was still moving at round 60 under the cap).
    val n = 30
    val edges = (for {
      x <- 0 until n; y <- 0 until n
      (dx, dy) <- Seq((1, 0), (0, 1))
      if x + dx < n && y + dy < n
    } yield ((x * n + y).toLong, ((x + dx) * n + (y + dy)).toLong))
      .toDF("a", "b")
    val (labels, rounds) = graft.operators.ConnectedComponents.labels(edges)
    val out = labels.agg(countDistinct(col("l")), min(col("l")), count(lit(1)))
      .collect()(0)
    assert(out.getLong(0) == 1L, "grid must be one component")
    assert(out.getLong(1) == 0L, "label must be the component minimum")
    assert(out.getLong(2) == (n * n).toLong)
    assert(rounds <= 15, s"hooking bound: expected ≤15 rounds, took $rounds")
  }
}
