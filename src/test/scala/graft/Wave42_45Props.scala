package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the wave-42 peeling ladder and the wave-45
  * ancestor closure against independent in-memory references (the
  * EncodeWordProps pattern: same semantics, different machinery — a Spark
  * plan vs a handful of Scala loops). Seeded, so failures reproduce. */
class Wave42_45Props extends AnyFunSuite with SparkFixture {

  private val rng = new scala.util.Random(42)

  /** In-memory Bahmani peel: returns (V, E) per round, 0-padded. */
  private def refPeel(edges: Set[(Long, Long)], rounds: Int): Seq[(Long, Long)] = {
    var e = edges
    (0 to rounds).map { r =>
      val vs = e.flatMap(p => Seq(p._1, p._2))
      val row = (vs.size.toLong, e.size.toLong)
      if (r < rounds && e.nonEmpty) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val keep = vs.filter(v => 10L * deg(v) * vs.size > 22L * e.size)
        e = e.filter(p => keep(p._1) && keep(p._2))
      } else if (r < rounds) e = Set.empty
      row
    }
  }

  test("peelLadder matches an in-memory reference on random graphs") {
    import spark.implicits._
    for (_ <- 1 to 4) {
      val n = 8 + rng.nextInt(6)
      val edges = (for {
        u <- 1L to n.toLong; v <- (u + 1) to n.toLong
        if rng.nextDouble() < 0.35
      } yield (u, v)).toSet
      if (edges.nonEmpty) {
        val got = graft.queries.Wave42
          .peelLadder(edges.toSeq.toDF("u", "v"), rounds = 3)
          .collect()
          .map(r => (r.getLong(1), r.getLong(2)))
          .toSeq
        assert(got == refPeel(edges, 3), s"edges=$edges")
      }
    }
    spark.catalog.clearCache()
  }

  /** In-memory parent-chain walk with path products (parent = k div 10). */
  private def refClosure(keys: Set[Long]): Map[(Long, Long), Long] = {
    val out = scala.collection.mutable.Map[(Long, Long), Long]()
    for (v <- keys) {
      var a = v
      var q = 1L
      out((v, a)) = q
      while (a >= 10) {
        q *= a % 3 + 1
        a = a / 10
        out((v, a)) = q
      }
    }
    out.toMap
  }

  test("closeAncestors matches an in-memory chain walk on random key sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (_ <- 1 to 4) {
      val keys0 = Set.fill(10)(1L + rng.nextInt(99999).toLong)
      // close the set under parents so the reference's chain targets exist
      val keys = keys0.flatMap(v =>
        Iterator.iterate(v)(_ / 10).takeWhile(_ >= 1).toSet + v)
      val parts = keys.toSeq.toDF("v")
      val base = parts.select(col("v"), col("v").as("a"), lit(1L).as("q"))
        .unionAll(parts.where(col("v") >= 10L)
          .select(col("v"), expr("v div 10").as("a"),
            expr("v % 3 + 1").as("q")))
      val got = graft.queries.Wave45.closeAncestors(base, rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val want = refClosure(keys)
      // the doubling closure must cover every (v, ancestor) pair the chain
      // walk finds, with the same product, and nothing else
      assert(got == want,
        s"keys=$keys missing=${want.keySet -- got.keySet} " +
          s"extra=${got.keySet -- want.keySet}")
    }
    spark.catalog.clearCache()
  }
}
