package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-18 corpus-law / recall-audit queries
  * at sf0.001 — laws the value gate cannot express (fit direction and
  * bounds, cumulative monotonicity and end-point identities, recall ≤ 1
  * and its macro identity against the lossless truth channel). */
class Wave18OpsSpec extends AnyFunSuite with SparkFixture {

  test("zipf_fit: slope is negative (frequency decays in rank), " +
    "r2 in [0,1], head size bounded by 100") {
    val rows = SparkEntry.queries("q_zipf_fit")(spark, Sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) >= 2 && r.getLong(0) <= 100)
    assert(r.getDouble(1) < 0, s"zipf slope must be negative: ${r.getDouble(1)}")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-9,
      s"r2 out of range: ${r.getDouble(3)}")
  }

  test("heaps_law: cumulative tokens/vocab nondecreasing, vocab <= tokens, " +
    "end points equal the corpus totals, beta in (0, 1]") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_heaps_law")(spark, Sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1), "cum_tokens must be nondecreasing")
      assert(a.getLong(2) <= b.getLong(2), "cum_vocab must be nondecreasing")
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "vocab cannot exceed token count"))
    val toks = graft.queries.corpusToks(spark, Sf)
    val total = toks.count()
    val vocab = toks.select(countDistinct(col("word"))).head().getLong(0)
    assert(rows.last.getLong(1) == total,
      s"final cum_tokens ${rows.last.getLong(1)} != corpus tokens $total")
    assert(rows.last.getLong(2) == vocab,
      s"final cum_vocab ${rows.last.getLong(2)} != corpus vocab $vocab")
    // beta = 0 is legitimate on a saturated corpus (sf0.001's fixed
    // vocabulary is fully seen in the first decile — the flat line IS
    // the law's answer); growth can never be superlinear
    val beta = rows.head.getDouble(3)
    assert(beta >= 0 && beta <= 1.0 + 1e-9,
      s"Heaps beta out of [0,1]: $beta (vocabulary growth is sublinear)")
  }

  test("minhash_recall: per-decile recall in [0,1] with n_caught <= n_true, " +
    "totals are the bucket sums, truth total equals the prefix-join rows") {
    val rows = SparkEntry.queries("q_minhash_recall")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val (tt, ct, nc) = (rows.head.getLong(4), rows.head.getLong(5),
      rows.head.getLong(6))
    for (r <- rows) {
      assert(r.getLong(0) >= 8 && r.getLong(0) <= 10,
        s"jac decile of a >=0.8 pair must be 8..10: ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(1), "caught cannot exceed truth")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getLong(4) == tt && r.getLong(5) == ct && r.getLong(6) == nc,
        "totals must be scalar across rows")
    }
    assert(rows.map(_.getLong(1)).sum == tt, "n_true_total is the bucket sum")
    assert(rows.map(_.getLong(2)).sum == ct, "n_caught_total is the bucket sum")
    assert(ct <= nc, "every caught-true pair is an LSH candidate")
    val prefixRows = SparkEntry.queries("q_prefix_join")(spark, Sf).count()
    assert(tt == prefixRows,
      s"truth total $tt != q_prefix_join rows $prefixRows (same chain)")
  }
}
