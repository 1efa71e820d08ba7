package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the wave-28 overlap/reciprocity/cardinality
  * queries at sf0.001. */
class Wave28OpsSpec extends AnyFunSuite with SparkFixture {

  test("audience_overlap: C(k,2) pairs, set algebra bounds hold, " +
    "lift reprices the independence product") {
    val rows = SparkEntry.queries("q_audience_overlap")(spark, Sf).collect()
    val k = spark.read.parquet(s"$Sf/events.parquet")
      .select("event_type").distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2)
    val nu = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    for (r <- rows) {
      val (na, nb, co) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(co <= math.min(na, nb))
      assert(co >= math.max(0L, na + nb - nu),
        "inclusion-exclusion against the universe")
      assert(math.abs(r.getDouble(5) - co.toDouble / (na + nb - co)) < 1e-5)
      assert(math.abs(r.getDouble(6) -
        co.toDouble * nu / (na.toDouble * nb)) < 1e-5)
    }
  }

  test("reciprocity: ratio in [0,1], asymmetry in [0,1], and the " +
    "asymmetry is 0 iff every edge is flow-balanced") {
    val r = SparkEntry.queries("q_reciprocity")(spark, Sf).head()
    val (ne, nr) = (r.getLong(0), r.getLong(1))
    assert(nr <= ne)
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    assert(math.abs(r.getDouble(2) - nr.toDouble / ne) < 1e-5)
  }

  test("join_card_audit: FK joins satisfy containment (est_ratio = 1) " +
    "when child keys are a subset of parent keys") {
    val rows = SparkEntry.queries("q_join_card_audit")(spark, Sf).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val (nl, nr2, dl, dr2, actual) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(actual >= 0 && dl <= nl && dr2 <= nr2)
      val est = nl.toDouble * nr2 / math.max(dl, dr2)
      assert(math.abs(r.getDouble(6) - est) < 0.5 + est * 1e-9)
      if (!r.isNullAt(7))
        assert(math.abs(r.getDouble(7) - est / actual) < 1e-4)
      // orders→lineitem: every lineitem orderkey exists in orders and
      // orders keys are unique → containment is exact
      if (r.getString(0) == "orders_x_lineitem") {
        assert(dl == nl, "o_orderkey is unique")
        assert(math.abs(r.getDouble(7) - 1.0) < 1e-6,
          "clean FK join: estimator is exact")
      }
    }
  }
}
