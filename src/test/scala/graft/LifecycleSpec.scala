package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the survival / density-cluster / recommender wave:
  * brute-force twins at sf0.001 plus the structural laws each estimator
  * must satisfy regardless of corpus. */
class LifecycleSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("q_survival: KM laws hold and match the brute-force estimator") {
    val rows = SparkEntry.queries("q_survival")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // n_risk strictly decreasing over death times, d bounded by n_risk,
    // km_log non-increasing (survival only falls)
    rows.sliding(2).foreach { case Array((_, _, n1, s1), (_, _, n2, s2)) =>
      assert(n1 > n2); assert(s1 >= s2)
    case _ => ()
    }
    rows.foreach { case (_, d, n, s) =>
      assert(d >= 1 && d <= n); assert(s <= 0.0)
    }
    // brute force from raw events (hour grain, tau = 72)
    val e = graft.queries.table(spark, Sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val first = e.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val purch = e.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val tau = 72L
    val subj = first.toSeq.map { case (u, fh) =>
      purch.get(u) match {
        case Some(ph) if ph - fh <= tau => (ph - fh, true)
        case Some(_) => (tau, false)
        case None => (tau, false)
      }
    }
    val total = subj.size
    val byDur = subj.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.count(_._2).toLong)).toMap
    val durs = byDur.keys.toSeq.sorted
    var atRisk = total.toLong
    var logSum = BigDecimal(0)
    val want = durs.flatMap { t =>
      val (nTot, d) = byDur(t)
      val out = if (d > 0) {
        val contrib = BigDecimal(math.log((atRisk - d).toDouble / atRisk))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        logSum += contrib
        Some((t, d, atRisk,
          logSum.toDouble)) // cast exact decimal → double, then compare rounded
      } else {
        // zero-death durations still contribute ln(1)=0 — nothing to add
        None
      }
      atRisk -= nTot
      out
    }
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      want.map(w => (w._1, w._2, w._3)))
    rows.zip(want).foreach { case ((_, _, _, got), (_, _, _, raw)) =>
      assert(math.abs(got - BigDecimal(raw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q_dbscan: clusters are exactly the connected core-cell components") {
    val rows = SparkEntry.queries("q_dbscan")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force: PRF-place event points, grid, core cells, union-find
    val pts = spark.read.parquet(s"$Sf/events.parquet")
      .select("event_id").collect().map(_.getLong(0))
    def prf(prefix: String, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$prefix-$k".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1048576L
    }
    val cells = pts.map(u => (prf("px", u) / 16384L, prf("py", u) / 16384L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val core = cells.filter(_._2 >= 3)
    val parent = collection.mutable.Map[(Long, Long), (Long, Long)]()
    def find(x: (Long, Long)): (Long, Long) = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (a <- core.keys; b <- core.keys
         if a != b && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1)
      parent(find(a)) = find(b)
    val comps = core.keys.groupBy(find).map { case (_, members) =>
      val ids = members.map { case (gx, gy) => gx * 64 + gy }
      (ids.min, ids.size.toLong, members.map(core).sum)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == comps)
    // each core cell holds >= 3 points by definition
    rows.foreach { case (_, nc, np) => assert(np >= 3 * nc) }
  }

  test("q_scd2_asof: every probe gets the greatest version at-or-before it") {
    val rows = SparkEntry.queries("q_scd2_asof")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val e = graft.queries.table(spark, Sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = e.groupBy(_._2)
    val want = e.filter(_._3 == "purchase").sortBy(_._1).map {
      case (id, u, _, us) =>
        val probe = us - 3600000000L
        val vs = byUser(u).filter(_._4 <= probe)
        if (vs.isEmpty) (id, None)
        else {
          val best = vs.maxBy(v => (v._4, v._1))
          (id, Some((best._1, best._4)))
        }
    }
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (r, (id, exp)) =>
      assert(r.getLong(0) == id)
      exp match {
        case Some((vid, vf)) =>
          assert(r.getLong(1) == vid && r.getLong(2) == vf)
        case None => assert(r.isNullAt(1) && r.isNullAt(2))
      }
    }
  }

  test("q_silhouette: scores in [0,1), cluster sizes match q_kmeans") {
    val sil = SparkEntry.queries("q_silhouette")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val km = SparkEntry.queries("q_kmeans")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sil.nonEmpty)
    sil.foreach { case (cid, n, s) =>
      // own centroid is the argmin, so a <= b and s in [0, 1)
      assert(s >= 0.0 && s < 1.0, s"cid=$cid mean_sil=$s")
      assert(km(cid) == n)
    }
    assert(sil.map(_._2).sum == km.values.sum)
  }

  test("q_zorder_prune: pruning is lossless and z-files are 2-D-tighter") {
    val rows = SparkEntry.queries("q_zorder_prune")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("natural", "zorder"))
    val Seq(nat, z) = rows.toSeq
    // losslessness: both layouts find the same matching rows, and every
    // matched row lives in a scanned file
    assert(nat._5 == z._5)
    assert(nat._4 >= nat._5 && z._4 >= z._5)
    // pruned files stay within the layout's file count
    assert(nat._3 <= nat._2 && z._3 <= z._2)
    // the z layout never scans MORE than natural (2-D locality dominates
    // a 1-D sort for a 2-D box) — the reason the layout exists
    assert(z._4 <= nat._4, s"zorder scanned ${z._4} > natural ${nat._4}")
  }

  test("q_infogain: mutual information is non-negative") {
    val rows = SparkEntry.queries("q_infogain")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq == Seq("len_band", "source"))
    // MI >= 0 up to the 8-decimal contribution rounding
    rows.foreach { case (f, mi) => assert(mi >= -1e-6, s"$f mi=$mi") }
  }

  test("q_drawdown: equity/peak/dd laws hold on the daily curve") {
    val rows = SparkEntry.queries("q_drawdown")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    var cum = 0L; var peak = Long.MinValue
    rows.foreach { case (_, rev, equity, p, dd) =>
      cum += rev; peak = math.max(peak, cum)
      assert(equity == cum && p == peak && dd == peak - cum)
      assert(dd >= 0)
    }
  }

  test("q_luhn: the checksum catches every planted single-digit corruption") {
    val r = SparkEntry.queries("q_luhn")(spark, Sf).collect().head
    val (n, valid, invalid) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val nCorrupt = spark.read.parquet(s"$Sf/customer.parquet")
      .where(col("c_custkey") % 7 === 0).count()
    assert(n == valid + invalid)
    assert(invalid == nCorrupt, s"Luhn missed a single-digit error: " +
      s"invalid=$invalid corrupted=$nCorrupt")
    assert(valid == n - nCorrupt)
  }

  test("q_item2item: cosine formula and support floor verified by brute force") {
    val rows = SparkEntry.queries("q_item2item")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 50)
    val baskets = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ni = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val co = baskets.groupBy(_._1).values.toSeq.flatMap { items =>
      val is = items.map(_._2).sorted.toSeq
      for (x <- is; y <- is if x < y) yield (x, y)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = co.filter(_._2 >= 2).map { case ((a, b), c) =>
      val cos = c / math.sqrt((ni(a) * ni(b)).toDouble)
      (a, b, c,
        BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(50)
    assert(rows.toSeq == want)
  }
}
