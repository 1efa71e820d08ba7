package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-23 additions: split hygiene, order-statistic inference, and
  * sketch sizing —
  *
  *  - q_split_leakage: near-duplicate pairs CROSSING the train/val/test
  *    split (q_split_train's hash buckets × the verified MinHash
  *    channel) — the leakage audit the dedup papers run before trusting
  *    held-out metrics; a test doc with a jac ≥ 0.5 twin in train IS
  *    contamination even when no benchmark shingle matches,
  *  - q_median_ci: distribution-free (binomial order-statistic) 95%
  *    confidence interval for the per-event-type median — rank-selected
  *    exact values, no bootstrap, no whole-group buffer,
  *  - q_bloom_planner: Bloom-filter sizing (m bits, k hashes) per
  *    event-type audience at 1% and 0.1% target FPP — the closed-form
  *    planning table behind q_sketch_bloom/q_join_bloom's fixed
  *    constants.
  *
  * Determinism: split assignment is the md5 bucket; CI ranks derive
  * from one identically-spelled sqrt chain then select exact values;
  * bloom constants are pre-folded literals (ln never evaluated at
  * query time). */
object Wave23 {

  /** bits/key = ln(1/p)/ln(2)² and k = round(bits/key · ln 2), folded
    * to literals at build time so no engine evaluates a libm ln. */
  private val BloomPlans: Seq[(Int, String, Int)] = Seq(
    (100, "9.58505960", 7),   // p = 1%   (100 basis points)
    (10, "14.37758940", 10))  // p = 0.1% (10 basis points)

  val queries: Map[String, Q] = strictMap(

    // SPLIT LEAKAGE: every verified LSH candidate pair labeled with its
    // endpoints' splits; leaky = cross-split AND jac ≥ 0.5 (the same
    // identically-derived double both engines compute). Output = the
    // leaky pair listing with the summary constants on every row. The
    // verified channel keeps its capped-bucket discipline; the split
    // join is two broadcast-scale probes of the doc table.
    "q_split_leakage" -> ((s, dir) => {
      val splits = table(s, dir, "documents")
        .selectExpr("doc_id", s"$HashBucketSpark AS bucket")
        .selectExpr("doc_id",
          "CASE WHEN bucket < 80 THEN 'train'" +
            " WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split")
      val pairs = LlmOps.verifiedJaccard(s, dir)
        .join(splits.select(col("doc_id").as("d1"),
          col("split").as("split1")), "d1")
        .join(splits.select(col("doc_id").as("d2"),
          col("split").as("split2")), "d2")
        .ckpt() // feeds the summary + the leaky listing
      val summary = pairs.agg(count(lit(1)).as("n_cand"),
        sum(when(col("split1") =!= col("split2"), 1L).otherwise(0L))
          .as("n_cross"),
        sum(when(col("split1") =!= col("split2") && col("jac") >= 0.5, 1L)
          .otherwise(0L)).as("n_leaky"))
      pairs.where(col("split1") =!= col("split2") && col("jac") >= 0.5)
        .crossJoin(broadcast(summary))
        .selectExpr("d1", "d2", "split1", "split2",
          "round(jac, 4) AS jac", "CAST(n_cand AS BIGINT) AS n_cand",
          "CAST(n_cross AS BIGINT) AS n_cross",
          "CAST(n_leaky AS BIGINT) AS n_leaky",
          "CASE WHEN n_cross = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_leaky AS DOUBLE) / n_cross, 4)" +
            " END AS leak_rate")
        .orderBy("d1", "d2")
    }),

    // MEDIAN CI: the binomial bound ranks lo = max(1, floor((n −
    // 1.96√n)/2)), hi = min(n, ceil(1 + (n + 1.96√n)/2)) — one
    // identically-spelled float chain producing INTEGER ranks, then the
    // distributed Ranks pass selects the exact values at lo/median/hi.
    // No bootstrap resamples, no per-group sort buffer.
    "q_median_ci" -> ((s, dir) => {
      val v = table(s, dir, "events")
        .selectExpr("event_type",
          "CAST(floor(value*100 + 0.5) AS BIGINT) AS v", "event_id")
      val ranked = graft.operators.Ranks
        .withinKey(v, "event_type", Seq("v", "event_id"))
        .ckpt() // feeds the per-type n + the three rank picks
      val n = ranked.groupBy("event_type").agg(max("rk").as("n"))
      val withN = ranked.join(n, "event_type")
        .withColumn("lo", expr("greatest(CAST(1 AS BIGINT)," +
          " CAST(floor((n - 1.96 * sqrt(n)) / 2) AS BIGINT))"))
        .withColumn("hi", expr("least(n," +
          " CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2) AS BIGINT))"))
        .withColumn("md", expr("(n + 1) DIV 2"))
      withN.where(expr("rk = lo OR rk = md OR rk = hi"))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          min(when(expr("rk = lo"), col("v"))).as("vlo"),
          min(when(expr("rk = md"), col("v"))).as("vmd"),
          min(when(expr("rk = hi"), col("v"))).as("vhi"))
        .selectExpr("event_type", "CAST(n AS BIGINT) AS n",
          "round(CAST(vmd AS DOUBLE) / 100, 2) AS median",
          "round(CAST(vlo AS DOUBLE) / 100, 2) AS ci_lo",
          "round(CAST(vhi AS DOUBLE) / 100, 2) AS ci_hi")
        .orderBy("event_type")
    }),

    // BLOOM PLANNER: per event-type distinct-user audience n → m =
    // ceil(n · bits/key) and the pre-folded k, at 1% and 0.1% FPP.
    // One distinct shuffle; the 2× plan expansion is metadata. m_mib
    // prices the broadcast (q_join_bloom ships exactly such a filter).
    "q_bloom_planner" -> ((s, dir) => {
      val aud = table(s, dir, "events")
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_keys"))
      val plans = BloomPlans.map { case (bp, bpk, k) =>
        aud.selectExpr("event_type", s"CAST($bp AS BIGINT) AS fpp_bp",
          "CAST(n_keys AS BIGINT) AS n_keys",
          s"CAST(ceil(n_keys * $bpk) AS BIGINT) AS m_bits",
          s"CAST($k AS BIGINT) AS k_hashes",
          s"round(CAST(ceil(n_keys * $bpk) AS DOUBLE) / 8388608, 4)" +
            " AS m_mib")
      }
      plans.reduce(_ unionByName _).orderBy(col("event_type"), desc("fpp_bp"))
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_split_leakage" ->
      s"""WITH ${LlmOps.MinhashSigSql},
         |${LlmOps.BandsSql},
         |${LlmOps.VerifiedJacSql},
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train'
         |         WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id, $hashBucketSql AS b FROM documents)
         |),
         |lab AS (
         |  SELECT vj.d1, vj.d2, vj.jac, s1.split AS split1,
         |    s2.split AS split2
         |  FROM vj JOIN sp s1 ON s1.doc_id = vj.d1
         |          JOIN sp s2 ON s2.doc_id = vj.d2
         |),
         |summary AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(sum(CASE WHEN split1 <> split2 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_cross,
         |    CAST(sum(CASE WHEN split1 <> split2 AND jac >= 0.5
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky
         |  FROM lab
         |)
         |SELECT d1, d2, split1, split2, round(jac, 4) AS jac,
         |  n_cand, n_cross, n_leaky,
         |  CASE WHEN n_cross = 0 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(n_leaky AS DOUBLE) / n_cross, 4)
         |  END AS leak_rate
         |FROM lab CROSS JOIN summary
         |WHERE split1 <> split2 AND jac >= 0.5
         |ORDER BY d1, d2""".stripMargin,

    "q_median_ci" ->
      """WITH v AS (
        |  SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
        |    event_id
        |  FROM events
        |),
        |r AS (
        |  SELECT event_type, v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM v
        |),
        |b AS (
        |  SELECT event_type, v, rk, n,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(floor((n - 1.96 * sqrt(n)) / 2) AS BIGINT)) AS lo,
        |    least(n,
        |      CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2) AS BIGINT)) AS hi,
        |    (n + 1) // 2 AS md
        |  FROM r
        |)
        |SELECT event_type, max(n) AS n,
        |  round(CAST(min(CASE WHEN rk = md THEN v END) AS DOUBLE) / 100, 2)
        |    AS median,
        |  round(CAST(min(CASE WHEN rk = lo THEN v END) AS DOUBLE) / 100, 2)
        |    AS ci_lo,
        |  round(CAST(min(CASE WHEN rk = hi THEN v END) AS DOUBLE) / 100, 2)
        |    AS ci_hi
        |FROM b WHERE rk = lo OR rk = md OR rk = hi
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bloom_planner" -> {
      def side(bp: Int, bpk: String, k: Int) =
        s"""SELECT event_type, CAST($bp AS BIGINT) AS fpp_bp,
           |  CAST(n_keys AS BIGINT) AS n_keys,
           |  CAST(ceil(n_keys * $bpk) AS BIGINT) AS m_bits,
           |  CAST($k AS BIGINT) AS k_hashes,
           |  round(CAST(ceil(n_keys * $bpk) AS DOUBLE) / 8388608, 4)
           |    AS m_mib
           |FROM aud""".stripMargin
      s"""WITH aud AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_keys
         |  FROM events GROUP BY event_type
         |)
         |${BloomPlans.map { case (bp, bpk, k) => side(bp, bpk, k) }
          .mkString("\nUNION ALL\n")}
         |ORDER BY event_type, fpp_bp DESC""".stripMargin
    },
  )
}
