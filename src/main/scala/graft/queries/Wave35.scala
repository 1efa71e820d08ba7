package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-35 addition — the LSH banding-config planner:
  *
  *  - q_lsh_planner: for three bandings of the SAME 16-minhash signature
  *    table — (b bands × r rows) ∈ {(2,8), (4,4), (8,2)} — the ACTUAL
  *    candidate-pair volume the dedup join would pay, bucket-size
  *    structure, and what the BandBucketCap=64 discipline would drop.
  *    This closes the dedup planning loop the way q_bloom_planner /
  *    q_bloom_fpp_measured close the membership-filter loop: pick the
  *    banding from measured volume, not the textbook S-curve alone
  *    (more rows per band ⇒ stricter buckets ⇒ fewer candidates).
  *    Counts only — Σ n(n−1)/2 per bucket; no pair row is ever
  *    materialized, and the pair sums run 128-bit (a degenerate bucket
  *    of 10⁹ docs squares past int64).
  */
object Wave35 {

  /** Banding configs over the 16-hash family: b·r = 16. */
  private val Configs = Seq((2, 8), (4, 4), (8, 2))

  val queries: Map[String, Q] = strictMap(

    // ONE signature aggregation (ckpt'd — all three configs read it);
    // per config a narrow band-value stack + one partial-agg'd bucket
    // count; outputs are 3 metadata rows.
    "q_lsh_planner" -> ((s, dir) => {
      val sig = LlmOps.repSignatures(s, dir).ckpt()
      Configs.map { case (b, r) =>
        val bandCols = (0 until b).map(i =>
          concat_ws("-", (0 until r).map(j => col(s"h${i * r + j}")): _*)
            .as(s"b$i"))
        val buckets = sig.select(col("doc_id") +: bandCols: _*)
          .selectExpr("doc_id",
            s"stack($b, ${(0 until b).map(i => s"$i, b$i").mkString(", ")})" +
              " AS (band, v)")
          .groupBy("band", "v").agg(count(lit(1)).as("n"))
        buckets.agg(
            count(lit(1)).as("nb"),
            sum(when(col("n") === 1, 1L).otherwise(0L)).as("ns"),
            sum(when(col("n") > LlmOps.BandBucketCap, 1L).otherwise(0L))
              .as("noc"),
            sum(when(col("n") <= LlmOps.BandBucketCap,
              expr("CAST(n AS DECIMAL(19,0)) * (n - 1) / 2"))
              .otherwise(expr("CAST(0 AS DECIMAL(19,0))"))).as("cp"),
            sum(when(col("n") > LlmOps.BandBucketCap,
              expr("CAST(n AS DECIMAL(19,0)) * (n - 1) / 2"))
              .otherwise(expr("CAST(0 AS DECIMAL(19,0))"))).as("dp"))
          .selectExpr(s"CAST($b AS BIGINT) AS bands",
            s"CAST($r AS BIGINT) AS rows_per_band",
            "CAST(nb AS BIGINT) AS n_buckets",
            "CAST(ns AS BIGINT) AS n_singleton",
            "CAST(noc AS BIGINT) AS n_over_cap",
            "CAST(cp AS BIGINT) AS cand_pairs",
            "CAST(dp AS BIGINT) AS dropped_pairs")
      }.reduce(_ unionByName _).orderBy("bands")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_lsh_planner" -> {
      val cap = LlmOps.BandBucketCap
      val per = Configs.map { case (b, r) =>
        val stackRows = (0 until b).map { i =>
          val v = (0 until r).map(j => s"h${i * r + j}").mkString(" || '-' || ")
          s"SELECT doc_id, $i AS band, $v AS v FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""buckets${b} AS (
           |  SELECT band, v, count(*) AS n FROM (
           |$stackRows
           |  ) GROUP BY band, v
           |),
           |row${b} AS (
           |  SELECT CAST($b AS BIGINT) AS bands,
           |    CAST($r AS BIGINT) AS rows_per_band,
           |    CAST(count(*) AS BIGINT) AS n_buckets,
           |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_singleton,
           |    CAST(sum(CASE WHEN n > $cap THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_over_cap,
           |    CAST(sum(CASE WHEN n <= $cap
           |      THEN CAST(n AS HUGEINT) * (n - 1) // 2
           |      ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS cand_pairs,
           |    CAST(sum(CASE WHEN n > $cap
           |      THEN CAST(n AS HUGEINT) * (n - 1) // 2
           |      ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS dropped_pairs
           |  FROM buckets${b}
           |)""".stripMargin
      }.mkString(",\n")
      val out = Configs.map { case (b, _) => s"SELECT * FROM row$b" }
        .mkString("\nUNION ALL\n")
      s"""WITH ${LlmOps.MinhashSigSql},
         |$per
         |$out
         |ORDER BY bands""".stripMargin
    },
  )
}
