package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-32 additions — weak-supervision and feature-engineering audits
  * (the Mst operator landed alongside, spec-gated like Scc):
  *
  *  - q_weak_supervision: the Snorkel-style labeling-function analysis —
  *    three deterministic md5-derived LFs (varying coverage and accuracy,
  *    abstentions allowed) over the documents table; per-LF coverage /
  *    overlap / conflict / empirical accuracy plus the majority-vote
  *    row — the audit a weak-supervision pipeline runs before training
  *    a label model.
  *  - q_woe_binning: equal-frequency (quartile) binning of the event
  *    value by distributed rank selection, weight-of-evidence encoding
  *    per bin against the purchase/non-purchase target, and the total
  *    information value — the classic credit-scoring / feature-screening
  *    transform.
  *
  * Determinism: LF votes are integer md5 algebra; bins come from an
  * exact (vq, event_id)-total-order rank; WoE is round-8 ln of
  * bit-identical double arguments (correctly-rounded divisions of exact
  * integers, identical spelling both engines); IV is a decimal sum of
  * round-8 terms. */
object Wave32 {

  /** LF j abstains when h % 10 < 3 + j and flips the truth when
    * h % 100 < 10 + 5j — coverage and accuracy both vary by LF. */
  private def lfVoteSpark(j: Int): String = {
    val h = s"CAST(conv(substring(md5(concat('lf-$j:', " +
      s"CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    s"CASE WHEN $h % 10 < ${3 + j} THEN CAST(-1 AS BIGINT) " +
      s"WHEN $h % 100 < ${10 + 5 * j} THEN 1 - y ELSE y END"
  }

  private def lfVoteSql(j: Int): String = {
    val h = hex2longSql(s"md5('lf-$j:' || doc_id)", 1)
    s"CASE WHEN $h % 10 < ${3 + j} THEN CAST(-1 AS BIGINT) " +
      s"WHEN $h % 100 < ${10 + 5 * j} THEN 1 - y ELSE y END"
  }

  private val WoeBins = 4

  val queries: Map[String, Q] = strictMap(

    // WEAK SUPERVISION: one corpus scan computes all three votes + the
    // truth as columns (no explode), one 1-row aggregate collects every
    // pairwise/majority statistic, and the 4-row output is a stack over
    // that metadata row — corpus-linear with a single shuffle.
    "q_weak_supervision" -> ((s, dir) => {
      val v = table(s, dir, "documents")
        .select(col("doc_id"), (col("n_chars") % 2).as("y"))
        .withColumn("v0", expr(lfVoteSpark(0)))
        .withColumn("v1", expr(lfVoteSpark(1)))
        .withColumn("v2", expr(lfVoteSpark(2)))
        .withColumn("c1", expr(
          "CASE WHEN v0 = 1 THEN 1 ELSE 0 END + CASE WHEN v1 = 1 THEN 1" +
            " ELSE 0 END + CASE WHEN v2 = 1 THEN 1 ELSE 0 END"))
        .withColumn("c0", expr(
          "CASE WHEN v0 = 0 THEN 1 ELSE 0 END + CASE WHEN v1 = 0 THEN 1" +
            " ELSE 0 END + CASE WHEN v2 = 0 THEN 1 ELSE 0 END"))
        .withColumn("mv", expr("CASE WHEN c1 > c0 THEN CAST(1 AS BIGINT)" +
          " WHEN c0 > c1 THEN CAST(0 AS BIGINT) ELSE CAST(-1 AS BIGINT) END"))
      def lfAggs(j: Int) = Seq(
        expr(s"sum(CASE WHEN v$j >= 0 THEN 1 ELSE 0 END)").as(s"n$j"),
        expr(s"sum(CASE WHEN v$j >= 0 AND (c0 + c1) >= 2 THEN 1 ELSE 0 END)")
          .as(s"ov$j"),
        expr(s"sum(CASE WHEN v$j >= 0 AND (c0 >= 1 AND c1 >= 1)" +
          s" THEN 1 ELSE 0 END)").as(s"cf$j"),
        expr(s"sum(CASE WHEN v$j = y THEN 1 ELSE 0 END)").as(s"ok$j"))
      val aggs = count(lit(1)).as("n") +:
        (Seq(0, 1, 2).flatMap(lfAggs) ++ Seq(
          expr("sum(CASE WHEN mv >= 0 THEN 1 ELSE 0 END)").as("nmv"),
          expr("sum(CASE WHEN mv = y THEN 1 ELSE 0 END)").as("okmv")))
      val a = v.agg(aggs.head, aggs.tail: _*)
      val rows = (0 to 2).map(j =>
        s"'lf$j', n$j, ov$j, cf$j, ok$j") :+ "'mv', nmv, nmv, nmv, okmv"
      a.selectExpr(
          s"stack(4, ${rows.mkString(", ")})" +
            " AS (lf, n_votes, n_overlap, n_conflict, n_correct)", "n")
        .selectExpr("lf", "CAST(n_votes AS BIGINT) AS n_votes",
          "round(CAST(n_votes AS DOUBLE) / n, 6) AS coverage",
          "CASE WHEN lf = 'mv' THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_overlap AS DOUBLE) / n, 6) END AS overlap",
          "CASE WHEN lf = 'mv' THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_conflict AS DOUBLE) / n, 6) END AS conflict",
          "CASE WHEN n_votes = 0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE round(CAST(n_correct AS DOUBLE) / n_votes, 6)" +
            " END AS accuracy")
        .orderBy("lf")
    }),

    // WOE BINNING: quartile bins from one distributed rank selection
    // (never a global sort buffer), per-bin good/bad counts, round-8 ln
    // WoE over bit-identical double ratios, decimal-summed IV.
    "q_woe_binning" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
          expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            .as("good"))
        .withColumn("kk", lit(1))
      val ranked = graft.operators.Ranks
        .withinKey(ev, "kk", Seq("vq", "event_id")).ckpt()
      val n1 = ranked.agg(max("rk").as("n"))
      val bins = ranked.crossJoin(broadcast(n1))
        .withColumn("bin", expr(s"(($WoeBins * (rk - 1)) DIV n)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("nb"), sum("good").as("g"),
          sum(expr("1 - good")).as("b"))
        .ckpt() // totals + output
      val tot = bins.agg(sum("g").as("gg"), sum("b").as("bb"))
      val woed = bins.crossJoin(broadcast(tot))
        .withColumn("woe", expr("CASE WHEN g = 0 OR b = 0 OR gg = 0 OR" +
          " bb = 0 THEN CAST(NULL AS DOUBLE) ELSE round(ln(" +
          "(CAST(g AS DOUBLE) / gg) / (CAST(b AS DOUBLE) / bb)), 8) END"))
        .withColumn("ivt", expr("CASE WHEN woe IS NULL THEN CAST(0 AS" +
          " DOUBLE) ELSE round((CAST(g AS DOUBLE) / gg" +
          " - CAST(b AS DOUBLE) / bb) * woe, 8) END"))
        .ckpt() // output rows + the IV fold
      val iv = woed.agg(dsum(col("ivt"), 8).as("iv"))
      woed.crossJoin(broadcast(iv))
        .selectExpr("CAST(bin AS BIGINT) AS bin", "CAST(nb AS BIGINT) AS n",
          "CAST(g AS BIGINT) AS n_good", "CAST(b AS BIGINT) AS n_bad",
          "round(woe, 6) AS woe", "round(iv, 6) AS iv")
        .orderBy("bin")
    }),
  )

  val oracle: Map[String, String] = strictMap(

    "q_weak_supervision" -> {
      val lfRows = (0 to 2).map(j =>
        s"""SELECT 'lf$j' AS lf, n$j AS n_votes, ov$j AS n_overlap,
           |  cf$j AS n_conflict, ok$j AS n_correct, n FROM a""".stripMargin)
      val mvRow =
        """SELECT 'mv' AS lf, nmv AS n_votes, nmv AS n_overlap,
          |  nmv AS n_conflict, okmv AS n_correct, n FROM a""".stripMargin
      val lfAggs = (0 to 2).map(j =>
        s"""CAST(sum(CASE WHEN v$j >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n$j,
           |    CAST(sum(CASE WHEN v$j >= 0 AND (c0 + c1) >= 2 THEN 1
           |      ELSE 0 END) AS BIGINT) AS ov$j,
           |    CAST(sum(CASE WHEN v$j >= 0 AND (c0 >= 1 AND c1 >= 1)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS cf$j,
           |    CAST(sum(CASE WHEN v$j = y THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ok$j""".stripMargin).mkString(",\n    ")
      s"""WITH v0 AS (
         |  SELECT doc_id, n_chars % 2 AS y,
         |    ${lfVoteSql(0)} AS v0, ${lfVoteSql(1)} AS v1,
         |    ${lfVoteSql(2)} AS v2
         |  FROM documents
         |),
         |v AS (
         |  SELECT *,
         |    (CASE WHEN v0 = 1 THEN 1 ELSE 0 END
         |      + CASE WHEN v1 = 1 THEN 1 ELSE 0 END
         |      + CASE WHEN v2 = 1 THEN 1 ELSE 0 END) AS c1,
         |    (CASE WHEN v0 = 0 THEN 1 ELSE 0 END
         |      + CASE WHEN v1 = 0 THEN 1 ELSE 0 END
         |      + CASE WHEN v2 = 0 THEN 1 ELSE 0 END) AS c0
         |  FROM v0
         |),
         |vm AS (
         |  SELECT *, CASE WHEN c1 > c0 THEN CAST(1 AS BIGINT)
         |    WHEN c0 > c1 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(-1 AS BIGINT) END AS mv
         |  FROM v
         |),
         |a AS (
         |  SELECT count(*) AS n,
         |    $lfAggs,
         |    CAST(sum(CASE WHEN mv >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nmv,
         |    CAST(sum(CASE WHEN mv = y THEN 1 ELSE 0 END) AS BIGINT)
         |      AS okmv
         |  FROM vm
         |),
         |rows AS (
         |${(lfRows :+ mvRow).mkString("\nUNION ALL\n")}
         |)
         |SELECT lf, n_votes,
         |  round(CAST(n_votes AS DOUBLE) / n, 6) AS coverage,
         |  CASE WHEN lf = 'mv' THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(n_overlap AS DOUBLE) / n, 6) END AS overlap,
         |  CASE WHEN lf = 'mv' THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(n_conflict AS DOUBLE) / n, 6) END
         |    AS conflict,
         |  CASE WHEN n_votes = 0 THEN CAST(NULL AS DOUBLE)
         |       ELSE round(CAST(n_correct AS DOUBLE) / n_votes, 6) END
         |    AS accuracy
         |FROM rows ORDER BY lf""".stripMargin
    },

    "q_woe_binning" ->
      s"""WITH ev AS (
         |  SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
         |  FROM events WHERE value IS NOT NULL
         |),
         |r AS (
         |  SELECT good, CAST(row_number() OVER (ORDER BY vq, event_id)
         |    AS BIGINT) AS rk, CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM ev
         |),
         |bins AS (
         |  SELECT ($WoeBins * (rk - 1)) // n AS bin, count(*) AS nb,
         |    CAST(sum(good) AS BIGINT) AS g,
         |    CAST(sum(1 - good) AS BIGINT) AS b
         |  FROM r GROUP BY 1
         |),
         |tot AS (SELECT CAST(sum(g) AS BIGINT) AS gg,
         |               CAST(sum(b) AS BIGINT) AS bb FROM bins),
         |w AS (
         |  SELECT bin, nb, g, b,
         |    CASE WHEN g = 0 OR b = 0 OR gg = 0 OR bb = 0
         |         THEN CAST(NULL AS DOUBLE)
         |         ELSE round(ln((CAST(g AS DOUBLE) / gg)
         |           / (CAST(b AS DOUBLE) / bb)), 8) END AS woe
         |  FROM bins CROSS JOIN tot
         |),
         |w2 AS (
         |  SELECT *, CASE WHEN woe IS NULL THEN CAST(0 AS DOUBLE)
         |    ELSE round((CAST(g AS DOUBLE) / (SELECT gg FROM tot)
         |      - CAST(b AS DOUBLE) / (SELECT bb FROM tot)) * woe, 8)
         |    END AS ivt
         |  FROM w
         |),
         |iv AS (SELECT ${dsumSql("ivt", 8)} AS iv FROM w2)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(nb AS BIGINT) AS n,
         |  g AS n_good, b AS n_bad, round(woe, 6) AS woe,
         |  round(iv, 6) AS iv
         |FROM w2 CROSS JOIN iv ORDER BY bin""".stripMargin,
  )
}
