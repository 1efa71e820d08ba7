package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-18 additions: corpus-law fits and the LSH recall audit —
  * the statistical profile a pipeline reads before committing a
  * tokenizer/dedup configuration to a 100 TB run:
  *
  *  - q_zipf_fit: least-squares fit of Zipf's law (ln cnt ~ ln rank)
  *    over the top-[[Wave18.ZipfTopN]] words — the one-number check
  *    that a corpus is natural-language-shaped (slope ≈ −1) rather
  *    than templated boilerplate (flat head) or noise (no fit),
  *  - q_heaps_law: Heaps'-law vocabulary growth V(n) = K·n^β from
  *    cumulative (tokens, vocab) at doc-id deciles — β tells you how
  *    vocabulary (and so tokenizer OOV pressure) scales with corpus
  *    growth BEFORE you scale the corpus,
  *  - q_minhash_recall: measured recall of the probabilistic
  *    MinHash-LSH candidate channel against the LOSSLESS prefix-filter
  *    pair set at Jaccard ≥ 0.8 (q_prefix_join's chain) — the number
  *    that turns the LSH band/row choice from folklore into a
  *    measured contract, bucketed by exact-Jaccard decile so the
  *    near-threshold dropoff is visible.
  *
  * Determinism: ranks and deciles are integer-derived with total
  * tie-breaks; every ln rides the round-8 idiom; least-squares sums
  * go through exact DECIMAL ([[queries.dsum]]); LSH/truth membership
  * is decided by exact integer cross-multiplies. */
object Wave18 {

  /** Head size for the Zipf fit: large enough that the slope is not
    * dominated by the 2-3 stopword outliers, small enough that the
    * rank table is metadata (TakeOrderedAndProject, never a global
    * sort). */
  private val ZipfTopN = 100

  /** Shared least-squares moment aggregate over (x, y) points: exact
    * decimal sums of the round-8 products, so the fit is independent
    * of partitioning and matches the oracle's identical spelling. */
  private def lsqMoments(pts: DataFrame): DataFrame =
    pts.agg(count(lit(1)).as("n"),
      dsum(col("x"), 8).as("sx"), dsum(col("y"), 8).as("sy"),
      dsum(expr("round(x*y, 8)"), 8).as("sxy"),
      dsum(expr("round(x*x, 8)"), 8).as("sxx"),
      dsum(expr("round(y*y, 8)"), 8).as("syy"))

  /** DuckDB twin of [[lsqMoments]]'s aggregate list. */
  private def lsqMomentsSql: String =
    s"""count(*) AS n, ${dsumSql("x", 8)} AS sx, ${dsumSql("y", 8)} AS sy,
       |  ${dsumSql("round(x*y, 8)", 8)} AS sxy,
       |  ${dsumSql("round(x*x, 8)", 8)} AS sxx,
       |  ${dsumSql("round(y*y, 8)", 8)} AS syy""".stripMargin

  /** Slope / intercept / r² spelled ONCE and fed verbatim to both
    * engines — the terminal float chain is identical IEEE ops in
    * identical order, so it cannot ulp-diverge. */
  private val SlopeExpr = "(n*sxy - sx*sy) / (n*sxx - sx*sx)"
  private val InterceptExpr = s"(sy - ($SlopeExpr) * sx) / n"
  private val R2Expr =
    "((n*sxy - sx*sy) * (n*sxy - sx*sy)) / ((n*sxx - sx*sx) * (n*syy - sy*sy))"

  val queries: Map[String, Q] = strictMap(

    // ZIPF FIT: word counts (one partial-agg'd shuffle) → top-100 by
    // (cnt desc, word asc) via TakeOrderedAndProject (never a global
    // sort) → row_number over the 100-row head (metadata-scale
    // window) → ln-ln least squares. Natural text fits slope ≈ −1
    // with high r²; a templated corpus shows up immediately as a
    // flat head or a broken fit.
    "q_zipf_fit" -> ((s, dir) => {
      val wc = corpusToks(s, dir)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val top = wc.orderBy(desc("cnt"), asc("word")).limit(ZipfTopN)
      val pts = top
        .withColumn("rk",
          row_number().over(Window.orderBy(desc("cnt"), asc("word"))))
        .selectExpr("round(ln(rk), 8) AS x", "round(ln(cnt), 8) AS y")
      lsqMoments(pts)
        .selectExpr("CAST(n AS BIGINT) AS n_top",
          s"round($SlopeExpr, 6) AS slope",
          s"round($InterceptExpr, 6) AS intercept",
          s"round($R2Expr, 6) AS r2")
    }),

    // HEAPS' LAW: cumulative (tokens, vocab) at 10 doc-id deciles —
    // a word's first-occurrence doc is one min-agg, a doc's token
    // count one count-agg; each partial lands in its integer decile
    // cell ((id*10) DIV (max+1)) and the 10-row cumulative sum +
    // ln-ln fit are metadata. β (the growth exponent) and ln K ride
    // every row; V(n) = K·n^β means doubling the corpus multiplies
    // vocabulary by 2^β — the tokenizer-budget planning number.
    "q_heaps_law" -> ((s, dir) => {
      val t = corpusToks(s, dir)
      val nmax = broadcast(table(s, dir, "documents")
        .agg((max("doc_id") + lit(1L)).as("nn")))
      val tokCell = t.crossJoin(nmax)
        .selectExpr("(doc_id * 10) DIV nn AS cell")
        .groupBy("cell").agg(count(lit(1)).as("tok"))
      val vocCell = t.groupBy("word").agg(min("doc_id").as("fd"))
        .crossJoin(nmax)
        .selectExpr("(fd * 10) DIV nn AS cell")
        .groupBy("cell").agg(count(lit(1)).as("voc"))
      val w = Window.orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = s.range(0, 10).select(col("id").as("cell"))
        .join(tokCell, Seq("cell"), "left_outer")
        .join(vocCell, Seq("cell"), "left_outer")
        .na.fill(0L, Seq("tok", "voc"))
        .withColumn("cum_tokens", sum("tok").over(w))
        .withColumn("cum_vocab", sum("voc").over(w))
        .selectExpr("CAST(cell AS BIGINT) AS decile",
          "CAST(cum_tokens AS BIGINT) AS cum_tokens",
          "CAST(cum_vocab AS BIGINT) AS cum_vocab")
        .ckpt() // feeds the fit AND the output rows
      val pts = cum
        .where(col("cum_tokens") > 0 && col("cum_vocab") > 0)
        .selectExpr("round(ln(cum_tokens), 8) AS x",
          "round(ln(cum_vocab), 8) AS y")
      val fit = lsqMoments(pts)
        .selectExpr(s"round($SlopeExpr, 6) AS beta",
          s"round($InterceptExpr, 6) AS ln_k")
      cum.crossJoin(broadcast(fit)).orderBy("decile")
    }),

    // MINHASH-LSH RECALL: the probabilistic band channel
    // (q_dedup_minhash's capped band-bucket join) graded against the
    // GUARANTEED-complete prefix-filter pair set at J ≥ 0.8
    // (q_prefix_join's chain, factored as LlmOps.prefixTruePairs) —
    // per exact-Jaccard decile ((10·inter) DIV union, pure integers)
    // plus overall recall and precision-at-τ constants on every row.
    // Both channels are corpus-linear (prefix pigeonhole bound /
    // capped buckets); the grading join is |truth| ⋈ |candidates| —
    // pair-table scale, never corpus².
    "q_minhash_recall" -> ((s, dir) => {
      val truth = LlmOps.prefixTruePairs(s, dir)
        .withColumn("b", expr("(10*inter) DIV (sz1 + sz2 - inter)"))
        .ckpt() // feeds the hit join + per-bucket counts
      val cand = LlmOps.minhashCandPairs(s, dir)
        .withColumn("hit", lit(1L))
        .ckpt() // feeds the hit join + the total count
      val per = truth.join(cand, Seq("d1", "d2"), "left_outer")
        .groupBy("b")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_caught"))
        .ckpt() // feeds totals + output
      val tot = per.agg(sum("n_true").as("n_true_total"),
        sum("n_caught").as("n_caught_total"))
      val nc = cand.agg(count(lit(1)).as("n_cand_total"))
      per.crossJoin(broadcast(tot)).crossJoin(broadcast(nc))
        .selectExpr("CAST(b AS BIGINT) AS jac_decile",
          "CAST(n_true AS BIGINT) AS n_true",
          "CAST(n_caught AS BIGINT) AS n_caught",
          "round(CAST(n_caught AS DOUBLE) / n_true, 4) AS recall",
          "CAST(n_true_total AS BIGINT) AS n_true_total",
          "CAST(n_caught_total AS BIGINT) AS n_caught_total",
          "CAST(n_cand_total AS BIGINT) AS n_cand_total",
          "round(CAST(n_caught_total AS DOUBLE) / n_true_total, 4)" +
            " AS overall_recall",
          "round(CAST(n_caught_total AS DOUBLE) / n_cand_total, 4)" +
            " AS precision_at_t")
        .orderBy("jac_decile")
    }),
  )

  /** The prefix-filter truth CTE chain over the DISTINCT shingle sets
    * of [[LlmOps.MinhashSigSql]]'s `sh` — ends in
    * `truth(d1, d2, inter, sz1, sz2, b)`. */
  private def prefixTruthSql: String = {
    import LlmOps.{PrefixTNum => TN, PrefixTDen => TD}
    s"""sets AS (SELECT DISTINCT doc_id, sh FROM sh),
       |dfq AS (SELECT sh, count(*) AS df FROM sets GROUP BY sh),
       |szt AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
       |pref AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT s.doc_id, s.sh, z.sz,
       |      row_number() OVER (PARTITION BY s.doc_id
       |        ORDER BY d.df, s.sh) AS rn
       |    FROM sets s JOIN dfq d USING (sh) JOIN szt z USING (doc_id)
       |  ) WHERE rn <= sz - ($TN*sz + $TN) // $TD + 1
       |),
       |pcand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM pref a JOIN pref b USING (sh) WHERE a.doc_id < b.doc_id
       |),
       |pint AS (
       |  SELECT c.d1, c.d2, count(*) AS inter
       |  FROM pcand c
       |  JOIN sets x ON x.doc_id = c.d1
       |  JOIN sets y ON y.doc_id = c.d2 AND y.sh = x.sh
       |  GROUP BY c.d1, c.d2
       |),
       |truth AS (
       |  SELECT i.d1, i.d2, i.inter, z1.sz AS sz1, z2.sz AS sz2,
       |    (10*i.inter) // (z1.sz + z2.sz - i.inter) AS b
       |  FROM pint i
       |  JOIN szt z1 ON z1.doc_id = i.d1
       |  JOIN szt z2 ON z2.doc_id = i.d2
       |  WHERE ${TD + TN}*i.inter >= $TN*(z1.sz + z2.sz)
       |)""".stripMargin
  }

  val oracle: Map[String, String] = strictMap(

    "q_zipf_fit" ->
      s"""WITH ${Reference.ToksSql},
         |wc AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
         |top AS (SELECT word, cnt FROM wc
         |        ORDER BY cnt DESC, word LIMIT $ZipfTopN),
         |r AS (SELECT cnt,
         |        row_number() OVER (ORDER BY cnt DESC, word) AS rk
         |      FROM top),
         |p AS (SELECT round(ln(rk), 8) AS x, round(ln(cnt), 8) AS y
         |      FROM r),
         |f AS (SELECT $lsqMomentsSql FROM p)
         |SELECT CAST(n AS BIGINT) AS n_top,
         |  round($SlopeExpr, 6) AS slope,
         |  round($InterceptExpr, 6) AS intercept,
         |  round($R2Expr, 6) AS r2
         |FROM f""".stripMargin,

    "q_heaps_law" ->
      s"""WITH ${Reference.ToksSql},
         |nmax AS (SELECT max(doc_id) + 1 AS nn FROM documents),
         |tc AS (SELECT (doc_id * 10) // nn AS cell, count(*) AS tok
         |       FROM toks CROSS JOIN nmax GROUP BY 1),
         |fw AS (SELECT word, min(doc_id) AS fd FROM toks GROUP BY word),
         |vc AS (SELECT (fd * 10) // nn AS cell, count(*) AS voc
         |       FROM fw CROSS JOIN nmax GROUP BY 1),
         |grid AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT)
         |           AS cell),
         |cum AS (
         |  SELECT cell,
         |    CAST(sum(coalesce(tok, 0)) OVER (ORDER BY cell
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tokens,
         |    CAST(sum(coalesce(voc, 0)) OVER (ORDER BY cell
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_vocab
         |  FROM grid LEFT JOIN tc USING (cell) LEFT JOIN vc USING (cell)
         |),
         |p AS (SELECT round(ln(cum_tokens), 8) AS x,
         |        round(ln(cum_vocab), 8) AS y
         |      FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0),
         |f AS (SELECT $lsqMomentsSql FROM p)
         |SELECT cell AS decile, cum_tokens, cum_vocab,
         |  round($SlopeExpr, 6) AS beta,
         |  round($InterceptExpr, 6) AS ln_k
         |FROM cum CROSS JOIN f ORDER BY decile""".stripMargin,

    "q_minhash_recall" ->
      s"""WITH ${LlmOps.MinhashSigSql},
         |${LlmOps.BandsSql},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |),
         |$prefixTruthSql,
         |per AS (
         |  SELECT t.b, count(*) AS n_true,
         |    CAST(sum(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_caught
         |  FROM truth t LEFT JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2
         |  GROUP BY t.b
         |),
         |tot AS (SELECT CAST(sum(n_true) AS BIGINT) AS n_true_total,
         |          CAST(sum(n_caught) AS BIGINT) AS n_caught_total
         |        FROM per),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_total FROM cand)
         |SELECT CAST(b AS BIGINT) AS jac_decile,
         |  CAST(n_true AS BIGINT) AS n_true, n_caught,
         |  round(CAST(n_caught AS DOUBLE) / n_true, 4) AS recall,
         |  n_true_total, n_caught_total, n_cand_total,
         |  round(CAST(n_caught_total AS DOUBLE) / n_true_total, 4)
         |    AS overall_recall,
         |  round(CAST(n_caught_total AS DOUBLE) / n_cand_total, 4)
         |    AS precision_at_t
         |FROM per CROSS JOIN tot CROSS JOIN nc
         |ORDER BY jac_decile""".stripMargin,
  )
}
