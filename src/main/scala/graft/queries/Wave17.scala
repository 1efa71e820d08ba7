package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ckpt, Tokenize}
import Ckpt._

/** Wave-17 additions: the calibration queries that close the loop on
  * the ANN / dedup / tokenizer families — instead of adding another
  * estimator, these MEASURE the estimators the catalog already ships:
  *
  *  - q_ann_recall: recall@5 of the IVF probe (q_ann_ivf's chain)
  *    against the exact brute-force top-5 (q_ann_topk's chain) — the
  *    number that turns q_ann_ivf's "documented estimate contract"
  *    into a measured one,
  *  - q_bpe_fertility: per-language tokens-per-word and chars-per-
  *    token under the corpus-trained BPE (q_bpe_merges' chain) — the
  *    multilingual tokenizer-fairness audit (high fertility = that
  *    language pays more context budget per character),
  *  - q_dedup_threshold_sweep: pairs-over-threshold and docs-removed
  *    for τ = 0.1..0.9 from ONE pass of the trigram-Jaccard channel —
  *    the operating-curve a pipeline reads before freezing τ; the
  *    comparison is EXACT (10·co ≥ t·(union) in integers — the float
  *    jac never decides membership).
  *
  * Determinism: every decision rides exact integers (quantized dots,
  * trigram counts, cross-multiplied thresholds); displayed ratios are
  * terminal round-4/6 chains identical in both engines.
  */
object Wave17 {

  /** Recall depth (matches q_ann_ivf's emitted k). */
  private val RecallK = 5

  val queries: Map[String, Q] = strictMap(

    // ANN RECALL@5: exact top-5 (brute force over all candidates) vs
    // the IVF probe's top-5 (nearest centroid's cluster only), per
    // query vector, |∩|/5 — macro-averaged. Both chains reuse the
    // exact-integer quantized cosine, so the ONLY divergence measured
    // is the probe's, not float noise. The quantized table is ckpt'd
    // once and feeds all four consumers (centroids, probe distances,
    // query side, candidate side); the probe join stays
    // Σ|cluster|-bounded, the exact join is queries×corpus (the
    // documented cost of having a ground truth — queries are the 5%
    // sample, so it is corpus-linear, not corpus²).
    "q_ann_recall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val all = LlmOps.quantized(s, dir).where(col("nq") > 0).ckpt()
      // constant k = AnnQueryK ground-truth query set (round-7 family
      // rule: a constant-FRACTION query set makes the exact side Θ(n²))
      val qids = LlmOps.annQueryIds(all)
      val qs = all.join(qids, "vec_id")
        .select(col("vec_id").as("q_id"), col("q").as("qq"),
          col("nq").as("na"))
      val dot = "ivec_dot(qq, q)"
      // exact top-5: brute force
      val exact = qs.join(all, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          expr(dot).as("dot"), col("na"), col("nq").as("nb"))
        .withColumn("cos", expr(LlmOps.CosExpr))
        .withColumn("rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(desc("cos"), asc("cand_id"))))
        .where(col("rank") <= RecallK)
        .select("q_id", "cand_id")
        .ckpt()
      // IVF top-5: q_ann_ivf's probe (nearest centroid by exact
      // integer n²-scaled distance, then cosine within that cluster)
      val cent = all
        .select(col("label"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy("label", "pos")
        .agg(sum("qv").as("s"), count(lit(1)).as("n"))
      val qd = all.join(qids, "vec_id")
        .select(col("vec_id").as("q_id"),
          posexplode(col("q")).as(Seq("pos", "qv")))
      val best = qd.join(cent, "pos")
        .groupBy("q_id", "label")
        .agg(sum(expr("(qv * n - s) * (qv * n - s)")).as("dist_num"),
          max("n").as("n"))
        .withColumn("rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(expr("CAST(dist_num AS DOUBLE) / (n * n)").asc,
            col("label").asc)))
        .where(col("rn") === 1).select("q_id", "label")
      val ivf = best.join(qs, "q_id")
        .join(all.select(col("vec_id").as("cand_id"), col("label"),
          col("q"), col("nq").as("nb")), "label")
        .where(col("cand_id") =!= col("q_id"))
        .select(col("q_id"), col("cand_id"), expr(dot).as("dot"),
          col("na"), col("nb"))
        .withColumn("cos", expr(LlmOps.CosExpr))
        .withColumn("rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(desc("cos"), asc("cand_id"))))
        .where(col("rank") <= RecallK)
        .select("q_id", "cand_id")
      val per = exact.groupBy("q_id").agg(count(lit(1)).as("k_exact"))
        .join(exact.join(ivf, Seq("q_id", "cand_id"))
          .groupBy("q_id").agg(count(lit(1)).as("n_hit")), Seq("q_id"),
          "left_outer")
        .na.fill(0L, Seq("n_hit"))
        .withColumn("recall",
          expr("round(CAST(n_hit AS DOUBLE) / k_exact, 4)"))
        .ckpt()
      val mean = per.agg(count(lit(1)).as("m"),
          dsum(col("recall"), 4).as("sr"))
        .selectExpr("round(sr / m, 4) AS mean_recall")
      per.crossJoin(broadcast(mean))
        .selectExpr("q_id", "CAST(k_exact AS BIGINT) AS k_exact",
          "CAST(n_hit AS BIGINT) AS n_hit", "recall", "mean_recall")
        .orderBy("q_id")
    }),

    // BPE FERTILITY per language: the corpus-trained 3-merge tokenizer
    // (q_bpe_merges' exact chain, reused — the merges cannot drift)
    // applied to per-(lang, word) counts → tokens-per-word and
    // chars-per-token per lang. High tokens-per-word = that language
    // pays more of the context window per word — THE multilingual
    // tokenizer-fairness number. The vocabulary table (words × n_sym)
    // is broadcast-joined to the per-lang counts; one tokenize
    // shuffle + one vocab-scale join.
    "q_bpe_fertility" -> ((s, dir) => {
      val (wc3, _) = LlmOps.bpeChain(s, dir)
      val nsym = wc3.select(col("word"),
        expr("CAST(size(split(trim(seq), ' ')) AS BIGINT)").as("n_sym"))
      val lw = corpusToks(s, dir)
        .join(table(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      lw.join(nsym, "word")
        .groupBy("lang")
        .agg(sum("cnt").cast("long").as("n_words"),
          sum(expr("cnt * n_sym")).cast("long").as("n_tokens"),
          sum(expr("cnt * length(word)")).cast("long").as("n_chars"))
        .selectExpr("lang", "n_words", "n_tokens", "n_chars",
          "round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS tokens_per_word",
          "round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token")
        .orderBy("lang")
    }),

    // DEDUP THRESHOLD SWEEP: the τ operating curve of the trigram-
    // Jaccard channel (q_dedup_ngram's df-capped blocked pair join,
    // run ONCE) — for τ = 0.1..0.9: pairs at-or-over τ and docs a
    // keep-first policy would remove. Membership is decided by the
    // EXACT integer cross-multiply 10·co ≥ t·(sa+sb−co) — the float
    // jac never gates anything. The pair table is ckpt'd and the
    // 9-threshold sweep is a 9× metadata expansion of it, not 9
    // passes over the corpus.
    "q_dedup_threshold_sweep" -> ((s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
      val tri = ws.select(col("doc_id"), col("source"),
          explode(expr(
            "transform(sequence(1, size(ws)-2), i -> concat_ws(' '," +
              " element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
            .as("sh"))
        .distinct().ckpt()
      val rare = tri.groupBy("source", "sh")
        .agg(count(lit(1)).as("dfreq"))
        .where(col("dfreq") <= LlmOps.NgramDfCap)
        .select("source", "sh")
      val trif = tri.join(rare, Seq("source", "sh")).ckpt()
      val sz = trif.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairs = trif.alias("x")
        .join(trif.alias("y"),
          col("x.source") === col("y.source") &&
            col("x.sh") === col("y.sh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("co"))
        .join(sz.select(col("doc_id").as("d1"), col("sz").as("sa")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("sb")), "d2")
        .ckpt()
      val total = broadcast(pairs.agg(count(lit(1)).as("n_pairs_total")))
      pairs
        .crossJoin(s.range(1, 10).select(col("id").as("t")))
        .where(expr("10 * co >= t * (sa + sb - co)"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_pairs_over"),
          count_distinct(col("d2")).as("n_docs_removed"))
        .crossJoin(total)
        .selectExpr("t", "n_pairs_over", "n_docs_removed", "n_pairs_total")
        .orderBy("t")
    }),
  )

  /** The unrolled 3-merge BPE oracle chain ending in `wc3(word, cnt,
    * seq)` — the q_bpe_merges/q_bpe_apply spelling, shared here. */
  private def bpeWc3Sql: String = {
    def round(r: Int, src: String) =
      s"""p$r AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM $src),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t$r AS (SELECT l, r, w FROM p$r ORDER BY w DESC, l, r LIMIT 1),
         |wc$r AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM $src CROSS JOIN t$r
         |)""".stripMargin
    s"""wc0 AS (
       |  SELECT word, count(*) AS cnt,
       |    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
       |  FROM toks GROUP BY word
       |),
       |${round(1, "wc0")},
       |${round(2, "wc1")},
       |${round(3, "wc2")}""".stripMargin
  }

  val oracle: Map[String, String] = strictMap(

    "q_ann_recall" ->
      s"""WITH ${LlmOps.QuantizedNormSql},
         |${LlmOps.AnnQidsSql},
         |qs AS (SELECT e.vec_id AS q_id, e.embedding AS eq, qn.nq AS na
         |       FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |       WHERE qn.nq > 0
         |         AND e.vec_id IN (SELECT vec_id FROM qids)),
         |cand AS (SELECT e.vec_id AS cand_id, e.embedding AS ec, qn.nq AS nb
         |         FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |         WHERE qn.nq > 0),
         |pxx AS (SELECT q_id, cand_id, na, nb, eq, ec
         |       FROM qs JOIN cand ON q_id <> cand_id),
         |dxx AS (
         |  SELECT q_id, cand_id, na, nb,
         |    CAST(sum(${LlmOps.quantSqlElem("eq[i]")}
         |      * ${LlmOps.quantSqlElem("ec[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT pxx.*, unnest(generate_series(1, len(eq))) AS i
         |        FROM pxx)
         |  GROUP BY q_id, cand_id, na, nb
         |),
         |rxx AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${LlmOps.CosExpr} DESC, cand_id) AS rank
         |    FROM dxx) WHERE rank <= $RecallK
         |),
         |pe AS (
         |  SELECT vec_id, label, i AS pos,
         |    ${LlmOps.quantSqlElem("embedding[i]")} AS qv
         |  FROM (SELECT e.vec_id, e.label, e.embedding,
         |               unnest(generate_series(1, len(e.embedding))) AS i
         |        FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |        WHERE qn.nq > 0)
         |),
         |cent AS (
         |  SELECT label, pos, CAST(sum(qv) AS BIGINT) AS s, count(*) AS n
         |  FROM pe GROUP BY label, pos
         |),
         |dist AS (
         |  SELECT pe.vec_id AS q_id, c.label,
         |    CAST(sum((pe.qv * c.n - c.s) * (pe.qv * c.n - c.s)) AS BIGINT)
         |      AS dist_num,
         |    max(c.n) AS n
         |  FROM pe JOIN cent c ON pe.pos = c.pos
         |  WHERE pe.vec_id IN (SELECT vec_id FROM qids)
         |  GROUP BY q_id, c.label
         |),
         |best AS (
         |  SELECT q_id, label FROM (
         |    SELECT q_id, label, row_number() OVER (PARTITION BY q_id
         |      ORDER BY CAST(dist_num AS DOUBLE) / (n * n), label) AS rn
         |    FROM dist) WHERE rn = 1
         |),
         |sel AS (SELECT e.vec_id, qn.label, qn.nq, e.embedding
         |        FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |        WHERE qn.nq > 0),
         |pyy AS (
         |  SELECT b.q_id, s.vec_id AS cand_id, eq.embedding AS eqv,
         |         s.embedding AS ecv, eqn.nq AS na, s.nq AS nb
         |  FROM best b
         |  JOIN embeddings eq ON eq.vec_id = b.q_id
         |  JOIN qn eqn ON eqn.vec_id = b.q_id
         |  JOIN sel s ON s.label = b.label AND s.vec_id <> b.q_id
         |),
         |dyy AS (
         |  SELECT q_id, cand_id, na, nb,
         |    CAST(sum(${LlmOps.quantSqlElem("eqv[i]")}
         |      * ${LlmOps.quantSqlElem("ecv[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT pyy.*, unnest(generate_series(1, len(eqv))) AS i
         |        FROM pyy)
         |  GROUP BY q_id, cand_id, na, nb
         |),
         |ryy AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${LlmOps.CosExpr} DESC, cand_id) AS rank
         |    FROM dyy) WHERE rank <= $RecallK
         |),
         |per AS (
         |  SELECT rxx.q_id, count(*) AS k_exact,
         |    CAST(coalesce(sum(CASE WHEN ryy.cand_id IS NOT NULL
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
         |  FROM rxx LEFT JOIN ryy
         |    ON ryy.q_id = rxx.q_id AND ryy.cand_id = rxx.cand_id
         |  GROUP BY rxx.q_id
         |),
         |pr AS (
         |  SELECT q_id, CAST(k_exact AS BIGINT) AS k_exact, n_hit,
         |    round(CAST(n_hit AS DOUBLE) / k_exact, 4) AS recall
         |  FROM per
         |),
         |mr AS (
         |  SELECT round(${dsumSql("recall", 4)} / count(*), 4)
         |    AS mean_recall
         |  FROM pr
         |)
         |SELECT q_id, k_exact, n_hit, recall, mean_recall
         |FROM pr CROSS JOIN mr ORDER BY q_id""".stripMargin,

    "q_bpe_fertility" ->
      s"""WITH ${Reference.ToksSql},
         |$bpeWc3Sql,
         |nsym AS (
         |  SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT)
         |    AS n_sym
         |  FROM wc3
         |),
         |lw AS (
         |  SELECT d.lang, toks.word, count(*) AS cnt
         |  FROM toks JOIN documents d ON d.doc_id = toks.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(cnt * n_sym) AS BIGINT) AS n_tokens,
         |  CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(cnt * n_sym) AS DOUBLE) / sum(cnt), 6)
         |    AS tokens_per_word,
         |  round(CAST(sum(cnt * length(word)) AS DOUBLE)
         |    / sum(cnt * n_sym), 6) AS chars_per_token
         |FROM lw JOIN nsym USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_threshold_sweep" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' ') AS ws
         |  FROM documents
         |),
         |tt AS (SELECT * FROM t WHERE len(ws) >= 3),
         |tri AS (
         |  SELECT DISTINCT doc_id, source,
         |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
         |  FROM (SELECT doc_id, source, ws,
         |               unnest(generate_series(1, len(ws)-2)) AS i FROM tt)
         |),
         |tdf AS (SELECT source, sh, count(*) AS dfreq FROM tri
         |        GROUP BY source, sh),
         |trif AS (
         |  SELECT tri.doc_id, tri.source, tri.sh
         |  FROM tri JOIN tdf USING (source, sh)
         |  WHERE tdf.dfreq <= ${LlmOps.NgramDfCap}
         |),
         |sz AS (SELECT doc_id, count(*) AS sz FROM trif GROUP BY doc_id),
         |co AS (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS co
         |  FROM trif x JOIN trif y
         |    ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |),
         |pairs AS (
         |  SELECT d1, d2, co, sa.sz AS sa, sb.sz AS sb
         |  FROM co JOIN sz sa ON co.d1 = sa.doc_id
         |          JOIN sz sb ON co.d2 = sb.doc_id
         |),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_total
         |        FROM pairs),
         |thr AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS t)
         |SELECT thr.t, CAST(count(*) AS BIGINT) AS n_pairs_over,
         |  CAST(count(DISTINCT d2) AS BIGINT) AS n_docs_removed,
         |  tot.n_pairs_total
         |FROM pairs CROSS JOIN thr CROSS JOIN tot
         |WHERE 10 * co >= thr.t * (sa + sb - co)
         |GROUP BY thr.t, tot.n_pairs_total
         |ORDER BY thr.t""".stripMargin,
  )
}
