package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-8 additions: the "which data goes in the mix" corner of a
  * curation pipeline — one-way ANOVA and Kruskal-Wallis (the parametric /
  * nonparametric k-group "did segments diverge?" gates extending wave-7's
  * two-sample tests), DSIR-style importance-resampling selection
  * (Xie et al. '23: score raw docs by a target-vs-raw hashed-n-gram
  * log-likelihood ratio, keep the top), boilerplate stripping by
  * paragraph document frequency (the CCNet/RefinedWeb "drop lines shared
  * across many pages" rule — distinct from q_dedup_paragraph's
  * first-occurrence dedup), normalized mutual information between two
  * categorical partitions (the clustering-agreement metric), and bounded
  * k-truss peeling (the triangle-support community core, one level
  * stronger than q_kcore's degree peeling).
  *
  * Determinism: counts and rank sums are exact BIGINTs under tie-broken
  * total orders, every ln rides the house round-8 + decimal-sum
  * discipline, DSIR scores are exact DECIMAL walks (integer counts ×
  * 8-decimal pre-rounded weights — the q_sprt pattern), and every query
  * ends in a bounded, totally-ordered result.
  */
object Wave8 {

  /** Integer-cents quantization of the events `value` double (the house
    * floor(x·100 + 0.5) spelling — exact and identical in both engines). */
  private val CentsSpark =
    "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"
  private def centsSql = "CAST(floor(CAST(value AS DOUBLE)*100 + 0.5) AS BIGINT)"

  /** q_dsir_select: hashed word-feature bucket count (the feature table
    * is ALWAYS this many rows — broadcastable at any corpus size) and
    * the number of selected documents. */
  private val DsirBuckets = 256
  private val DsirTopK = 50

  /** q_boilerplate: paragraphs appearing in ≥ this many documents are
    * boilerplate (site chrome, licence headers) and are dropped. */
  private val BoilerDf = 3

  /** q_ktruss: triangle-support threshold (an edge survives while it
    * closes ≥ k−2 triangles among surviving edges) and the bounded
    * peel-round count; co-purchase projection weight as in q_triangles. */
  private val TrussK = 4
  private val TrussRounds = 3
  private val TrussMinW = 5

  /** Exact quotient/remainder split of Σ s²/m (the sum-of-squares /
    * rank-sum workhorse of q_anova and q_kruskal): with a = s DIV m,
    * b = s MOD m (all non-negative, so DIV/MOD agree across engines),
    *
    *   s²/m = a²m + 2ab + (b² DIV m)  +  (b² MOD m)/m
    *          └──────── ii ─────────┘    └──── fr ────┘
    *
    * ii is EXACT 128-bit integer arithmetic (DECIMAL(38,0) / HUGEINT);
    * fr ∈ [0, 1) is one small identical float division, round-12. The
    * grid sums Σii exactly and Σfr as DECIMAL(18,12) (≤ k, so the scale
    * never overflows) — no rounding of any large double anywhere, which
    * is what keeps the statistic deterministic at ANY n (doubles past
    * 2^53/10^scale round differently per engine). */
  private def sumSqIiSpark(s: String, m: String): String =
    s"CAST($s DIV $m AS DECIMAL(38,0)) * ($s DIV $m) * $m" +
      s" + 2 * CAST($s DIV $m AS DECIMAL(38,0)) * ($s % $m)" +
      s" + (CAST($s % $m AS DECIMAL(38,0)) * ($s % $m) DIV $m)"
  private def sumSqFrSpark(s: String, m: String): String =
    s"round(CAST(CAST($s % $m AS DECIMAL(38,0)) * ($s % $m) % $m AS DOUBLE)" +
      s" / CAST($m AS DOUBLE), 12)"

  /** DuckDB twins of [[sumSqIiSpark]]/[[sumSqFrSpark]] (HUGEINT). */
  private def sumSqIiSql(s: String, m: String): String =
    s"CAST($s // $m AS HUGEINT) * ($s // $m) * $m" +
      s" + 2 * CAST($s // $m AS HUGEINT) * ($s % $m)" +
      s" + (CAST($s % $m AS HUGEINT) * ($s % $m) // $m)"
  private def sumSqFrSql(s: String, m: String): String =
    s"round(CAST(CAST($s % $m AS HUGEINT) * ($s % $m) % $m AS DOUBLE)" +
      s" / CAST($m AS DOUBLE), 12)"

  val queries: Map[String, Q] = strictMap(

    // ONE-WAY ANOVA F-test across event types on integer cents: all
    // power sums (n, Σx, Σx² per group) are exact BIGINTs with map-side
    // partials — ONE partial-agg'd shuffle of |groups| rows, never a
    // second pass. The sum-of-squares identities then ride the EXACT
    // quotient/remainder split ([[sumSqOverN]]): Σs_g²/n_g = I + F with
    // I an exact 128-bit integer and F < k a small round-12 decimal sum,
    // so SSB = (I−I_tot) + (F−F_tot) and SSW = (Σx²−I) − F subtract
    // exact integers FIRST (no catastrophic double cancellation, no
    // round-of-huge-double cross-engine hazard — the naive Σ round(s²/n)
    // overflowed DECIMAL(18,6) at sf0.1 and a wider decimal would round
    // doubles past 2^53/10⁶ where the engines disagree). Σx² upgrades
    // to DECIMAL(38,0) past ~10¹⁰ rows (house q_spearman note).
    "q_anova" -> ((s, dir) => {
      val g = table(s, dir, "events")
        .selectExpr("event_type", s"$CentsSpark AS x")
        .groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
      val per = g.selectExpr("ng", "sxx",
          s"${sumSqIiSpark("sx", "ng")} AS ii",
          s"${sumSqFrSpark("sx", "ng")} AS fr")
        .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sxx")).as("sxxt"), sum(col("ii")).as("i"),
          sum(expr("CAST(fr AS DECIMAL(18,12))")).as("f"))
      // grand-total branch: the same split on (Σx, n)
      val tot = g.agg(sum(col("sx")).as("sx"), sum(col("ng")).as("ng"))
        .selectExpr(s"${sumSqIiSpark("sx", "ng")} AS it",
          s"${sumSqFrSpark("sx", "ng")} AS ft")
      per.crossJoin(broadcast(tot))
        .selectExpr("k", "n",
          "round(CAST(i - it AS DOUBLE) + (CAST(f AS DOUBLE) - ft), 4) AS ssb",
          "round(CAST(CAST(sxxt AS DECIMAL(38,0)) - i AS DOUBLE)" +
            " - CAST(f AS DOUBLE), 4) AS ssw")
        .selectExpr("k", "n", "ssb", "ssw",
          "round((ssb / (CAST(k AS DOUBLE) - 1)) /" +
            " (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f")
    }),

    // KRUSKAL-WALLIS H: the k-group rank extension of q_mannwhitney.
    // ONE pooled global rank (distributed Ranks selection, total order
    // (cents, event_id) — the pinned tie-broken contract) + one
    // per-group BIGINT rank-sum aggregate. ΣR_g²/n_g rides the exact
    // quotient/remainder split (see q_anova): H·n(n+1) = 12I − 3n(n+1)²
    // + 12F where the integer part G is computed EXACTLY in 128-bit and
    // only the final (G + 12F)/(n(n+1)) is float — deterministic at any
    // n, no DECIMAL(18,6) ceiling (the naive spelling crashed at sf0.1
    // with rg²/n_g ≈ 5·10¹³). Rank sums upgrade to DECIMAL(38,0) past
    // n ≈ 4·10⁹ (q_spearman house note).
    "q_kruskal" -> ((s, dir) => {
      val p = table(s, dir, "events")
        .selectExpr("event_type", s"$CentsSpark AS cents", "event_id")
        .withColumn("kk", lit(1))
      graft.operators.Ranks.withinKey(p, "kk", Seq("cents", "event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum(col("rk")).as("rg"))
        .selectExpr("ng",
          s"${sumSqIiSpark("rg", "ng")} AS ii",
          s"${sumSqFrSpark("rg", "ng")} AS fr")
        .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("ii")).as("i"),
          sum(expr("CAST(fr AS DECIMAL(18,12))")).as("f"))
        .selectExpr("k", "n",
          "12 * i - 3 * CAST(n AS DECIMAL(38,0)) * (n + 1) * (n + 1) AS g",
          "f")
        .selectExpr("k", "n",
          "round((CAST(g AS DOUBLE) + 12 * CAST(f AS DOUBLE))" +
            " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)), 6) AS h")
    }),

    // DSIR importance-resampling selection (Data Selection via Importance
    // Resampling): score every raw document by Σ_f count_f(doc)·λ_f where
    // λ_f = ln p_target(f) − ln p_raw(f) over hashed word features
    // (add-1 smoothing), keep the top-k. Target = src0 (the curated
    // slice), raw = the rest. Scale shape: BOTH feature tables are
    // EXACTLY DsirBuckets rows (hashing bounds the vocabulary) so the
    // λ table broadcasts anywhere; the corpus side is one tokenize +
    // (doc, bucket) count + one broadcast join; top-k rides
    // TakeOrderedAndProject. Numeric contract: λ is pre-rounded to 8
    // decimals from ln of exact rationals, and each doc score is an
    // EXACT DECIMAL sum of count×λ products (the q_sprt walk pattern) —
    // display rounds once at the end.
    "q_dsir_select" -> ((s, dir) => {
      val words = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .selectExpr("doc_id", "source",
          s"CAST(conv(substring(md5(concat('dsir:', w)), 1, 8), 16, 10) AS BIGINT)" +
            s" % $DsirBuckets AS f")
      val perDoc = words.groupBy("doc_id", "source", "f")
        .agg(count(lit(1)).as("c"))
      val tgt = words.where(col("source") === "src0")
        .groupBy("f").agg(count(lit(1)).as("tc"))
      val raw = words.where(col("source") =!= "src0")
        .groupBy("f").agg(count(lit(1)).as("rc"))
      // λ over the FULL bucket grid (absent buckets smooth to count 0):
      // totals are scalar subselects on the bounded grid, exact BIGINTs
      val grid = s.range(DsirBuckets).select(col("id").as("f"))
        .join(tgt, Seq("f"), "left_outer")
        .join(raw, Seq("f"), "left_outer")
        .selectExpr("f", "coalesce(tc, CAST(0 AS BIGINT)) AS tc",
          "coalesce(rc, CAST(0 AS BIGINT)) AS rc")
      val tots = grid.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
      val lam = grid.crossJoin(broadcast(tots))
        .selectExpr("f",
          s"CAST(round(ln((CAST(tc AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + $DsirBuckets))" +
            s" - ln((CAST(rc AS DOUBLE) + 1.0) / (CAST(rt AS DOUBLE) + $DsirBuckets)), 8)" +
            // DECIMAL(10,8), NOT (18,8): BIGINT(20,0) × DECIMAL(18,8)
            // needs precision 39 > 38, and Spark's allowPrecisionLoss
            // silently drops the product to scale 7 (caught live: every
            // score off at the 8th decimal). 20+10+1 = 31 keeps scale 8.
            " AS DECIMAL(10,8)) AS lam")
      perDoc.where(col("source") =!= "src0")
        .join(broadcast(lam), Seq("f"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("c")).as("n_words"),
          sum(expr("c * lam")).as("sc"))
        // order by the EXACT decimal score (ties in the rounded display
        // value must not reorder the cut), doc_id tie-break
        .orderBy(desc("sc"), asc("doc_id")).limit(DsirTopK)
        // NO display re-round: sc is an exact 8-decimal DECIMAL, and
        // re-rounding to 6 ulp-flips half-boundary scores (caught live
        // at sf0.01, 3/50 rows off by 1e-6 — Spark decimal round is
        // HALF_UP, DuckDB's resolves the half the other way). The exact
        // decimal→double conversion is identical in both engines.
        .select(col("doc_id"), col("n_feats"), col("n_words"),
          expr("CAST(sc AS DOUBLE)").as("score"))
    }),

    // BOILERPLATE stripping by paragraph document frequency: a paragraph
    // seen in ≥ BoilerDf DISTINCT documents is chrome and every copy is
    // dropped (q_dedup_paragraph keeps the FIRST copy — different rule,
    // different output). One (para → distinct-doc count) aggregation
    // (map-side partials over the md5 of the paragraph, so the shuffle
    // carries hashes, not text), one join back, then the deterministic
    // sort-rebuild from q_clean_paragraph (struct(i, para) sort — never
    // order-dependent collect_list). Per-doc output row: kept/dropped
    // counts + md5 of the rebuilt text.
    "q_boilerplate" -> ((s, dir) => {
      val paras = table(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
          trim(col("col")).as("para"))
        .where(length(col("para")) > 0)
      val df = paras.groupBy("para")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      paras.join(df, "para")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("ndocs") < BoilerDf, 1L).otherwise(0L)).as("n_kept"),
          // collect_list drops the NULL (boilerplate) entries; the struct
          // sort by unique i makes the rebuild partition-invariant, and a
          // doc whose EVERY paragraph is boilerplate rebuilds to md5('')
          // (the oracle coalesces its NULL string_agg to '' to match)
          md5(concat_ws(". ",
            sort_array(collect_list(when(col("ndocs") < BoilerDf,
              struct(col("i"), col("para"))))).getField("para")))
            .as("clean_md5"))
        .orderBy("doc_id")
    }),

    // NORMALIZED MUTUAL INFORMATION between the lang and source
    // partitions of the corpus: NMI = I(X;Y)/√(H(X)·H(Y)) from the
    // |langs|×|sources| contingency table — ONE partial-agg'd count
    // shuffle, then every entropy term is metadata-scale. Each cell's
    // n·ln(n·N/(nx·ny)) term is round-8 from exact integer rationals and
    // decimal-summed (house ln discipline), so the statistic is
    // engine-invariant. The "are these two groupings the same
    // clustering?" metric (label-vs-cluster agreement at full scale).
    "q_nmi" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val cell = d.groupBy("lang", "source").agg(count(lit(1)).as("nxy"))
      val nx = d.groupBy("lang").agg(count(lit(1)).as("nx"))
      val ny = d.groupBy("source").agg(count(lit(1)).as("ny"))
      val n = d.agg(count(lit(1)).as("n"))
      val mi = cell.join(broadcast(nx), "lang").join(broadcast(ny), "source")
        .crossJoin(broadcast(n))
        .agg(dsum(expr(
          "round(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)" +
            " * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)" +
            " / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 8)"), 8).as("mi"))
      val hx = nx.crossJoin(broadcast(n))
        .agg(dsum(expr(
          "round(-CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)" +
            " * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 8)"), 8).as("hx"))
      val hy = ny.crossJoin(broadcast(n))
        .agg(dsum(expr(
          "round(-CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)" +
            " * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 8)"), 8).as("hy"))
      n.crossJoin(mi).crossJoin(hx).crossJoin(hy)
        .selectExpr("n", "round(mi, 6) AS mi", "round(hx, 6) AS hx",
          "round(hy, 6) AS hy",
          "round(mi / sqrt(hx * hy), 6) AS nmi")
    }),

    // K-TRUSS peeling on the co-purchase supplier graph (same weight-≥-5
    // projection as q_triangles): per round, each surviving canonical
    // edge (u < v) counts its triangle support — common neighbors via
    // ONE adjacency⋈adjacency wedge join probed against the canonical
    // edge set — and edges with support < k−2 drop, for TrussRounds
    // bounded rounds (the q_kcore fixed-round contract; the oracle
    // unrolls identical rounds). The basket projection and each round's
    // survivor set are checkpointed — the wedge join is the expensive
    // stage and must not re-execute. Output: per-round survivor counts.
    "q_ktruss" -> ((s, dir) => {
      import graft.operators.Ckpt._
      val os = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      var und = os.alias("a").join(os.alias("b"), Seq("ok"))
        .where(col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= TrussMinW).select("u", "v")
        .ckpt()
      val out = scala.collection.mutable.ArrayBuffer(
        und.agg(count(lit(1)).as("n_edges"))
          .select(lit(0L).as("round"), col("n_edges")))
      for (r <- 1 to TrussRounds) {
        val adj = und.select(col("u").as("x"), col("v").as("y"))
          .unionByName(und.select(col("v").as("x"), col("u").as("y")))
        val support = und
          .join(adj.select(col("x").as("u"), col("y").as("wn")), Seq("u"))
          .join(adj.select(col("x").as("v"), col("y").as("wn")), Seq("v", "wn"))
          .groupBy("u", "v").agg(count(lit(1)).as("sup"))
        und = und.join(
            support.where(col("sup") >= TrussK - 2).select("u", "v"),
            Seq("u", "v"), "left_semi")
          .ckpt()
        out += und.agg(count(lit(1)).as("n_edges"))
          .select(lit(r.toLong).as("round"), col("n_edges"))
      }
      out.reduce(_ unionByName _).orderBy("round")
    }),
  )

  /** One peel round of the k-truss oracle: survivors of e$i with
    * triangle support ≥ k−2 among e$i edges. MATERIALIZED — each e$i is
    * referenced 3× by the wedge join + the final counts (DuckDB's
    * default CTE inlining would re-execute the whole peel chain). */
  private def trussRoundSql(i: Int): String =
    s"""adj$i AS MATERIALIZED (
       |  SELECT u AS x, v AS y FROM e${i - 1}
       |  UNION ALL SELECT v, u FROM e${i - 1}
       |),
       |sup$i AS (
       |  SELECT e.u, e.v, count(*) AS sup
       |  FROM e${i - 1} e
       |  JOIN adj$i a1 ON a1.x = e.u
       |  JOIN adj$i a2 ON a2.x = e.v AND a2.y = a1.y
       |  GROUP BY e.u, e.v
       |),
       |e$i AS MATERIALIZED (
       |  SELECT e.u, e.v FROM e${i - 1} e
       |  JOIN sup$i s ON s.u = e.u AND s.v = e.v
       |  WHERE s.sup >= $TrussK - 2
       |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_anova" ->
      s"""WITH g AS (
         |  SELECT event_type, count(*) AS ng,
         |    CAST(sum($centsSql) AS BIGINT) AS sx,
         |    CAST(sum($centsSql * $centsSql) AS BIGINT) AS sxx
         |  FROM events GROUP BY event_type
         |),
         |per AS (
         |  SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
         |    CAST(sum(sxx) AS BIGINT) AS sxxt,
         |    sum(${sumSqIiSql("sx", "ng")}) AS i,
         |    sum(CAST(${sumSqFrSql("sx", "ng")} AS DECIMAL(18,12))) AS f
         |  FROM g
         |),
         |tot AS (
         |  SELECT ${sumSqIiSql("sx", "ng")} AS it,
         |         ${sumSqFrSql("sx", "ng")} AS ft
         |  FROM (SELECT CAST(sum(sx) AS BIGINT) AS sx,
         |               CAST(sum(ng) AS BIGINT) AS ng FROM g)
         |),
         |b AS (
         |  SELECT k, n,
         |    round(CAST(i - it AS DOUBLE) + (CAST(f AS DOUBLE) - ft), 4) AS ssb,
         |    round(CAST(CAST(sxxt AS HUGEINT) - i AS DOUBLE)
         |          - CAST(f AS DOUBLE), 4) AS ssw
         |  FROM per CROSS JOIN tot
         |)
         |SELECT CAST(k AS BIGINT) AS k, n, ssb, ssw,
         |  round((ssb / (CAST(k AS DOUBLE) - 1)) /
         |        (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f
         |FROM b""".stripMargin,

    "q_kruskal" ->
      s"""WITH p AS (
         |  SELECT event_type, $centsSql AS cents, event_id FROM events
         |),
         |r AS (
         |  SELECT event_type,
         |         row_number() OVER (ORDER BY cents, event_id) AS rk
         |  FROM p
         |),
         |g AS (
         |  SELECT event_type, count(*) AS ng, CAST(sum(rk) AS BIGINT) AS rg
         |  FROM r GROUP BY event_type
         |),
         |a AS (
         |  SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
         |    sum(${sumSqIiSql("rg", "ng")}) AS i,
         |    sum(CAST(${sumSqFrSql("rg", "ng")} AS DECIMAL(18,12))) AS f
         |  FROM g
         |),
         |b AS (
         |  SELECT k, n,
         |    12 * i - 3 * CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS g,
         |    f
         |  FROM a
         |)
         |SELECT CAST(k AS BIGINT) AS k, n,
         |  round((CAST(g AS DOUBLE) + 12 * CAST(f AS DOUBLE))
         |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)), 6) AS h
         |FROM b""".stripMargin,

    "q_dsir_select" ->
      s"""WITH w0 AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |),
         |words AS (
         |  SELECT doc_id, source,
         |    ${hex2longSql("md5('dsir:' || w)", 1)} % $DsirBuckets AS f
         |  FROM w0 WHERE length(w) > 0
         |),
         |per_doc AS (
         |  SELECT doc_id, source, f, count(*) AS c
         |  FROM words GROUP BY 1, 2, 3
         |),
         |grid AS (
         |  SELECT g.f,
         |    coalesce(t.tc, 0) AS tc, coalesce(r.rc, 0) AS rc
         |  FROM (SELECT CAST(unnest(range($DsirBuckets)) AS BIGINT) AS f) g
         |  LEFT JOIN (SELECT f, count(*) AS tc FROM words
         |             WHERE source = 'src0' GROUP BY f) t ON t.f = g.f
         |  LEFT JOIN (SELECT f, count(*) AS rc FROM words
         |             WHERE source <> 'src0' GROUP BY f) r ON r.f = g.f
         |),
         |lam AS (
         |  SELECT f,
         |    CAST(round(
         |      ln((CAST(tc AS DOUBLE) + 1.0) /
         |         ((SELECT CAST(sum(tc) AS DOUBLE) FROM grid) + $DsirBuckets))
         |      - ln((CAST(rc AS DOUBLE) + 1.0) /
         |         ((SELECT CAST(sum(rc) AS DOUBLE) FROM grid) + $DsirBuckets)), 8)
         |      AS DECIMAL(18,8)) AS lam
         |  FROM grid
         |),
         |sc AS (
         |  SELECT p.doc_id, count(*) AS n_feats,
         |    CAST(sum(p.c) AS BIGINT) AS n_words,
         |    sum(p.c * l.lam) AS sc
         |  FROM per_doc p JOIN lam l ON l.f = p.f
         |  WHERE p.source <> 'src0'
         |  GROUP BY p.doc_id
         |)
         |SELECT doc_id, n_feats, n_words,
         |  CAST(sc AS DOUBLE) AS score
         |FROM sc ORDER BY sc DESC, doc_id LIMIT $DsirTopK""".stripMargin,

    "q_boilerplate" ->
      s"""WITH arr AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\. ') AS a FROM documents
         |),
         |xs AS (
         |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr
         |),
         |paras AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS i, trim(a[i]) AS para
         |  FROM xs WHERE length(trim(a[i])) > 0
         |),
         |df AS (
         |  SELECT para, count(DISTINCT doc_id) AS ndocs
         |  FROM paras GROUP BY para
         |),
         |j AS (
         |  SELECT p.doc_id, p.i, p.para, d.ndocs
         |  FROM paras p JOIN df d ON d.para = p.para
         |)
         |SELECT doc_id, count(*) AS n_paras,
         |  CAST(sum(CASE WHEN ndocs < $BoilerDf THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  md5(coalesce(string_agg(CASE WHEN ndocs < $BoilerDf THEN para END,
         |      '. ' ORDER BY i), '')) AS clean_md5
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_nmi" ->
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
         |cell AS (
         |  SELECT lang, source, count(*) AS nxy FROM documents GROUP BY 1, 2
         |),
         |nx AS (SELECT lang, count(*) AS nx FROM documents GROUP BY lang),
         |ny AS (SELECT source, count(*) AS ny FROM documents GROUP BY source),
         |mi AS (
         |  SELECT ${dsumSql(
           "round(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 8)", 8)} AS mi
         |  FROM cell JOIN nx USING (lang) JOIN ny USING (source) CROSS JOIN n
         |),
         |hx AS (
         |  SELECT ${dsumSql(
           "round(-CAST(nx AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 8)", 8)} AS hx
         |  FROM nx CROSS JOIN n
         |),
         |hy AS (
         |  SELECT ${dsumSql(
           "round(-CAST(ny AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 8)", 8)} AS hy
         |  FROM ny CROSS JOIN n
         |)
         |SELECT n, round(mi, 6) AS mi, round(hx, 6) AS hx,
         |  round(hy, 6) AS hy, round(mi / sqrt(hx * hy), 6) AS nmi
         |FROM n CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    "q_ktruss" ->
      s"""WITH os AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
         |),
         |e0 AS MATERIALIZED (
         |  SELECT a.sk AS u, b.sk AS v
         |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING count(*) >= $TrussMinW
         |),
         |${(1 to TrussRounds).map(trussRoundSql).mkString(",\n")}
         |${(0 to TrussRounds).map(i =>
           s"SELECT CAST($i AS BIGINT) AS round, count(*) AS n_edges FROM e$i")
           .mkString("\nUNION ALL ")}
         |ORDER BY round""".stripMargin,
  )
}
