package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-37 additions — blocking economics, MST clustering, graph ANN:
  *
  *  - q_blocking_quality: the record-linkage blocking audit (Christen's
  *    reduction ratio + pairs completeness) for three classic candidate
  *    generators — first-2-char prefix blocks, equal-length blocks,
  *    sorted-neighborhood window 3 — measured against the exact lev ≤ 2
  *    ground truth. Candidate volumes are COUNTED (Σ n(n−1)/2 per block,
  *    128-bit), never materialized — the q_lsh_planner discipline applied
  *    to ER blocking.
  *  - q_single_linkage: single-linkage clustering as an MST threshold
  *    cut — the FULL converged Borůvka forest ([[graft.operators.Mst]])
  *    cut at w ≤ 8, components over the kept edges. The oracle computes
  *    the same clusters by a DIFFERENT algorithm (components of the
  *    thresholded ORIGINAL graph — equal by the classic Kruskal/
  *    single-linkage property), so the hash match doubles as an
  *    end-to-end proof of Mst.run's forest on harness data.
  *  - q_nn_descent: one NN-descent refinement round (Dong et al. '11,
  *    the graph-ANN construction step behind HNSW-family indexes) over
  *    the LSH-bucket top-1 graph: candidates = current neighbor ∪
  *    neighbor-of-neighbor ∪ reverse edges, rescored with the exact
  *    integer cosine, per-vector top-1 kept. Output marks which vectors
  *    improved — the measured "does one round help" audit.
  *
  * Determinism: blocking counts and coverage are pure integer algebra
  * (ratios are divisions of exact integers, spelled identically in both
  * engines); MST + CC labels are min-id integer fixpoints; NN-descent
  * ranks by round-6 cosine of exact integer dots, ties to smaller id. */
object Wave37 {

  /** Sorted-neighborhood window (the q_er_sorted_neighborhood geometry). */
  private val SnWindow = 3
  /** Single-linkage cut, RELATIVE to the corpus: w ≤ min(w) + SlSlack.
    * Co-purchase weights scale with SF (more orders ⇒ higher counts), so
    * an absolute cut is scale-brittle — sf0.01's minimum weight is ~10
    * and a fixed w ≤ 8 cut selects nothing. min+slack is exact integer
    * algebra in both engines. */
  private val SlSlack = 3L

  /** ASCII vocabulary (the q_fuzzy_match population). */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    corpusToks(s, dir).select("word").distinct()
      .where(col("word").rlike("^[ -~]+$"))

  val queries: Map[String, Q] = strictMap(

    // BLOCKING QUALITY: ONE vocabulary pass per scheme for the counted
    // candidate volume (partial-agg'd block sizes, Σ C(n,2) in DECIMAL),
    // the lev ≤ 2 truth from the SymSpell-complete deletion-neighborhood
    // join (FuzzyJoin — completeness proven by the q_fuzzy_match oracle),
    // and coverage as cheap predicates over the truth table (prefix/
    // length equality; rank distance via two broadcast-sized rank joins).
    // Nothing quadratic is ever materialized.
    "q_blocking_quality" -> ((s, dir) => {
      val words = vocab(s, dir).ckpt() // 3 block-counts + ranks + |V|
      val truth = graft.operators.FuzzyJoin.matchPairs(words, "word", 2)
        .select("w1", "w2").ckpt() // 3 coverage passes
      val nV = words.agg(count(lit(1)).cast("long").as("n_v"))
      val nTruth = truth.agg(count(lit(1)).cast("long").as("n_truth"))
      def blockCands(key: org.apache.spark.sql.Column) = words
        .groupBy(key.as("k")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("CAST(n AS DECIMAL(38,0)) * (n - 1) / 2")),
          expr("CAST(0 AS DECIMAL(38,0))")).cast("decimal(38,0)").as("cand"))
      val ranked = graft.operators.Ranks
        .withinKey(words.withColumn("one", lit(1)), "one", Seq("word"))
        .drop("one")
      val snCovered = truth
        .join(ranked.select(col("word").as("w1"), col("rk").as("r1")), "w1")
        .join(ranked.select(col("word").as("w2"), col("rk").as("r2")), "w2")
        .where(col("r2") - col("r1") <= SnWindow)
        .agg(count(lit(1)).cast("long").as("cov"))
      val schemes = Seq(
        ("prefix2",
          blockCands(expr("substring(word, 1, 2)")),
          truth.where(expr("substring(w1, 1, 2) = substring(w2, 1, 2)"))
            .agg(count(lit(1)).cast("long").as("cov"))),
        ("length",
          blockCands(length(col("word"))),
          truth.where(length(col("w1")) === length(col("w2")))
            .agg(count(lit(1)).cast("long").as("cov"))),
        ("sorted_neighborhood",
          // window-3 candidates are exactly Σ_{d=1..3}(V−d) = 3V−6
          nV.select(expr(s"CAST(GREATEST($SnWindow * n_v - " +
            s"${SnWindow * (SnWindow + 1) / 2}, 0) AS DECIMAL(38,0))")
            .as("cand")),
          snCovered))
      schemes.map { case (name, cand, cov) =>
        cand.crossJoin(broadcast(cov)).crossJoin(broadcast(nV))
          .crossJoin(broadcast(nTruth))
          .selectExpr(s"'$name' AS scheme",
            "CAST(cand AS BIGINT) AS n_candidates",
            // all-pairs C(V,2) and the ratio: exact integers into one
            // identically-spelled double division on both engines
            "round(CAST(1 AS DOUBLE) - CAST(cand AS DOUBLE) / " +
              "(CAST(n_v AS DOUBLE) * (n_v - 1) / 2), 6) AS reduction",
            "CAST(n_truth AS BIGINT) AS n_truth",
            "CAST(cov AS BIGINT) AS n_covered",
            "round(CAST(cov AS DOUBLE) / n_truth, 6) AS completeness")
      }.reduce(_ unionByName _).orderBy("scheme")
    }),

    // SINGLE LINKAGE: the converged Borůvka forest (Mst.run — O(log V)
    // rounds, loud contract), cut at w ≤ min(w)+slack, hooking CC over
    // the KEPT FOREST edges only (≤ V−1 of them — never the full graph),
    // cluster sizes for clusters of ≥ 2. The oracle never sees the MST:
    // it takes components of the thresholded original graph directly —
    // the two are equal by the Kruskal exchange property, making this a
    // value-level proof of the forest.
    "q_single_linkage" -> ((s, dir) => {
      val os = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val e = os.alias("a").join(os.alias("b"), Seq("ok"))
        .where(col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 5L)
        .selectExpr("CAST(u AS BIGINT) AS src", "CAST(v AS BIGINT) AS dst",
          "CAST(w AS BIGINT) AS w")
        .ckpt() // feeds the MST loop AND the threshold aggregate
      val tau = broadcast(e.agg((min("w") + SlSlack).as("tau")))
      val kept = graft.operators.Mst.run(e).crossJoin(tau)
        .where(col("w") <= col("tau"))
        .select(col("u").as("a"), col("v").as("b"))
      val (labels, _) = graft.operators.ConnectedComponents.labels(kept)
      labels.groupBy(col("l").as("cluster"))
        .agg(count(lit(1)).as("n_members"))
        .where(col("n_members") >= 2L)
        .selectExpr("CAST(cluster AS BIGINT) AS cluster",
          "CAST(n_members AS BIGINT) AS n_members")
        .orderBy("cluster")
    }),

    // NN-DESCENT: nn0 = per-vector top-1 within the capped (label ∩ LSH
    // bucket) groups (the q_mutual_knn candidate machinery), then ONE
    // refinement round — candidates from the O(V)-row nn0 table alone
    // (own neighbor, neighbor-of-neighbor through one self-join, reverse
    // edges), exact-integer-cosine rescore, top-1 kept. Candidate volume
    // is ≤ 3 rows per vector BY CONSTRUCTION — the whole round is O(V)
    // regardless of corpus size, which is precisely why NN-descent is
    // the scale path when buckets are too coarse.
    "q_nn_descent" -> ((s, dir) => {
      val bucketed = LlmOps.quantized(s, dir).where(col("nq") > 0)
        .withColumn("bucket",
          expr(LlmOps.lshBucketSparkExpr("q")).cast("long"))
        .ckpt()
      val ok = bucketed.groupBy("label", "bucket")
        .agg(count(lit(1)).as("gsz"))
        .where(col("gsz") <= LlmOps.BandBucketCap)
        .select("label", "bucket")
      // bk keeps the (label, bucket) keys for the base-graph self-join;
      // b is the key-free projection both rescore sides read
      val bk = bucketed.join(ok, Seq("label", "bucket")).ckpt()
      val b = bk.select("vec_id", "q", "nq")
      val pairs0 = bk.alias("a")
        .join(bk.alias("b"), col("a.label") === col("b.label")
          && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("v"), col("b.vec_id").as("u"),
          expr("ivec_dot(a.q, b.q)").as("dot"),
          col("a.nq").as("na"), col("b.nq").as("nb"))
        .withColumn("cos", expr(s"round(${LlmOps.CosExpr}, 6)"))
        .select("v", "u", "cos")
      val nn0 = graft.operators.TopK.perKey(pairs0, Seq("v"),
        Seq(("cos", false), ("u", true)), 1).ckpt()
      // one descent round: v's candidates = {nn0(v)} ∪ {nn0(nn0(v))} ∪
      // {u : nn0(u) = v}; dedup, drop self, exact rescore, top-1
      val hop2 = nn0.select(col("v"), col("u").as("m"))
        .join(nn0.select(col("v").as("m"), col("u").as("u2")), "m")
        .select(col("v"), col("u2").as("u"))
      val rev = nn0.select(col("u").as("v"), col("v").as("u"))
      val cands = nn0.select("v", "u")
        .unionByName(hop2).unionByName(rev)
        .where(col("v") =!= col("u")).distinct()
      val rescored = cands
        .join(b.select(col("vec_id").as("v"), col("q").as("qa"),
          col("nq").as("na")), "v")
        .join(b.select(col("vec_id").as("u"), col("q").as("qb"),
          col("nq").as("nb")), "u")
        .select(col("v"), col("u"),
          expr("ivec_dot(qa, qb)").as("dot"),
          col("na"), col("nb"))
        .withColumn("cos", expr(s"round(${LlmOps.CosExpr}, 6)"))
        .select("v", "u", "cos")
      val nn1 = graft.operators.TopK.perKey(rescored, Seq("v"),
        Seq(("cos", false), ("u", true)), 1)
      nn0.select(col("v"), col("u").as("u0"), col("cos").as("cos0"))
        .join(nn1.select(col("v"), col("u").as("u1"), col("cos").as("cos1")),
          "v")
        .selectExpr("v", "u0", "cos0", "u1", "cos1",
          "CAST(CASE WHEN cos1 > cos0 THEN 1 ELSE 0 END AS BIGINT)" +
            " AS improved")
        .orderBy("v")
    }),
  )

  private val VocabSql =
    s"""${Reference.ToksSql},
       |words AS (SELECT DISTINCT word FROM toks
       |          WHERE regexp_matches(word, '^[ -~]+$$'))""".stripMargin

  /** Co-purchase w ≥ 5 edges (the q_mst `e` CTE). */
  private val CoEdgeSql =
    """os AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
      |),
      |e AS MATERIALIZED (
      |  SELECT CAST(a.sk AS BIGINT) AS u, CAST(b.sk AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS w
      |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
      |  GROUP BY 1, 2 HAVING count(*) >= 5
      |)""".stripMargin

  val oracle: Map[String, String] = strictMap(

    "q_blocking_quality" -> {
      val allPairs = "CAST(n_v AS DOUBLE) * (n_v - 1) / 2"
      s"""WITH $VocabSql,
         |truth AS (
         |  SELECT x.word AS w1, y.word AS w2
         |  FROM words x JOIN words y
         |    ON x.word < y.word AND levenshtein(x.word, y.word) <= 2
         |),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_v FROM words),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |r AS (SELECT word, row_number() OVER (ORDER BY word) AS rk
         |      FROM words),
         |pc AS (SELECT coalesce(sum(CAST(n AS HUGEINT) * (n - 1) // 2),
         |                       CAST(0 AS HUGEINT)) AS cand
         |       FROM (SELECT substring(word, 1, 2) AS k, count(*) AS n
         |             FROM words GROUP BY 1)),
         |lc AS (SELECT coalesce(sum(CAST(n AS HUGEINT) * (n - 1) // 2),
         |                       CAST(0 AS HUGEINT)) AS cand
         |       FROM (SELECT length(word) AS k, count(*) AS n
         |             FROM words GROUP BY 1)),
         |sc AS (SELECT CAST(GREATEST($SnWindow * n_v -
         |                ${SnWindow * (SnWindow + 1) / 2}, 0) AS HUGEINT)
         |         AS cand FROM nv),
         |pcov AS (SELECT CAST(count(*) AS BIGINT) AS cov FROM truth
         |         WHERE substring(w1, 1, 2) = substring(w2, 1, 2)),
         |lcov AS (SELECT CAST(count(*) AS BIGINT) AS cov FROM truth
         |         WHERE length(w1) = length(w2)),
         |scov AS (
         |  SELECT CAST(count(*) AS BIGINT) AS cov
         |  FROM truth
         |  JOIN r a ON truth.w1 = a.word
         |  JOIN r b ON truth.w2 = b.word
         |  WHERE b.rk - a.rk <= $SnWindow
         |)
         |SELECT scheme, CAST(cand AS BIGINT) AS n_candidates,
         |  round(CAST(1 AS DOUBLE) - CAST(cand AS DOUBLE) / ($allPairs), 6)
         |    AS reduction,
         |  n_truth, cov AS n_covered,
         |  round(CAST(cov AS DOUBLE) / n_truth, 6) AS completeness
         |FROM (
         |  SELECT 'prefix2' AS scheme, pc.cand, nt.n_truth, pcov.cov, nv.n_v
         |  FROM pc, nt, pcov, nv
         |  UNION ALL
         |  SELECT 'length', lc.cand, nt.n_truth, lcov.cov, nv.n_v
         |  FROM lc, nt, lcov, nv
         |  UNION ALL
         |  SELECT 'sorted_neighborhood', sc.cand, nt.n_truth, scov.cov, nv.n_v
         |  FROM sc, nt, scov, nv
         |) ORDER BY scheme""".stripMargin
    },

    "q_single_linkage" -> {
      // components of the thresholded ORIGINAL graph — never the MST —
      // via the same unrolled MATERIALIZED hooking stages as q_mst
      val (ccFrags, last) = Wave36.ccStageSql("sl", "symsl", "comp0sl")
      s"""WITH $CoEdgeSql,
         |ecut AS MATERIALIZED (
         |  SELECT u, v FROM e
         |  WHERE w <= (SELECT min(w) + $SlSlack FROM e)),
         |vertsl AS MATERIALIZED (
         |  SELECT u AS x FROM ecut UNION SELECT v FROM ecut),
         |comp0sl AS MATERIALIZED (SELECT x AS v, x AS l FROM vertsl),
         |symsl AS MATERIALIZED (
         |  SELECT u AS a, v AS b FROM ecut
         |  UNION ALL SELECT v, u FROM ecut),
         |${ccFrags.mkString(",\n")}
         |SELECT CAST(l AS BIGINT) AS cluster,
         |       CAST(count(*) AS BIGINT) AS n_members
         |FROM $last GROUP BY l HAVING count(*) >= 2
         |ORDER BY cluster""".stripMargin
    },

    "q_nn_descent" ->
      s"""WITH ${LlmOps.QuantizedNormSql},
         |${LlmOps.lshBucketSql},
         |qv AS MATERIALIZED (
         |  SELECT e.vec_id, e.label, e.embedding, qn.nq, b.bucket
         |  FROM embeddings e
         |  JOIN qn ON e.vec_id = qn.vec_id
         |  JOIN buckets b ON e.vec_id = b.vec_id
         |  WHERE qn.nq > 0),
         |okg AS (SELECT label, bucket FROM qv
         |        GROUP BY label, bucket
         |        HAVING count(*) <= ${LlmOps.BandBucketCap}),
         |qb AS MATERIALIZED (SELECT qv.* FROM qv JOIN okg USING (label, bucket)),
         |p0 AS (
         |  SELECT a.vec_id AS v, b.vec_id AS u, a.embedding AS ea,
         |         b.embedding AS eb, a.nq AS na, b.nq AS nb
         |  FROM qb a JOIN qb b ON a.label = b.label
         |                     AND a.bucket = b.bucket
         |                     AND a.vec_id <> b.vec_id
         |),
         |d0 AS (
         |  SELECT v, u, na, nb,
         |    CAST(sum(${LlmOps.quantSqlElem("ea[i]")} *
         |             ${LlmOps.quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p0.*, unnest(generate_series(1, len(ea))) AS i FROM p0)
         |  GROUP BY v, u, na, nb
         |),
         |c0 AS (SELECT v, u, round(${LlmOps.CosExpr}, 6) AS cos FROM d0),
         |nn0 AS MATERIALIZED (
         |  SELECT v, u, cos FROM (
         |    SELECT v, u, cos,
         |      row_number() OVER (PARTITION BY v ORDER BY cos DESC, u) AS rn
         |    FROM c0) WHERE rn = 1
         |),
         |cands AS MATERIALIZED (
         |  SELECT DISTINCT v, u FROM (
         |    SELECT v, u FROM nn0
         |    UNION ALL
         |    SELECT x.v, y.u FROM nn0 x JOIN nn0 y ON x.u = y.v
         |    UNION ALL
         |    SELECT u AS v, v AS u FROM nn0
         |  ) WHERE v <> u
         |),
         |p1 AS (
         |  SELECT c.v, c.u, a.embedding AS ea, b.embedding AS eb,
         |         a.nq AS na, b.nq AS nb
         |  FROM cands c
         |  JOIN qb a ON c.v = a.vec_id
         |  JOIN qb b ON c.u = b.vec_id
         |),
         |d1 AS (
         |  SELECT v, u, na, nb,
         |    CAST(sum(${LlmOps.quantSqlElem("ea[i]")} *
         |             ${LlmOps.quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p1.*, unnest(generate_series(1, len(ea))) AS i FROM p1)
         |  GROUP BY v, u, na, nb
         |),
         |c1 AS (SELECT v, u, round(${LlmOps.CosExpr}, 6) AS cos FROM d1),
         |nn1 AS (
         |  SELECT v, u, cos FROM (
         |    SELECT v, u, cos,
         |      row_number() OVER (PARTITION BY v ORDER BY cos DESC, u) AS rn
         |    FROM c1) WHERE rn = 1
         |)
         |SELECT nn0.v AS v, nn0.u AS u0, nn0.cos AS cos0,
         |  nn1.u AS u1, nn1.cos AS cos1,
         |  CAST(CASE WHEN nn1.cos > nn0.cos THEN 1 ELSE 0 END AS BIGINT)
         |    AS improved
         |FROM nn0 JOIN nn1 ON nn0.v = nn1.v
         |ORDER BY v""".stripMargin,
  )
}
