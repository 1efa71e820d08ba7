package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Wave-38 additions — similarity-as-labeler, mixing audits, Luby MIS:
  *
  *  - q_knn_classify: kNN label prediction over the capped LSH buckets —
  *    each vector's label predicted by the majority vote of its top-3
  *    bucket neighbors (bucket-blocked only, NEVER label-blocked: using
  *    the target label to block would be circular), scored per true
  *    label. The "similarity search used as an annotator" evaluation a
  *    training pipeline runs before trusting embedding-propagated labels.
  *  - q_corpus_overlap: the cross-source n-gram overlap matrix — for
  *    every source pair, the count of shared distinct token-trigrams and
  *    both containment directions. The data-mixing audit ("how much of
  *    source B is already in source A") that q_mix_sources' weights and
  *    q_contamination's train/test split don't cover.
  *  - q_mis: Luby's maximal-independent-set (1986), 3 bounded rounds —
  *    deterministic md5-derived UNIQUE priorities, a vertex joins when
  *    its priority beats every remaining neighbor's, winners + their
  *    neighborhoods retire. The classic symmetry-breaking primitive
  *    (scheduling, graph coloring seeds) beside q_matching; identical
  *    unrolled rounds in the oracle (the q_matching precedent).
  *
  * Determinism: votes, overlaps and priorities are pure integer algebra;
  * kNN neighbor ranks order by the exact-integer-dot cosine (identical
  * IEEE divisions both engines) with id tie-breaks. */
object Wave38 {

  private val KnnK = 3
  private val MisRounds = 3

  /** Unique MIS priority: 6 md5 hex chars (< 2²⁴) × 10¹¹ + v — max value
    * ≈ 1.7e18, inside int64, and vertex ids up to 10¹¹ keep priorities
    * unique (l_partkey at sf=10 is ~2e7; 10¹¹ covers any plausible SF).
    * A raise_error column in the initial active-set plan guards the
    * precondition in-plan — no driver collect, no job, no NPE on an
    * empty edge set. Uniqueness makes the strict `<` comparison a total
    * order — no (priority, id) tuple compares needed. */
  private val PriorityStride = 100000000000L // 10^11
  private def prioritySpark(v: String): String =
    s"CAST(conv(substring(md5(concat('mis:', CAST($v AS STRING))), 1, 6), 16, 10) AS BIGINT) * $PriorityStride + $v"
  private def prioritySql(v: String): String =
    s"${hexLongSql(s"md5('mis:' || CAST($v AS VARCHAR))", 1, 6)} * $PriorityStride + $v"

  val queries: Map[String, Q] = strictMap(

    // KNN CLASSIFY: candidates from the capped LSH buckets (the
    // q_dedup_embcos machinery — over-cap buckets dropped, pairs bounded
    // at C(cap,2) per bucket), top-3 neighbors per vector by exact
    // cosine, majority vote with (count desc, label asc) tie-break,
    // per-true-label accuracy. Vectors in dropped/singleton buckets
    // simply aren't evaluated (mirrored in the oracle).
    "q_knn_classify" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bucketed = LlmOps.quantized(s, dir).where(col("nq") > 0)
        .withColumn("bucket",
          expr(LlmOps.lshBucketSparkExpr("q")).cast("long"))
        .ckpt()
      val ok = bucketed.groupBy("bucket").agg(count(lit(1)).as("bsz"))
        .where(col("bsz") <= LlmOps.BandBucketCap).select("bucket")
      val b = bucketed.join(ok, Seq("bucket")).ckpt()
      val nbrs = b.alias("a")
        .join(b.alias("c"), col("a.bucket") === col("c.bucket")
          && col("a.vec_id") =!= col("c.vec_id"))
        .select(col("a.vec_id").as("v"), col("a.label").as("true_label"),
          col("c.vec_id").as("cand"), col("c.label").as("nlabel"),
          expr("ivec_dot(a.q, c.q)").as("dot"),
          col("a.nq").as("na"), col("c.nq").as("nb"))
        .withColumn("cos", expr(LlmOps.CosExpr))
        .withColumn("rn", row_number().over(Window.partitionBy("v")
          .orderBy(desc("cos"), asc("cand"))))
        .where(col("rn") <= KnnK)
      val votes = nbrs.groupBy("v", "true_label", "nlabel")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("vr", row_number().over(Window.partitionBy("v")
          .orderBy(desc("cnt"), asc("nlabel"))))
        .where(col("vr") === 1)
      votes.groupBy(col("true_label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("nlabel") === col("true_label"), 1L).otherwise(0L))
            .as("n_correct"))
        .selectExpr("label", "CAST(n_eval AS BIGINT) AS n_eval",
          "CAST(n_correct AS BIGINT) AS n_correct",
          "round(CAST(n_correct AS DOUBLE) / n_eval, 6) AS accuracy")
        .orderBy("label")
    }),

    // CORPUS OVERLAP: distinct (source, trigram) pairs — ONE explode +
    // distinct — then a shingle-keyed self-join whose per-shingle output
    // is bounded by C(#sources, 2) (a CONSTANT: sources are a catalog,
    // not data), per-pair shared counts + both containments. Linear in
    // corpus shingles at any scale.
    "q_corpus_overlap" -> ((s, dir) => {
      val tri = table(s, dir, "documents")
        .select(col("source"),
          graft.operators.Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
          .as("sh"))
        .distinct()
        .ckpt() // per-source sizes + both self-join sides
      val sz = tri.groupBy("source").agg(count(lit(1)).as("n"))
      val co = tri.alias("x")
        .join(tri.alias("y"),
          col("x.sh") === col("y.sh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("s1"), col("y.source").as("s2"))
        .agg(count(lit(1)).as("n_common"))
      co.join(sz.select(col("source").as("s1"), col("n").as("n_s1")), "s1")
        .join(sz.select(col("source").as("s2"), col("n").as("n_s2")), "s2")
        .selectExpr("s1", "s2", "CAST(n_common AS BIGINT) AS n_common",
          "CAST(n_s1 AS BIGINT) AS n_s1", "CAST(n_s2 AS BIGINT) AS n_s2",
          "round(CAST(n_common AS DOUBLE) / n_s1, 6) AS containment_in_s1",
          "round(CAST(n_common AS DOUBLE) / n_s2, 6) AS containment_in_s2")
        .orderBy("s1", "s2")
    }),

    // MIS: per round ONE neighbor-min shuffle (p(v) vs min over active
    // neighbors; unique priorities make strict < a total order), winners
    // + their neighborhoods retire via two anti-joins. 3 bounded rounds,
    // identically unrolled in the oracle; isolated survivors join (min
    // over an empty neighborhood is +∞). Runs on the PART co-occurrence
    // graph (the q_kcore edges: basket ≤ 64, support ≥ 2) — the supplier
    // projection is COMPLETE at harness scale (its MIS is one vertex);
    // the part graph is sparse, so rounds do real symmetry-breaking.
    "q_mis" -> ((s, dir) => {
      val b0 = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val small = b0.groupBy("ok").agg(count(lit(1)).as("bsz"))
        .where(col("bsz") <= 64).select("ok")
      val bb = b0.join(small, "ok")
      // ckpt the projection ONCE: active and edges both consume it, and
      // un-materialized it would re-run the data-scale basket self-join
      // per consumer (measured: 2.4 s of q_mis's 11.9 s median was this
      // second projection run)
      val e0 = bb.select(col("ok"), col("pk").as("u"))
        .join(bb.select(col("ok"), col("pk").as("v")), "ok")
        .where(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
        .where(col("support") >= 2L)
        .selectExpr("CAST(u AS BIGINT) AS u", "CAST(v AS BIGINT) AS v")
        .ckpt()
      // in-plan precondition: ids must stay below the priority stride so
      // priorities are unique; fires during the eager ckpt materialization
      // (zero extra jobs, trivially true on an empty edge set)
      var active = e0.select(explode(array(col("u"), col("v"))).as("x"))
        .distinct()
        .select(when(col("x") >= lit(PriorityStride),
          raise_error(concat(lit("MIS priority stride assumes vertex ids < 10^11, got "),
            col("x").cast("string"))).cast("long"))
          .otherwise(col("x")).as("x"))
        .ckpt()
      var edges = e0
      val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (r <- 1 to MisRounds) {
        // cheap md5 projection over the ckpt'd active set — both
        // consumers (neighbor-min side, winner join) recompute it faster
        // than an eager barrier would materialize it
        val pri = active.select(col("x").as("v"),
          expr(prioritySpark("x")).as("p"))
        val sym = edges.select(col("u").as("v"), col("v").as("n"))
          .unionByName(edges.select(col("v").as("v"), col("u").as("n")))
        val nbrMin = sym
          .join(pri.select(col("v").as("n"), col("p").as("np")), "n")
          .groupBy("v").agg(min("np").as("minp"))
        val mis = pri.join(nbrMin, Seq("v"), "left_outer")
          .where(col("minp").isNull || col("p") < col("minp"))
          .select(col("v")).ckpt() // output + retirement joins
        out += mis.select(col("v"), lit(r.toLong).as("round"))
        val retired = mis
          .unionByName(sym.join(mis, Seq("v")).select(col("n").as("v")))
          .distinct()
        active = active.join(retired.select(col("v").as("x")),
          Seq("x"), "left_anti").ckpt()
        edges = edges
          .join(retired.select(col("v").as("u")), Seq("u"), "left_anti")
          .join(retired.select(col("v")), Seq("v"), "left_anti")
          .ckpt()
      }
      out.reduce(_ unionByName _)
        .selectExpr("CAST(v AS BIGINT) AS v", "CAST(round AS BIGINT) AS round")
        .orderBy("round", "v")
    }),
  )

  private val TriSql =
    s"""t AS (
       |  SELECT source,
       |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' ') AS ws
       |  FROM documents
       |),
       |tt AS (SELECT * FROM t WHERE len(ws) >= 3),
       |tri AS (
       |  SELECT DISTINCT source,
       |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
       |  FROM (SELECT source, ws,
       |               unnest(generate_series(1, len(ws)-2)) AS i FROM tt)
       |)""".stripMargin

  /** One unrolled Luby round over active set a$p / edges e$p. Every CTE
    * is MATERIALIZED: the round chain references e/sym/ret several times
    * each, and DuckDB's default inlining re-evaluates the whole upstream
    * chain per reference — multiplicative across 3 rounds (the q_mst
    * oracle lesson; unhinted this oracle did not finish in minutes). */
  private def misRoundSql(i: Int): String = {
    val p = i - 1
    s"""pri$i AS MATERIALIZED (SELECT x AS v, ${prioritySql("x")} AS p FROM a$p),
       |sym$i AS MATERIALIZED (SELECT u AS v, v AS n FROM e$p
       |          UNION ALL SELECT v, u FROM e$p),
       |nm$i AS MATERIALIZED (
       |  SELECT s.v, min(pp.p) AS minp
       |  FROM sym$i s JOIN pri$i pp ON s.n = pp.v
       |  GROUP BY s.v
       |),
       |m$i AS MATERIALIZED (
       |  SELECT pri$i.v FROM pri$i LEFT JOIN nm$i ON pri$i.v = nm$i.v
       |  WHERE nm$i.minp IS NULL OR pri$i.p < nm$i.minp
       |),
       |ret$i AS MATERIALIZED (
       |  SELECT v FROM m$i
       |  UNION
       |  SELECT s.n AS v FROM sym$i s JOIN m$i ON s.v = m$i.v
       |),
       |a$i AS MATERIALIZED (
       |  SELECT x FROM a$p WHERE x NOT IN (SELECT v FROM ret$i)),
       |e$i AS MATERIALIZED (
       |  SELECT u, v FROM e$p
       |  WHERE u NOT IN (SELECT v FROM ret$i)
       |    AND v NOT IN (SELECT v FROM ret$i))""".stripMargin
  }

  val oracle: Map[String, String] = strictMap(

    "q_knn_classify" ->
      s"""WITH ${LlmOps.QuantizedNormSql},
         |${LlmOps.lshBucketSql},
         |sel AS (SELECT e.vec_id, e.label, e.embedding, qn.nq, b.bucket
         |        FROM embeddings e
         |        JOIN qn ON e.vec_id = qn.vec_id
         |        JOIN buckets b ON e.vec_id = b.vec_id
         |        WHERE qn.nq > 0),
         |ok AS (SELECT bucket FROM sel
         |       GROUP BY bucket HAVING count(*) <= ${LlmOps.BandBucketCap}),
         |sb AS (SELECT sel.* FROM sel JOIN ok USING (bucket)),
         |p AS (
         |  SELECT a.vec_id AS v, a.label AS true_label,
         |         c.vec_id AS cand, c.label AS nlabel,
         |         a.embedding AS ea, c.embedding AS eb,
         |         a.nq AS na, c.nq AS nb
         |  FROM sb a JOIN sb c
         |    ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
         |),
         |d AS (
         |  SELECT v, true_label, cand, nlabel, na, nb,
         |    CAST(sum(${LlmOps.quantSqlElem("ea[i]")} *
         |             ${LlmOps.quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(ea))) AS i FROM p)
         |  GROUP BY v, true_label, cand, nlabel, na, nb
         |),
         |n3 AS (
         |  SELECT v, true_label, nlabel FROM (
         |    SELECT v, true_label, nlabel,
         |      row_number() OVER (PARTITION BY v
         |        ORDER BY ${LlmOps.CosExpr} DESC, cand) AS rn
         |    FROM d) WHERE rn <= $KnnK
         |),
         |votes AS (
         |  SELECT v, true_label, nlabel FROM (
         |    SELECT v, true_label, nlabel,
         |      row_number() OVER (PARTITION BY v
         |        ORDER BY count(*) DESC, nlabel) AS vr
         |    FROM n3 GROUP BY v, true_label, nlabel
         |  ) WHERE vr = 1
         |)
         |SELECT CAST(true_label AS BIGINT) AS label,
         |  CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(sum(CASE WHEN nlabel = true_label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  round(CAST(sum(CASE WHEN nlabel = true_label THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS accuracy
         |FROM votes GROUP BY true_label ORDER BY label""".stripMargin,

    "q_corpus_overlap" ->
      s"""WITH $TriSql,
         |sz AS (SELECT source, count(*) AS n FROM tri GROUP BY source),
         |co AS (
         |  SELECT x.source AS s1, y.source AS s2, count(*) AS n_common
         |  FROM tri x JOIN tri y
         |    ON x.sh = y.sh AND x.source < y.source
         |  GROUP BY 1, 2
         |)
         |SELECT s1, s2, CAST(n_common AS BIGINT) AS n_common,
         |  CAST(a.n AS BIGINT) AS n_s1, CAST(b.n AS BIGINT) AS n_s2,
         |  round(CAST(n_common AS DOUBLE) / a.n, 6) AS containment_in_s1,
         |  round(CAST(n_common AS DOUBLE) / b.n, 6) AS containment_in_s2
         |FROM co
         |JOIN sz a ON co.s1 = a.source
         |JOIN sz b ON co.s2 = b.source
         |ORDER BY s1, s2""".stripMargin,

    "q_mis" -> {
      val rounds = (1 to MisRounds).map(misRoundSql).mkString(",\n")
      val out = (1 to MisRounds).map(i =>
        s"SELECT v, CAST($i AS BIGINT) AS round FROM m$i")
        .mkString("\nUNION ALL\n")
      s"""WITH b AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |),
         |small AS MATERIALIZED (
         |  SELECT ok FROM b GROUP BY ok HAVING count(*) <= 64),
         |e0 AS MATERIALIZED (
         |  SELECT CAST(a.pk AS BIGINT) AS u, CAST(c.pk AS BIGINT) AS v
         |  FROM (SELECT * FROM b JOIN small USING (ok)) a
         |  JOIN (SELECT * FROM b JOIN small USING (ok)) c USING (ok)
         |  WHERE a.pk < c.pk GROUP BY 1, 2 HAVING count(*) >= 2
         |),
         |a0 AS MATERIALIZED (SELECT u AS x FROM e0 UNION SELECT v FROM e0),
         |$rounds
         |SELECT CAST(v AS BIGINT) AS v, round
         |FROM ($out) ORDER BY round, v""".stripMargin
    },
  )
}
