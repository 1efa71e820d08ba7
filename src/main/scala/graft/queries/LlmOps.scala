package graft.queries

import graft.operators.Tokenize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Training-data pipeline operators over `documents` and `embeddings` —
  * deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search, and text analysis.
  *
  * Cross-engine determinism strategy (each query is DuckDB-oracle-checked):
  *  - All hashing is md5-derived: Spark `md5()` and DuckDB `md5()` emit the
  *    same lowercase hex, so hash families built from md5 substrings agree
  *    bit-for-bit. 32-bit values are extracted from the hex digest (Spark:
  *    `conv(substr,16,10)`; DuckDB: an 8-term positional polynomial) and
  *    combined with the Kirsch-Mitzenmacher construction h_i = a + i·b,
  *    giving 16 independent hashes from ONE md5 per shingle.
  *  - Float vectors are quantized to integers (`floor(x*1000 + 0.5)`) before
  *    dot products: integer sums are exact in double (< 2^53), hence
  *    order-independent and identical across engines; the final cosine is a
  *    single deterministic IEEE expression over those exact integers.
  *
  * Scale notes: the LSH path (shingle → minhash → band → bucket join) is the
  * 100 TB design — cost is O(docs · shingles) plus a join whose width is
  * controlled by band selectivity; the all-pairs paths are blocked (by
  * `label` / `source`) and sampled, and exist as correctness baselines for
  * the LSH/IVF variants.
  */
object LlmOps {
  import Tokenize.Delim

  // ---- minhash / shingle constants (shared Spark + SQL) ----
  private val K = 8        // char-shingle width
  private val Stride = 3   // shingle stride (sampled positions)
  private val H = 16       // minhash family size
  private val Bands = 4    // LSH bands ...
  private val R = 4        // ... of R rows each (H = Bands * R)
  private val Mod = 4294967296L // 2^32

  private def docs(s: SparkSession, dir: String) = table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = table(s, dir, "embeddings")
  private def toks(s: SparkSession, dir: String): DataFrame = corpusToks(s, dir)

  /** Synthetic media-payload fixture table (doc_id, payload), materialized
    * ONCE per (JVM, sf dir, kind) under [[TmpRoot]]: the PNG/zlib ENCODE
    * is fixture construction, not the operator under test, so persisting
    * it keeps the multimodal bench numbers measuring DECODE (round-4
    * finding: payload synthesis was 30-50% of q_multimodal_decode's
    * headline cost). Re-reads land pre-spread across parquet splits; the
    * repartition in the consuming queries still rebalances for the
    * CPU-bound codec stage. Deterministic: same construction rule, same
    * JVM deflater → identical bytes every run, oracle unchanged. */
  private[queries] def mediaTable(s: SparkSession, dir: String, kind: String): DataFrame = {
    import s.implicits._
    val base = s"$TmpRoot/media_${kind}_${new java.io.File(dir).getName}"
    if (!new java.io.File(base, "_SUCCESS").exists()) {
      val ids = docs(s, dir).select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism)
      val recs = kind match {
        case "png" => ids.as[Long].mapPartitions(_.map(id =>
          graft.operators.MediaRecord(id, graft.operators.Multimodal.pngPayload(id))))
        case "video" => ids.as[Long].mapPartitions(_.map(id =>
          graft.operators.MediaRecord(id, graft.operators.Multimodal.videoPayload(id))))
        case "wav" => ids.as[Long].mapPartitions(_.map(id =>
          graft.operators.MediaRecord(id, graft.operators.Multimodal.wavPayload(id))))
        case "zlib" => docs(s, dir).select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism).as[(Long, String)]
          .mapPartitions(_.map { case (id, t) => graft.operators.MediaRecord(
            id, graft.operators.Multimodal.deflatePayload(t)) })
        case other => sys.error(s"unknown media kind $other")
      }
      recs.write.mode("overwrite").parquet(base)
    }
    s.read.parquet(base)
  }

  /** Persist break-even for multi-consumer dedup intermediates, on the
    * optimizer's size estimate of the intermediate: below it, recomputing
    * the narrow codegen'd pipeline 2-3× beats materialization (measured at
    * sf0.1: the minhash trio runs 13.2 s recomputed vs 21.7 s persisted —
    * SCALE.md "Persist points"); above it the corpus scan dominates and
    * reuse wins. */
  private val PersistAutoBytes = BigInt(256L * 1024 * 1024)

  /** Cache a multi-consumer dedup intermediate (bands / shingle sets /
    * trigram incidence), governed by `spark.graft.dedup.persist`:
    * `auto` (default) persists when the plan's estimated size exceeds
    * [[PersistAutoBytes]]; `true`/`false` force it. Callers run inside
    * Bench/Verify, which clearCache() per query. */
  private def maybePersist(df: DataFrame): DataFrame = {
    val mode = df.sparkSession.conf.get("spark.graft.dedup.persist", "auto")
    val on = mode match {
      case "auto" =>
        df.queryExecution.optimizedPlan.stats.sizeInBytes > PersistAutoBytes
      case v => v.toBoolean
    }
    if (on) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
  }

  // ---- language-ID stopword lists (tiny n-gram-free heuristic) ----
  private[queries] val Stops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "que"))

  private[queries] def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Language-characteristic character bigrams (same length per
    * alternative — keeps non-overlapping scan counts engine-identical). */
  private val Bigrams: Seq[(String, String)] = Seq(
    "en" -> "th|he|in|er|an",
    "fr" -> "le|de|es|en|on",
    "de" -> "ch|ei|ie|un|sc",
    "es" -> "ll|el|la|os|as")

  /** Deterministic argmax chain over the four scores (ties → earlier lang). */
  private[queries] val PredCase: String =
    """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
      |     WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
      |     WHEN s_de >= s_es THEN 'de'
      |     ELSE 'es' END""".stripMargin

  /** BPE-ish token pattern for token counting (letters / digits / symbol). */
  private val BpePattern = """[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"""

  // ---- embedding quantization (shared semantics) ----
  // q_i = floor(x_i * 1000 + 0.5) as BIGINT; |q| ≤ ~10^4 so dot products over
  // 64 dims stay < 2^53 → exact in double → order-free.
  private[queries] val QuantSpark =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))"
  private[queries] def quantSqlElem(e: String) =
    s"CAST(floor(CAST($e AS DOUBLE)*1000 + 0.5) AS BIGINT)"

  private[queries] val CosExpr = // over exact-integer dot & norms, identical both engines
    "CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"

  /** ANN-family query-set size: every ANN query (brute force, IVF, PQ,
    * LSH, recall calibration, hard negatives) scans k·|probe| candidate
    * pairs per query, so k must be a CONSTANT (top-k by exact integer
    * self-norm, tie-break vec_id), never a fraction of the corpus — a
    * fractional query set makes even the bucketed probes Θ(n²/const)
    * (the q_closeness lesson, applied family-wide in round 7). */
  private[queries] val AnnQueryK = 32

  /** The deterministic constant ANN query-id set over a `quantized`
    * frame: the [[AnnQueryK]] largest self-norms, tie-break vec_id. */
  private[queries] def annQueryIds(all: DataFrame): DataFrame =
    broadcast(all.where(col("nq") > 0)
      .orderBy(desc("nq"), asc("vec_id")).limit(AnnQueryK)
      .select("vec_id"))

  /** DuckDB twin of [[annQueryIds]] — a CTE body over the `qn` norms
    * CTE ([[QuantizedNormSql]]). */
  private[queries] val AnnQidsSql: String =
    s"""qids AS (SELECT vec_id FROM qn WHERE nq > 0
       |         ORDER BY nq DESC, vec_id LIMIT $AnnQueryK)""".stripMargin

  // ---- random-hyperplane LSH (deterministic, engine-independent) ----
  // 8 hyperplanes of 64 integer weights in [-1000, 1000], derived from md5
  // of "lsh:p:i" at catalog-build time and inlined as LITERALS into both
  // the Spark plan and the oracle SQL — so there is nothing to keep in
  // sync at runtime. Signs of exact integer dots → a 8-bit bucket.
  private val LshPlanes = 8
  private val LshDims = 64
  private val LshW: IndexedSeq[IndexedSeq[Long]] =
    (0 until LshPlanes).map { p =>
      (0 until LshDims).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lsh:$p:$i".getBytes("UTF-8"))
        val v = java.lang.Long.parseLong(
          md.take(4).map("%02x".format(_)).mkString, 16)
        (v % 2001L) - 1000L
      }
    }

  /** SQL/expr fragment: the bucket of a quantized vector expression where
    * element i is `qElem(i)` (1-based i). Generated identically for Spark
    * (over an array column) and DuckDB (over unnested elements). */
  private[queries] def lshBucketSparkExpr(qCol: String): String = {
    // dot_p via aggregate over zip_with(q, literal array)
    val bits = (0 until LshPlanes).map { p =>
      val arr = LshW(p).mkString("array(", "L, ", "L)")
      s"(CASE WHEN ivec_dot($qCol, $arr) > 0 THEN ${1 << p} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** DuckDB bucket CTE over (vec_id, i, q) long-format rows. */
  private[queries] def lshBucketSql: String = {
    val sums = (0 until LshPlanes).map { p =>
      val arr = LshW(p).mkString("[", ", ", "]")
      s"(CASE WHEN sum(q * ($arr)[i]) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""buckets AS (
       |  SELECT vec_id, CAST($sums AS BIGINT) AS bucket
       |  FROM (SELECT vec_id, i, ${quantSqlElem("embedding[i]")} AS q
       |        FROM (SELECT vec_id, embedding,
       |                     unnest(generate_series(1, len(embedding))) AS i
       |              FROM embeddings))
       |  GROUP BY vec_id
       |)""".stripMargin
  }

  /** Cap on docs sharing one LSH (band, value) bucket. A bucket of k docs
    * yields C(k,2) candidate pairs; without a cap a cluster of k
    * near-identical boilerplate docs (the common case in web corpora)
    * produces k² pairs. Oversized buckets are dropped — at ≥ [[BandBucketCap]]
    * docs a bucket is boilerplate, not dedup signal — bounding pairs per
    * bucket at C(cap,2) ≈ 2·10³ regardless of corpus size. Mirrored in the
    * oracle SQL ([[BandsSql]]). */
  private[queries] val BandBucketCap = 64

  /** Per-(source, trigram) document-frequency cap for q_dedup_ngram: a
    * shingle shared by more than this many docs in a block is corpus
    * boilerplate — it carries no dedup signal but contributes df² join
    * rows. Jaccard is computed over the df-filtered shingle set (both
    * engines). */
  private[queries] val NgramDfCap = 64

  /** Winnowing (q_winnow / q_winnow_pairs): char k-gram size, window
    * width, the same df-style bucket cap as minhash/ngram, and the
    * overlap coefficient that promotes a pair to near-dup. */
  private val WinnowK = 8
  private val WinnowW = 4
  private val WinnowDfCap = 64
  private val WinnowOverlap = 0.8

  /** q_vocab_oov vocabulary size — deliberately smaller than the corpus'
    * distinct-word count (31) so real OOV mass exists at sf0.01. */
  private val VocabSize = 10

  /** q_dedup_simhash_pairs: 4 bands × 8 bits over a 32-bit signature.
    * Pigeonhole: hamming ≤ [[SimHamThr]] = bands−1 ⇒ at least one band is
    * bit-identical, so the banded equi-join is a complete candidate
    * generator for the hamming threshold — no all-pairs comparison. */
  private val SimBands = 4
  private val SimBandBits = 8
  private val SimHamThr = 3

  /** q_span_dedup sliding-window width (tokens). */
  private val SpanW = 5

  /** q_delta_dedup verify threshold — lower than the self-dedup 0.5 so the
    * asymmetric path keeps signal on the small 10% delta slice. */
  private val DeltaJacThr = 0.3

  /** Count-min sketch shape (q_sketch_cms): depth × width. Width is kept
    * at 64 so the 31-word vocab × 4 rows provokes real collisions — the
    * overestimate property is visible in the output, not just latent. */
  private val CmsDepth = 4
  private val CmsWidth = 64

  /** HyperLogLog register count (q_sketch_hll); 2^6 buckets → the
    * paper's α₆₄ = 0.709 and ~13% standard error. */
  private val HllM = 64
  private val HllAlpha = 0.709

  /** q_sketch_quantile equi-width histogram: bin width in CENTI-value
    * units (400 = 4.0 value units over the events.value domain [0, ~560]
    * → ~140 live bins). Quantile error is bounded by one bin width. */
  private val HistBinW = 400L

  /** q_sketch_quantile interpolation: the (tgt − cumb)-th of the bin's
    * `cnt` values under a uniform-spread assumption, as ONE exact-integer
    * fraction with a single terminal IEEE division — engine-identical.
    * The scale factor HistBinW/100 (bin width in VALUE units, since bins
    * are centi-unit-wide) is derived, not hardcoded, so retuning the
    * accuracy/state knob cannot silently skew estimates in both engines
    * at once. */
  private def histEstExpr(bin: String, cnt: String, tgt: String,
                          cumb: String): String =
    s"round(CAST(${HistBinW / 100}*(($bin)*($cnt) + ($tgt) - ($cumb)) AS DOUBLE) / CAST($cnt AS DOUBLE), 4)"

  /** The three q_sketch_quantile percentiles as exact rationals:
    * (label, numerator, denominator); target rank = ceil(p·n) computed as
    * (num·n + den − 1) div den — no float at the selection boundary. */
  private val HistPs: Seq[(String, Long, Long)] =
    Seq(("q50", 1L, 2L), ("q90", 9L, 10L), ("q99", 99L, 100L))

  /** q_prefix_join similarity threshold t = 4/5 (Jaccard ≥ 0.8). The
    * verify keep-rule 9·inter ≥ 4·(sz1+sz2) is t spelled in integers;
    * the prefix length |s| − ceil(t·|s|) + 1 uses ceil(4s/5) =
    * (4s+4) div 5. */
  private[queries] val PrefixTNum = 4L
  private[queries] val PrefixTDen = 5L

  /** q_ngram_topk: bigrams kept per head word. */
  private val NgramK = 3

  /** Adjacent-token (w1, w2) pairs from the raw split arrays — the ONE
    * bigram definition shared by q_ngram_topk and q_pmi (engine side),
    * mirrored by [[BigramCountsSql]] on the oracle side, so the
    * tokenization of pairs cannot drift between the two queries. */
  private def bigramPairs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(split(col("text"), Tokenize.Delim).as("a"))
      .where(expr("size(a) >= 2"))
      .select(expr("explode(sequence(1, size(a)-1))").as("i"), col("a"))
      .select(expr("element_at(a, i)").as("w1"),
        expr("element_at(a, i+1)").as("w2"))
      .where(Tokenize.keep(col("w1")) && Tokenize.keep(col("w2")))

  /** Oracle twin of [[bigramPairs]] + counts: CTEs `t`, `b`, `c` with
    * `c(w1, w2, cnt)`. */
  private lazy val BigramCountsSql: String =
    s"""t AS (
       |  SELECT regexp_split_to_array(text, '$DelimSql') AS a FROM documents
       |),
       |b AS (
       |  SELECT a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2
       |  FROM (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i
       |        FROM t WHERE len(a) >= 2)
       |),
       |c AS (
       |  SELECT w1, w2, count(*) AS cnt FROM b
       |  WHERE regexp_matches(lower(w1), '${Tokenize.KeepRegex}')
       |    AND regexp_matches(lower(w2), '${Tokenize.KeepRegex}')
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** q_feature_hash: hashing-trick feature space size. */
  private val FeatHashDim = 64

  /** q_pmi: min bigram count for a reported association. */
  private val PmiMinCount = 5

  /** q_inverted_index: min document frequency for an emitted term row. */
  private val InvIdxMinDf = 50

  /** q_kmeans shape: k clusters, fixed Lloyd iterations (both unrolled
    * verbatim in the DuckDB oracle). */
  private val KmK = 8

  /** q_semdedup: within-cluster cosine threshold above which the
    * larger-id vector drops (keep-first). */
  private val SemTau = 0.8
  private val KmIters = 2

  /** q_sample_diverse per-cluster quota. */
  private val DiverseQuota = 10

  /** q_mix_sources target mixture, as integer WEIGHTS (4:2:2:1:1) — integer
    * ratios keep the achievable-size arithmetic exact on both engines
    * (units = min over langs of n_lang div w_lang; kept_lang = w·units). */
  private val MixWeights: Seq[(String, Long)] =
    Seq("en" -> 4L, "es" -> 2L, "de" -> 2L, "fr" -> 1L, "zh" -> 1L)

  /** q_sample_pps expected sample size (Poisson, so realized size varies). */
  private val PpsK = 50

  /** q_ann_pq: 64-dim vectors split into 8 subspaces of [[PqD]] dims. */
  private val PqD = 8

  /** q_sketch_bloom shape: m bits × k hashes. At n=1.5k members the load
    * kn/m ≈ 0.27 → theoretical fp ≈ (1−e^−0.27)³ ≈ 1.4% — small but
    * non-zero, so the probe stage measures something real. */
  private val BloomM = 16384
  private val BloomK = 3

  /** Exact-duplicate collapse: one representative (min doc_id) per
    * distinct text. Near-dedup runs over representatives only — a cluster
    * of k exact duplicates shares every band and would otherwise feed k²
    * candidate pairs into the LSH join; after collapse it contributes one
    * row, and its non-representatives are dropped by the exact stage of
    * [[verifiedDupIds]]. The final drop-set is provably identical: a
    * non-rep x is dropped either way (exact stage here; the (rep,x)
    * Jaccard-1.0 pair before), and a rep x is dropped iff some smaller
    * doc's text is near-identical, which collapses to the rep-pair
    * (rep_B, x) with the same Jaccard. */
  private def repsOf(d: DataFrame): DataFrame =
    d.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")

  private def repDocs(s: SparkSession, dir: String): DataFrame =
    repsOf(docs(s, dir))

  /** w-bit simhash per doc: majority vote per bit over md5-derived token
    * hashes. One narrow aggregation — linear at any corpus size; the
    * shuffle carries w partial sums per (doc, partition). `w` ≤ 32 (bits
    * come from the first 8 hex chars of the token md5). */
  private def simhashW(s: SparkSession, dir: String, w: Int): DataFrame = {
    require(w <= 32, s"simhash width $w exceeds the 32 hash bits available")
    val a = toks(s, dir).select(col("doc_id"),
      expr("CAST(conv(substring(md5(word), 1, 8), 16, 10) AS BIGINT)").as("a"))
    val sumAggs = (0 until w).map(j =>
      sum(expr(s"CASE WHEN CAST(floor(a / ${1L << j}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END"))
        .as(s"s$j"))
    a.groupBy("doc_id").agg(sumAggs.head, sumAggs.tail: _*)
      .select(col("doc_id"),
        (0 until w).map(j =>
          expr(s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE CAST(0 AS BIGINT) END"))
          .reduce(_ + _).cast("long").as("sim"))
  }

  /** Sampled char shingles (doc_id, sh) of a (doc_id, text) frame —
    * multiset (no distinct; min-agg consumers don't need it, set consumers
    * call .distinct()). */
  private def shinglesOf(d: DataFrame): DataFrame =
    d.where(length(col("text")) >= K)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (K - 1), lit(Stride)))
          .as("i"), col("text"))
      .select(col("doc_id"), expr(s"substring(text, i, $K)").as("sh"))

  /** Shingles of the deduped representatives. */
  private def repShingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(repDocs(s, dir))

  /** Positional rep shingles (doc_id, i, sh), occurrences per (doc, sh)
    * capped at [[ShPosCap]] smallest positions — a shingle repeated r
    * times in BOTH docs of a pair yields r² matched positions, so
    * highly repetitive text (the "aaaa…" hazard) is bounded at
    * [[ShPosCap]]² per shingle value while non-repetitive runs (distinct
    * shingles) pass through untouched. Window is per (doc, shingle) —
    * bounded groups, any corpus size. */
  private[queries] def repShinglesPos(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "sh").orderBy("i")
    repDocs(s, dir).where(length(col("text")) >= K)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (K - 1), lit(Stride)))
          .as("i"), col("text"))
      .select(col("doc_id"), col("i"), expr(s"substring(text, i, $K)").as("sh"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= ShPosCap).drop("rn")
  }

  private[queries] val ShPosCap = 4

  /** Shingle geometry shared with oracles of positional-run queries. */
  private[queries] val ShingleK: Int = K
  private[queries] val ShingleStride: Int = Stride

  /** Oracle twin of [[repShinglesPos]]; requires the `reps` CTE (from
    * [[MinhashSigSql]]) upstream. Defines CTE `shp`. */
  private[queries] def repShinglesPosSql: String =
    s"""shp AS (
       |  SELECT doc_id, i, sh FROM (
       |    SELECT doc_id, i, sh,
       |      row_number() OVER (PARTITION BY doc_id, sh ORDER BY i) AS rn
       |    FROM (SELECT doc_id, i, substr(text, i, $K) AS sh
       |          FROM (SELECT doc_id, text,
       |                  unnest(generate_series(1, length(text) - ${K - 1},
       |                    $Stride)) AS i
       |                FROM reps WHERE length(text) >= $K)))
       |  WHERE rn <= $ShPosCap
       |)""".stripMargin

  /** Oracle twin of [[verifiedJaccard]]; requires the [[MinhashSigSql]] +
    * [[BandsSql]] CTEs upstream. Defines CTEs `pairs`, `sets`, `sz`,
    * `co`, `vj` — vj(d1, d2, jac) is every capped-bucket LSH candidate
    * pair with its exact shingle Jaccard (0 for zero-overlap pairs). */
  private[queries] val VerifiedJacSql: String =
    """pairs AS (
      |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      |  FROM cbands x JOIN cbands y
      |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
      |),
      |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
      |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
      |co AS (
      |  SELECT p.d1, p.d2, count(*) AS co
      |  FROM pairs p
      |  JOIN sets a ON a.doc_id = p.d1
      |  JOIN sets b ON b.doc_id = p.d2 AND b.sh = a.sh
      |  GROUP BY p.d1, p.d2
      |),
      |vj AS (
      |  SELECT p.d1, p.d2,
      |    CAST(coalesce(co.co, 0) AS DOUBLE)
      |      / (za.sz + zb.sz - coalesce(co.co, 0)) AS jac
      |  FROM pairs p
      |  LEFT JOIN co ON co.d1 = p.d1 AND co.d2 = p.d2
      |  JOIN sz za ON za.doc_id = p.d1
      |  JOIN sz zb ON zb.doc_id = p.d2
      |)""".stripMargin

  /** LSH band rows (doc_id, band, v) from a shingle multiset: shingle →
    * [[H]] minhashes from one md5 (Kirsch-Mitzenmacher) → [[Bands]] bands
    * of [[R]] rows. Shared by the corpus self-dedup (q_dedup_minhash*) and
    * the base×delta incremental dedup (q_delta_dedup). */
  /** The [[H]]-minhash signature table (doc_id, h0..h{H-1}) over a
    * shingle stream — shared by [[bandRowsFromShingles]] and the
    * banding-config planner (q_lsh_planner). */
  private[queries] def minhashSignatures(sh: DataFrame): DataFrame = {
    val ab = sh.select(col("doc_id"),
      expr("CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT)").as("a"),
      expr("CAST(conv(substring(md5(sh), 9, 8), 16, 10) AS BIGINT)").as("b"))
    val aggs = (0 until H).map(i =>
      min((col("a") + lit(i.toLong) * col("b")) % lit(Mod)).as(s"h$i"))
    ab.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Corpus-representative signatures for the planner. */
  private[queries] def repSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(repShingles(s, dir))

  /** Minhash family size — exposed with [[repSignatures]]. */
  private[queries] val MinhashH: Int = H

  private def bandRowsFromShingles(sh: DataFrame): DataFrame = {
    val sig = minhashSignatures(sh)
    val bandCols = (0 until Bands).map(b =>
      concat_ws("-", (0 until R).map(r => col(s"h${b * R + r}")): _*).as(s"b$b"))
    sig.select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id",
        s"stack($Bands, ${(0 until Bands).map(b => s"$b, b$b").mkString(", ")}) AS (band, v)")
  }

  /** LSH candidate pairs (d1 < d2) over exact-dup representatives:
    * shingle → 16 minhashes from one md5 (Kirsch-Mitzenmacher) → 4 bands ×
    * 4 rows → capped band-bucket self-join. The 100 TB dedup path: no
    * all-pairs comparison ever happens, and no bucket exceeds
    * [[BandBucketCap]] docs. `bands` is persisted — it feeds the bucket
    * sizing AND both self-join sides (callers run inside Bench/Verify,
    * which clearCache() per query). */
  private def cappedBandPairs(sh: DataFrame): DataFrame = {
    val bands = maybePersist(bandRowsFromShingles(sh))
    val smallBuckets = bands.groupBy("band", "v")
      .agg(count(lit(1)).as("bn")).where(col("bn") <= BandBucketCap)
      .select("band", "v")
    val capped = bands.join(smallBuckets, Seq("band", "v"))
    capped.alias("x")
      .join(capped.alias("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
  }

  private[queries] def minhashCandPairs(s: SparkSession, dir: String): DataFrame =
    cappedBandPairs(repShingles(s, dir))

  /** The LOSSLESS Jaccard ≥ [[PrefixTNum]]/[[PrefixTDen]] pair set over
    * exact-dup representatives via prefix filtering (the q_prefix_join
    * chain, factored): (d1 < d2, inter, sz1, sz2). Recall is GUARANTEED
    * by the pigeonhole bound, so this is exact ground truth for the
    * probabilistic LSH channel (q_minhash_recall measures that). */
  private[queries] def prefixTruePairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Ckpt._
    // ONE eagerly-checkpointed mid-table carries everything every later
    // stage needs (doc, shingle, set size, rarity rank): candidates
    // filter it, and both verify sides re-read it. A LAZY persist is
    // not enough here — the final single action reads the table from
    // parallel stages that would each race to populate the cache,
    // duplicating the wide upstream (distinct + two shuffled joins + a
    // window); eager localCheckpoint (the PageRank/BFS discipline)
    // materializes once and truncates the lineage (38→~10 s at sf0.1).
    val sh = shinglesOf(repDocs(s, dir)).distinct().ckpt()
    val dfq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val w = Window.partitionBy("doc_id").orderBy("df", "sh")
    val ranked = sh.join(dfq, "sh").join(sz, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select("doc_id", "sh", "sz", "rn")
      .ckpt()
    val pref = ranked
      .where(col("rn") <=
        col("sz") - expr(s"($PrefixTNum*sz + $PrefixTNum) div $PrefixTDen") + 1)
      .select(col("doc_id"), col("sh"), col("sz"), col("rn"))
    // candidate pairs with PPJoin's LOSSLESS prunes folded into the
    // aggregation (a templated corpus can push raw prefix candidates
    // to ~n²/12 — 1M pairs at sf0.1): (a) length ratio — J ≥ t needs
    // t·max ≤ min; (b) positional upper bound — overlap ≤ 1 +
    // min(sz−rn) at the FIRST shared prefix position, which must reach
    // α = ceil(t/(1+t)·(sz1+sz2)). Both bounds overestimate the true
    // overlap, so no qualifying pair is lost (the brute-force equality
    // spec pins it).
    val cand = pref.select(col("doc_id").as("d1"), col("sh"),
        col("sz").as("sz1"), col("rn").as("rn1"))
      .join(pref.select(col("doc_id").as("d2"), col("sh"),
        col("sz").as("sz2"), col("rn").as("rn2")), "sh")
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(min(col("rn1")).as("r1"),
        min(col("rn2")).as("r2"),
        max(col("sz1")).as("sz1"), max(col("sz2")).as("sz2"))
      .where(expr(s"$PrefixTDen*least(sz1, sz2) >= $PrefixTNum*greatest(sz1, sz2)"))
      .where(expr(s"1 + least(sz1 - r1, sz2 - r2) >= " +
        s"($PrefixTNum*(sz1+sz2) + ${PrefixTDen + PrefixTNum - 1}) div ${PrefixTDen + PrefixTNum}"))
    // verify: exact intersection via array_intersect over the per-doc
    // sorted set arrays — one row per surviving candidate, never a
    // |cand|·|set| fan-out shuffle. The arrays table is |docs| rows and
    // broadcasts at bench scale; when candidates ≪ sets at corpus
    // scale, flip to the equi-join fan-out shape instead of the
    // broadcast (SCALE.md).
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_set(col("sh"))).as("arr"))
    cand
      .join(broadcast(sets.select(col("doc_id").as("d1"), col("arr").as("a1"))), "d1")
      .join(broadcast(sets.select(col("doc_id").as("d2"), col("arr").as("a2"))), "d2")
      .withColumn("inter",
        expr("CAST(size(array_intersect(a1, a2)) AS BIGINT)"))
      .where(expr(s"${PrefixTDen + PrefixTNum}*inter >= $PrefixTNum*(sz1+sz2)"))
      .select("d1", "d2", "inter", "sz1", "sz2")
  }

  /** The Jaccard-LSH candidate channel alone, over an arbitrary (doc_id,
    * text) corpus — exposed so specs can demonstrate what it MISSES. */
  private[graft] def lshCandidates(d: DataFrame): DataFrame =
    cappedBandPairs(shinglesOf(repsOf(d)))

  /** doc_ids dropped by the full dedup policy: every exact duplicate that
    * is not its cluster's representative, plus the greater id of every LSH
    * candidate pair whose exact shingle-Jaccard ≥ `thr` (greedy keep-first
    * over representatives). Single source for q_dedup_apply and
    * q_pipeline_prep (Spark side; [[NearDupsSql]] is the oracle twin).
    * `sets` is persisted — it feeds both verify-join sides plus the size
    * aggregate. */
  /** Exact shingle-Jaccard of EVERY LSH candidate pair (d1 < d2, over
    * exact-dup representatives) — the verify stage computed once, shared
    * by the q_dedup_minhash_verified catalog query (which rounds for
    * display) and [[verifiedPairs]] (which thresholds). Candidates with
    * zero shared shingles keep jac = 0 (left-outer co-count). */
  private[queries] def verifiedJaccard(s: SparkSession, dir: String): DataFrame = {
    // pairs has two consumers; measured BOTH ways at sf0.1 — persisting it
    // loses (5.1 s vs 3.3 s median): the block-manager materialization
    // costs more than re-running the capped band join, the same
    // recompute-beats-persist economics as SCALE.md "Persist points"
    val pairs = minhashCandPairs(s, dir)
    val sets = maybePersist(repShingles(s, dir).distinct())
    val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val co = pairs
      .join(sets.select(col("doc_id").as("d1"), col("sh")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .where(col("sh") === col("sh2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("co"))
    pairs
      .join(co, Seq("d1", "d2"), "left_outer")
      .join(sz.select(col("doc_id").as("d1"), col("sz").as("sa")), "d1")
      .join(sz.select(col("doc_id").as("d2"), col("sz").as("sb")), "d2")
      .withColumn("jac",
        expr("CAST(coalesce(co, 0) AS DOUBLE) / (sa + sb - coalesce(co, 0))"))
      .select("d1", "d2", "jac")
  }

  /** Verified near-dup pairs: LSH candidates with Jaccard ≥ `thr`. */
  private def verifiedPairs(s: SparkSession, dir: String,
                            thr: Double = 0.5): DataFrame =
    verifiedJaccard(s, dir).where(col("jac") >= thr).select("d1", "d2")

  private def verifiedDupIds(s: SparkSession, dir: String,
                             thr: Double = 0.5): DataFrame = {
    val exact = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
      docs(s, dir).withColumn("keep", min(col("doc_id")).over(w))
        .where(col("doc_id") =!= col("keep")).select("doc_id")
    }
    val near = verifiedPairs(s, dir, thr).select(col("d2").as("doc_id"))
    exact.unionByName(near).distinct()
  }

  /** Universe-sampling rate for the containment candidate channel: the
    * 1/[[ContainSampleMod]] of shingles whose 32-bit md5 value ≡ 0 (mod
    * this) form a deterministic sampled inverted index. A contained doc
    * shares ALL its shingles with its container, so with m shared
    * shingles the pair co-occurs under some sampled shingle unless none
    * of the m hashes hits the sampled residue — P ≈ (1−1/16)^m < 1% past
    * m ≈ 72. Same [[BandBucketCap]] df discipline as every other
    * inverted-index join. */
  private val ContainSampleMod = 16

  /** Minimum shared SAMPLED shingles to promote a pair out of the
    * containment candidate index: a truly contained doc with m shared
    * shingles expects m/[[ContainSampleMod]] sampled co-hits (P(< 2) ≈
    * 1% at m = 100), while the accidental single-co-hit pairs that
    * dominate the raw index (measured 29k → 150 at sf0.1) carry no
    * containment signal. Bounds the verify stage to real candidates. */
  private val ContainCoMin = 2

  /** Containment (asymmetric) near-dup pairs over an arbitrary (doc_id,
    * text) corpus: overlap / min(|A|, |B|) ≥ `thr` — catches a document
    * EMBEDDED in a larger one, where symmetric Jaccard shrinks as |B|
    * grows. Candidates are the UNION of two channels, each replayed by
    * the oracle:
    *  - the Jaccard-LSH band buckets (shared with q_dedup_minhash) —
    *    high-Jaccard pairs;
    *  - a universe-sampled shingle index ([[ContainSampleMod]]) —
    *    containment-high / jaccard-low pairs the Jaccard-tuned banding
    *    misses (round-3's documented recall gap). Verify stays
    *    candidates-only: the sampled index is 1/16 the shingle volume,
    *    df-capped, so the join is bounded per shingle at any corpus
    *    size. */
  private[graft] def containmentPairs(d: DataFrame, thr: Double): DataFrame = {
    val reps = repsOf(d)
    val sh = shinglesOf(reps)
    // band channel reads the raw multiset (signature mins partial-agg
    // map-side on the narrow explode — measured FASTER than routing it
    // through the distinct set, whose Exchange it would then pay);
    // verify shares the maybePersist'd distinct set as before
    val sets = maybePersist(sh.distinct())
    // the sampled index gets its OWN narrow pipeline — the 1/16 residue
    // filter runs BEFORE the distinct, so its Exchange carries 1/16 the
    // shingle volume. Its 3 consumers (df filter + both self-join sides)
    // recompute it: measured at sf0.1, recompute (3.5 s query median)
    // beats block-manager persist (5.7-6.1 s) — SCALE.md "Persist points"
    val sampled = sh.where(
      expr(s"CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT) % $ContainSampleMod = 0"))
      .distinct()
    val srare = sampled.groupBy("sh").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2 && col("c") <= BandBucketCap).select("sh")
    val scap = sampled.join(srare, Seq("sh"))
    val sampPairs = scap.alias("x")
      .join(scap.alias("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_co"))
      .where(col("n_co") >= ContainCoMin).select("d1", "d2")
    // two consumers, but NOT persisted: measured at sf0.1 the recompute
    // beats the block-manager materialization (SCALE.md "Persist points")
    val pairs = cappedBandPairs(sh).unionByName(sampPairs).distinct()
    val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val co = pairs
      .join(sets.select(col("doc_id").as("d1"), col("sh")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .where(col("sh") === col("sh2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("co"))
    pairs.join(co, Seq("d1", "d2"), "left_outer")
      .join(sz.select(col("doc_id").as("d1"), col("sz").as("sa")), "d1")
      .join(sz.select(col("doc_id").as("d2"), col("sz").as("sb")), "d2")
      .withColumn("containment",
        expr("CAST(coalesce(co, 0) AS DOUBLE) / least(sa, sb)"))
      .where(col("containment") >= thr)
  }

  /** Per-doc char-bigram LM scores (doc_id, n_bigrams, nll) — the shared
    * scoring stage of q_lm_score (display) and q_filter_perplexity (the
    * percentile gate). Bigram stream is a narrow explode recomputed per
    * consumer (cheaper than materializing — SCALE.md "Persist points");
    * each model aggregate collapses it map-side to a tiny shuffle
    * (|charset|² / |charset| groups). The repartition is the tiny-scan
    * rebalance rule (the harness corpus is one parquet split, so all
    * three explode+partial-agg branches would otherwise run on ONE core);
    * the three branches share one identical Exchange via ReuseExchange.
    * term = n × round(ln(bc/cc), 8) as DECIMAL: an integer times an
    * 8-decimal fixed-point value is exact, so the sum equals the
    * per-position oracle's n identical addends — order-free. Operand
    * precisions are sized so the product type DECIMAL(29,8) needs no
    * precision-loss adjustment (18+10+1 ≤ 38). */
  private def lmScores(s: SparkSession, dir: String): DataFrame = {
    def bg = docs(s, dir).repartition(s.sparkContext.defaultParallelism)
      .where(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 1)).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, i, 2)").as("bgm"))
    val bgCnt = bg.groupBy("bgm").agg(count(lit(1)).as("bc"))
    // c1 occurrences at non-final positions = first char of each bigram:
    // derived from bgm (no second substring over text, no text carry)
    val c1Cnt = bg.select(expr("substring(bgm, 1, 1)").as("c1"))
      .groupBy("c1").agg(count(lit(1)).as("cc"))
    // the scoring probe pre-aggregates to per-doc DISTINCT bigram counts
    val bgn = bg.groupBy("doc_id", "bgm").agg(count(lit(1)).as("n"))
      .withColumn("c1", expr("substring(bgm, 1, 1)"))
    bgn.join(broadcast(bgCnt), "bgm").join(broadcast(c1Cnt), "c1")
      .withColumn("term", expr(
        "CAST(n AS DECIMAL(18,0)) * CAST(round(ln(CAST(bc AS DOUBLE) / cc), 8) AS DECIMAL(10,8))"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"),
        round((-sum(col("term"))).cast("double") / sum(col("n")), 4)
          .as("nll"))
  }

  /** Quantized embeddings + exact integer self-norm. */
  private[queries] def quantized(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"), col("label"), expr(QuantSpark).as("q"))
      .withColumn("nq",
        expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x*x)"))

  private[queries] val QuantizedNormSql = // norms CTE: per-vector exact integer norm
    s"""qn AS (
       |  SELECT vec_id, label, CAST(sum(q*q) AS BIGINT) AS nq
       |  FROM (SELECT vec_id, label, ${quantSqlElem("unnest(embedding)")} AS q
       |        FROM embeddings)
       |  GROUP BY vec_id, label
       |)""".stripMargin

  // =========================================================================

  val queries: Map[String, Q] = strictMap(

    // Exact dedup: hash-groupBy on full text; keeper = min doc_id.
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir).groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .select("keep_id", "n").orderBy("keep_id")),

    // URL canonicalization + dedup — the crawl-side twin of q_dedup_exact:
    // messy URLs (case-noisy scheme/host, www., default :80 port,
    // utm_* tracking params in shuffled positions, fragments, trailing
    // slash) are synthesized deterministically per doc, then canonicalized
    // with pure string/array ops: lowercase (paths are constructed
    // lowercase, so full-lower ≡ scheme+host-lower here — production
    // lowers only scheme/host), fragment strip, :80/ strip, www. strip,
    // query split → drop utm_* → sort → rejoin, trailing-slash strip.
    // Dedup = one groupBy on the canonical form (min doc_id kept) — a
    // narrow projection + one partial-agg'd shuffle at any corpus scale.
    "q_dedup_url" -> ((s, dir) => {
      val raw = docs(s, dir).selectExpr("doc_id",
        """concat(
          |  'HTTP://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
          |  source, '.Example.COM',
          |  CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END,
          |  '/p/', CAST(doc_id % 7 AS STRING),
          |  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
          |  CASE CAST(doc_id % 3 AS INT)
          |    WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 3 AS STRING))
          |    WHEN 1 THEN concat('?id=', CAST(doc_id % 3 AS STRING), '&utm_campaign=x')
          |    ELSE concat('?id=', CAST(doc_id % 3 AS STRING)) END,
          |  CASE WHEN doc_id % 2 = 0 THEN '#Section-2' ELSE '' END
          |) AS url""".stripMargin)
      raw.selectExpr("doc_id", "url",
          """regexp_replace(
            |  replace(replace(lower(regexp_replace(url, '#.*$', '')),
            |          ':80/', '/'),
            |    '://www.', '://'),
            |  '/$', '') AS u1""".stripMargin)
        .selectExpr("doc_id", "url",
          "split(u1, '[?]')[0] AS base",
          """array_join(array_sort(filter(
            |  split(coalesce(try_element_at(split(u1, '[?]'), 2), ''), '&'),
            |  p -> p NOT LIKE 'utm_%')), '&') AS q""".stripMargin)
        .selectExpr("doc_id",
          """concat(regexp_replace(base, '/$', ''),
            |  CASE WHEN q <> '' THEN concat('?', q) ELSE '' END) AS canon""".stripMargin)
        .groupBy("canon")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("canon")).limit(20)
    }),

    // Curriculum ordering for training: docs bucket into integer quality
    // tiers by type-token ratio (cross-multiplied — no float thresholds),
    // then order (tier DESC, md5(doc_id)) — a deterministic shuffle
    // within each tier, reproducible at any partitioning. The first-N
    // selection is TakeOrderedAndProject (bounded heap per partition);
    // the position column is a window over the LIMITED 50-row result,
    // not the corpus.
    "q_curriculum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("words", size(col("toks")).cast("long"))
        .withColumn("uniq", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("tier", expr(
          """CAST(CASE WHEN uniq * 10 >= words * 7 THEN 2
            |     WHEN uniq * 10 >= words * 4 THEN 1
            |     ELSE 0 END AS BIGINT)""".stripMargin))
        .withColumn("h", md5(concat(lit("cur-"), col("doc_id").cast("string"))))
      val top = scored.orderBy(desc("tier"), asc("h"), asc("doc_id"))
        .select("doc_id", "tier", "h").limit(50)
      top.withColumn("pos",
          row_number().over(Window.orderBy(desc("tier"), asc("h"), asc("doc_id")))
            .cast("long"))
        .select("pos", "doc_id", "tier")
        .orderBy("pos")
    }),

    // MinHash + LSH near-dup candidates: exact-dup collapse → char-shingle
    // → 16 minhashes from one md5 (Kirsch-Mitzenmacher) → 4 bands × 4 rows
    // → capped band-bucket self-join. This is the 100 TB dedup path: no
    // all-pairs comparison ever happens and no bucket exceeds BandBucketCap.
    "q_dedup_minhash" -> ((s, dir) =>
      minhashCandPairs(s, dir)
        .groupBy("d1")
        .agg(count(lit(1)).as("n_cand"), min(col("d2")).as("min_partner"))
        .orderBy("d1")),

    // LSH verify stage: exact shingle-Jaccard computed ONLY on the LSH
    // candidate pairs (never all pairs) — the candidates→verify dedup
    // pipeline end to end; cost is O(|candidates| · shingles/doc).
    // Same verifiedJaccard stage as verifiedPairs/q_dedup_apply/
    // q_dedup_components — one implementation, rounded here for display.
    "q_dedup_minhash_verified" -> ((s, dir) =>
      verifiedJaccard(s, dir)
        .select(col("d1"), col("d2"), round(col("jac"), 4).as("jac"))
        .orderBy("d1", "d2")),

    // CONTAINMENT near-dup (asymmetric): overlap / min(|A|, |B|) — catches
    // a document EMBEDDED in a larger one, where symmetric Jaccard stays
    // small (|A∩B|/|A∪B| shrinks as |B| grows). Candidates = Jaccard-LSH
    // band buckets UNION a universe-sampled shingle index (see
    // containmentPairs) — the second channel closes round-3's documented
    // recall gap for containment-high / jaccard-low pairs; DedupScaleSpec
    // plants a small-doc-inside-huge-doc pair the LSH channel provably
    // misses. Verify stays candidates-only.
    "q_dedup_containment" -> ((s, dir) =>
      containmentPairs(docs(s, dir), 0.5)
        .select(col("d1"), col("d2"),
          round(col("containment"), 4).as("containment"))
        .orderBy("d1", "d2")),

    // Dedup APPLY: the pipeline's final step — drop every exact duplicate
    // (non-representative of its text cluster) and every doc that appears
    // as the greater id (d2) of a verified near-dup pair over the
    // representatives (greedy keep-first policy; ids are totally ordered so
    // the survivor set is well-defined without connected components).
    // Returns the kept corpus summary.
    "q_dedup_apply" -> ((s, dir) => {
      docs(s, dir)
        .join(verifiedDupIds(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // SimHash: 16-bit signature from md5-derived token hashes (majority vote
    // per bit over token occurrences). One narrow agg — linear at scale.
    "q_dedup_simhash" -> ((s, dir) =>
      simhashW(s, dir, 16).select(col("doc_id"), col("sim").as("simhash"))
        .orderBy("doc_id")),

    // SimHash near-dup PAIRS: the banded-LSH completion of the signature
    // query. 32-bit signatures (8-bit bands stay selective: 256 bucket
    // values vs 16 for the display query's 16-bit width) → band equi-join
    // under the same BandBucketCap discipline as minhash → exact hamming
    // verify (bit_count of xor) on candidates only. Pigeonhole makes the
    // candidate set COMPLETE for ham ≤ SimHamThr = bands−1: a pair within
    // the threshold differs in ≤ 3 of 4 bands, so some band matches.
    "q_dedup_simhash_pairs" -> ((s, dir) => {
      val sig = maybePersist(simhashW(s, dir, 32))
      val bands = sig.select(col("doc_id") +: (0 until SimBands).map(b =>
          expr(s"CAST(floor(sim / ${1L << (SimBandBits * b)}) AS BIGINT) % ${1 << SimBandBits}")
            .as(s"b$b")): _*)
        .selectExpr("doc_id",
          s"stack($SimBands, ${(0 until SimBands).map(b => s"$b, b$b").mkString(", ")}) AS (band, v)")
      val small = bands.groupBy("band", "v").agg(count(lit(1)).as("bn"))
        .where(col("bn") <= BandBucketCap).select("band", "v")
      val capped = bands.join(small, Seq("band", "v"))
      val pairs = capped.alias("x")
        .join(capped.alias("y"),
          col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      pairs
        .join(sig.select(col("doc_id").as("d1"), col("sim").as("sim1")), "d1")
        .join(sig.select(col("doc_id").as("d2"), col("sim").as("sim2")), "d2")
        .select(col("d1"), col("d2"),
          expr("CAST(bit_count(sim1 ^ sim2) AS BIGINT)").as("ham"))
        .where(col("ham") <= SimHamThr)
        .orderBy("d1", "d2")
    }),

    // Duplicate-SPAN detection (the sub-document dedup of "Deduplicating
    // Training Data Makes Language Models Better": exact duplicate token
    // spans, not whole-doc similarity). Every SpanW-token sliding window is
    // hashed; a span whose hash occurs in ≥2 distinct docs is duplicated
    // text. Per doc: span count, duplicated-span count, duplicated
    // fraction. Cost is Σ tokens rows (narrow explode) + one hash-keyed
    // count — linear at any corpus size; unlike the pair-generating dedups
    // there is NO self-join, so boilerplate needs no df-cap (high-df spans
    // just count, they never multiply).
    "q_span_dedup" -> ((s, dir) => {
      val ws = docs(s, dir)
        .select(col("doc_id"), Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= SpanW)
      val spans = maybePersist(ws.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(ws)-${SpanW - 1}), i -> md5(concat_ws(' ', slice(ws, i, $SpanW))))"))
          .as("h")))
      val docFreq = spans.select("doc_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("dfreq"))
      spans.join(docFreq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("dfreq") > 1, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac",
          round(col("n_dup").cast("double") / col("n_spans").cast("double"), 4))
        .orderBy("doc_id")
    }),

    // Incremental (base × delta) dedup — the production shape: a new batch
    // is deduped AGAINST the existing corpus, never corpus × corpus. Split
    // is by the stable md5 key bucket (90% base / 10% delta); candidates
    // come from an asymmetric band join (delta bands probe base bands, base
    // buckets capped at BandBucketCap), then exact shingle-Jaccard verifies
    // candidates only. At 100 TB the base band table is a persisted index:
    // each new batch costs O(delta) + the probe join.
    "q_delta_dedup" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("bucket", expr(HashBucketSpark))
      val base = d.where(col("bucket") < 90).select("doc_id", "text")
      val delta = d.where(col("bucket") >= 90).select("doc_id", "text")
      val bSh = maybePersist(shinglesOf(base))
      val dSh = maybePersist(shinglesOf(delta))
      val bBands = bandRowsFromShingles(bSh)
      val small = bBands.groupBy("band", "v").agg(count(lit(1)).as("bn"))
        .where(col("bn") <= BandBucketCap).select("band", "v")
      val cand = bandRowsFromShingles(dSh)
        .join(bBands.join(small, Seq("band", "v"))
          .select(col("band"), col("v"), col("doc_id").as("base_id")),
          Seq("band", "v"))
        .select(col("doc_id").as("delta_id"), col("base_id")).distinct()
      val bSets = bSh.distinct()
      val dSets = dSh.distinct()
      val bSz = bSets.groupBy("doc_id").agg(count(lit(1)).as("szb"))
      val dSz = dSets.groupBy("doc_id").agg(count(lit(1)).as("szd"))
      val co = cand
        .join(dSets.select(col("doc_id").as("delta_id"), col("sh")), "delta_id")
        .join(bSets.select(col("doc_id").as("base_id"), col("sh").as("sh2")), "base_id")
        .where(col("sh") === col("sh2"))
        .groupBy("delta_id", "base_id").agg(count(lit(1)).as("co"))
      cand.join(co, Seq("delta_id", "base_id"), "left_outer")
        .join(dSz.withColumnRenamed("doc_id", "delta_id"), "delta_id")
        .join(bSz.withColumnRenamed("doc_id", "base_id"), "base_id")
        .withColumn("jac",
          expr("CAST(coalesce(co, 0) AS DOUBLE) / (szd + szb - coalesce(co, 0))"))
        .where(col("jac") >= DeltaJacThr)
        .select(col("delta_id"), col("base_id"), round(col("jac"), 4).as("jac"))
        .orderBy("delta_id", "base_id")
    }),

    // n-gram (token 3-gram) Jaccard near-dup, blocked by `source` so the
    // candidate join is bounded per block (global variant = q_dedup_minhash).
    // Trigrams with per-block document frequency > NgramDfCap are dropped
    // BEFORE the self-join (and from the Jaccard denominators): a shingle in
    // df docs contributes df² join rows but zero dedup signal once df is
    // large — the cap bounds pairs-per-shingle at C(cap,2) at any corpus
    // size. Jaccard is over the df-filtered shingle sets in both engines.
    "q_dedup_ngram" -> ((s, dir) => {
      val ws = docs(s, dir)
        .select(col("doc_id"), col("source"),
          Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
      // tri feeds the df computation and (via trif) sizes + both join
      // sides — persist (callers run inside Bench/Verify, which
      // clearCache() per query).
      val tri = maybePersist(ws.select(col("doc_id"), col("source"),
        explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
          .as("sh"))
        .distinct())
      val rare = tri.groupBy("source", "sh")
        .agg(count(lit(1)).as("dfreq")).where(col("dfreq") <= NgramDfCap)
        .select("source", "sh")
      val trif = tri.join(rare, Seq("source", "sh"))
      val sz = trif.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val co = trif.alias("x")
        .join(trif.alias("y"),
          col("x.source") === col("y.source") && col("x.sh") === col("y.sh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("co"))
      co.join(sz.select(col("doc_id").as("d1"), col("sz").as("sa")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("sb")), "d2")
        .withColumn("jac", expr("CAST(co AS DOUBLE) / (sa + sb - co)"))
        .groupBy("d1")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN jac >= 0.2 THEN 1 ELSE 0 END")).as("n_sim"),
          max(round(col("jac"), 4)).as("max_jac"))
        .orderBy("d1")
    }),

    // Embedding-cosine near-dup — BUCKETED, never all-pairs: candidates
    // come from the random-hyperplane LSH buckets (the q_ann_lsh
    // machinery — 8 md5-seeded integer hyperplanes → one 8-bit bucket per
    // vector), buckets over BandBucketCap docs are DROPPED before the
    // self-join (the minhash band-join discipline: an oversized bucket is
    // boilerplate, not dedup signal), and the exact-integer cosine
    // verifies inside each surviving bucket. Pairs per bucket are bounded
    // at C(cap,2) ≈ 2·10³ REGARDLESS of corpus size, so total candidate
    // volume is O(#buckets·cap²) = O(n·cap) — where the previous
    // constant-fraction self-join paid Θ((n/10)²/|labels|).
    "q_dedup_embcos" -> ((s, dir) => {
      // bucketed feeds the cap filter and BOTH self-join sides — ckpt so
      // the bucket computation runs once, not three times
      val bucketed = quantized(s, dir).where(col("nq") > 0)
        .withColumn("bucket", expr(lshBucketSparkExpr("q")).cast("long"))
        .ckpt()
      val ok = bucketed.groupBy("bucket").agg(count(lit(1)).as("bsz"))
        .where(col("bsz") <= BandBucketCap).select("bucket")
      val b = bucketed.join(ok, Seq("bucket"))
      val pairs = b.alias("x")
        .join(b.alias("y"),
          col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("d1"), col("y.vec_id").as("d2"),
          expr("ivec_dot(x.q, y.q)")
            .as("dot"),
          col("x.nq").as("na"), col("y.nq").as("nb"))
        .withColumn("cos", expr(CosExpr))
      pairs.groupBy("d1")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN cos >= 0.7 THEN 1 ELSE 0 END")).as("n_sim"),
          max(round(col("cos"), 4)).as("max_cos"))
        .orderBy("d1")
    }),

    // Brute-force cosine top-k ANN for sampled query vectors: the exactness
    // baseline; rank by unrounded (but deterministic) cosine, tie-break id.
    // The query set is a CONSTANT k = AnnQueryK vectors (largest exact
    // integer self-norm, tie-break vec_id — a deterministic selection both
    // engines can replay), NOT a constant fraction of the corpus: with a
    // fractional query set the brute-force join is Θ(n²), while k·n scans
    // stay linear in the corpus and the k-row query side broadcasts.
    "q_ann_topk" -> ((s, dir) => {
      val all = quantized(s, dir)
      val qs = all.where(col("nq") > 0)
        .orderBy(desc("nq"), asc("vec_id")).limit(AnnQueryK)
        .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nq").as("na"))
      val scored = broadcast(qs)
        .join(all.where(col("nq") > 0), col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          expr("ivec_dot(qq, q)")
            .as("dot"),
          col("na"), col("nq").as("nb"))
        .withColumn("cos", expr(CosExpr))
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("rank",
          row_number().over(Window.partitionBy("q_id")
            .orderBy(desc("cos"), asc("cand_id"))).cast("long"))
        .where(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("cand_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    // Hard-negative mining for contrastive training: for each query
    // vector, the top-5 most-similar candidates with a DIFFERENT label —
    // the "looks alike, isn't" pairs a retrieval/embedding trainer feeds
    // as negatives. Same exact-integer cosine machinery as q_ann_topk,
    // including its CONSTANT k = AnnQueryK query set (a fractional set
    // makes this full-corpus join Θ(n²)); the k-row query side
    // broadcasts, the label inequality rides the join, per-query top-5
    // via a window over the bounded query set.
    "q_hard_negatives" -> ((s, dir) => {
      val all = quantized(s, dir)
      val qs = all.join(annQueryIds(all), "vec_id")
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("q").as("qq"), col("nq").as("na"))
      val scored = qs
        .join(all.where(col("nq") > 0),
          col("q_id") =!= col("vec_id") && col("q_label") =!= col("label"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          expr("ivec_dot(qq, q)")
            .as("dot"),
          col("na"), col("nq").as("nb"))
        .withColumn("cos", expr(CosExpr))
      scored
        .withColumn("rank",
          row_number().over(Window.partitionBy("q_id")
            .orderBy(desc("cos"), asc("cand_id"))).cast("long"))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("cand_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    // Inverted-index build with impact-ordered posting heads: per term,
    // document frequency plus the top-5 (tf desc, doc asc) postings
    // rendered "doc:tf,..." — the retrieval-index construction step
    // (impact-sorted posting lists truncated at the head). The head is
    // selected by the NATIVE TopKPerKey operator (bounded heap per map
    // partition, one shuffle — never a per-term window sort over full
    // posting lists), so per-term state is O(5) at any corpus size; the
    // collect_list that renders the string is over ≤5 rows by
    // construction.
    "q_inverted_index" -> ((s, dir) => {
      val tf = toks(s, dir).groupBy("word", "doc_id")
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val head = graft.operators.TopK
        .perKey(tf, Seq("word"), Seq(("tf", false), ("doc_id", true)), 5)
      val postings = head
        .select(col("word"),
          struct((-col("tf")).as("ntf"), col("doc_id"), col("tf")).as("e"))
        .groupBy("word").agg(array_sort(collect_list(col("e"))).as("es"))
        .select(col("word"), expr(
          "concat_ws(',', transform(es, e -> concat(CAST(e.doc_id AS STRING), ':', CAST(e.tf AS STRING))))")
          .as("postings"))
      dfreq.where(col("df") >= InvIdxMinDf)
        .join(postings, "word")
        .select("word", "df", "postings").orderBy("word")
    }),

    // TF-IDF over the corpus: tf per (doc, word), document frequency per
    // word, idf = ln((N+1)/(df+1)). Two narrow aggregations plus a
    // broadcast of the single-row N — no fact-side re-shuffle.
    "q_tfidf" -> ((s, dir) => {
      val tf = toks(s, dir).groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      // dfreq AND n_docs derive from tf: same canonical exchange → AQE
      // stage reuse, and the doc set is locale-consistent with the token
      // pipeline (a whole-text keep(text) shortcut would route non-ASCII
      // text through Spark's default-locale lower() and could disagree
      // with the per-token keep on a non-ROOT-locale JVM).
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs"))
      // idf is pre-rounded to 8 decimals: ln() is not correctly-rounded,
      // so a 1-ulp Java-vs-C libm difference could otherwise flip the
      // final 4th decimal; quantizing the (few, per-word) idf values first
      // confines the boundary risk to |vocab| values at 1e-8 granularity.
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * expr("round(ln((n_docs + 1.0) / (df + 1.0)), 8)"), 4))
        .select("doc_id", "word", "tf", "df", "tfidf")
        .orderBy("doc_id", "word")
    }),

    // IVF-style ANN: centroid per label (coarse quantizer) → route each
    // query to its nearest centroid → search only that partition. This is
    // the scale path: probes 1/|labels| of the data vs q_ann_topk's full
    // scan. Distances stay on exact integers (scaled by partition size) so
    // both engines agree bit-for-bit.
    "q_ann_ivf" -> ((s, dir) => {
      val all = quantized(s, dir).where(col("nq") > 0)
      // per-label, per-dimension integer sums (centroid = s/n, kept unscaled)
      val cent = all.select(col("label"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy("label", "pos")
        .agg(sum("qv").as("s"), count(lit(1)).as("n"))
      val qd = all.join(annQueryIds(all), "vec_id")
        .select(col("vec_id").as("q_id"), posexplode(col("q")).as(Seq("pos", "qv")))
      // dist² to centroid, scaled by n²: Σ(qv·n − s)² — exact BIGINTs
      val dist = qd.join(cent, "pos")
        .groupBy("q_id", "label")
        .agg(sum(expr("(qv * n - s) * (qv * n - s)")).as("dist_num"),
          max("n").as("n"))
      val best = dist
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q_id")
            .orderBy(expr("CAST(dist_num AS DOUBLE) / (n * n)").asc, col("label").asc)))
        .where(col("rn") === 1).select("q_id", "label")
      val qs = all.select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("nq").as("na"))
      val scored = best.join(qs, "q_id")
        .join(all.select(col("vec_id").as("cand_id"), col("label"),
          col("q"), col("nq").as("nb")), "label")
        .where(col("cand_id") =!= col("q_id"))
        .select(col("q_id"), col("cand_id"),
          expr("ivec_dot(qq, q)")
            .as("dot"), col("na"), col("nb"))
        .withColumn("cos", expr(CosExpr))
      scored
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q_id")
            .orderBy(desc("cos"), asc("cand_id"))).cast("long"))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("cand_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    // Product quantization (PQ) ANN — the memory-side scale path that
    // completes brute/IVF/LSH: vectors are split into 8 subspaces of 8
    // dims; each subvector is replaced by the id of its nearest per-label
    // subspace centroid (label-seeded codebook — deterministic, no
    // iterative k-means), so a 64-int vector becomes 8 small codes. ADC
    // scoring then approximates dot(query, candidate) as Σ_m
    // dot(query_sub_m, centroid(code_m)) — a lookup-table sum, never a
    // full-vector scan per candidate. At 100 TB the code table is ~1% of
    // the vector bytes and the ADC join is |queries|·M rows per
    // candidate. Determinism discipline: centroid distances compare as
    // one FP division over exact BIGINTs (ties → label asc), ADC terms
    // are 6-decimal-rounded DECIMALs summed exactly, and the final rank
    // orders on the EXACT decimal before any display cast.
    "q_ann_pq" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val all = quantized(s, dir).where(col("nq") > 0)
      def comps(keyCol: String) = all
        .select(col(keyCol), posexplode(col("q")).as(Seq("pos", "qv")))
        .select(col(keyCol), expr(s"pos div $PqD").as("m"),
          expr(s"pos % $PqD").as("d"), col("qv"))
      val comp = comps("vec_id")
      val cb = comps("label").groupBy(col("label").as("clabel"), col("m"), col("d"))
        .agg(sum("qv").as("s"), count(lit(1)).as("n"))
      val assign = comp.join(cb, Seq("m", "d"))
        .groupBy("vec_id", "m", "clabel")
        .agg(sum(expr("(qv * n - s) * (qv * n - s)")).as("dn"), max("n").as("cn"))
        .withColumn("rn", row_number().over(w.partitionBy("vec_id", "m")
          .orderBy(expr("CAST(dn AS DOUBLE) / (cn * cn)").asc, col("clabel").asc)))
        .where(col("rn") === 1)
        .select(col("vec_id").as("cand_id"), col("m"), col("clabel").as("code"))
      val adc = comp.join(annQueryIds(all), "vec_id")
        .join(cb, Seq("m", "d"))
        .groupBy(col("vec_id").as("q_id"), col("m"), col("clabel"))
        .agg(sum(expr("qv * s")).as("dotnum"), max("n").as("n"))
        .select(col("q_id"), col("m"), col("clabel").as("code"),
          expr("CAST(round(CAST(dotnum AS DOUBLE) / n, 6) AS DECIMAL(24,6))")
            .as("term"))
      assign.join(adc, Seq("m", "code"))
        .where(col("cand_id") =!= col("q_id"))
        .groupBy("q_id", "cand_id").agg(sum(col("term")).as("adc_exact"))
        .withColumn("rank", row_number().over(
          w.partitionBy("q_id").orderBy(col("adc_exact").desc, col("cand_id").asc))
          .cast("long"))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("cand_id"),
          round(col("adc_exact").cast("double"), 4).as("adc"))
        .orderBy("q_id", "rank")
    }),

    // Random-hyperplane LSH ANN: 8 md5-seeded integer hyperplanes → 8-bit
    // bucket per vector → search only the query's bucket. The scale path
    // when no partition label exists (vs q_ann_ivf's label centroids);
    // candidates per query drop ~256× for uniform buckets.
    "q_ann_lsh" -> ((s, dir) => {
      val all = quantized(s, dir).where(col("nq") > 0)
        .withColumn("bucket", expr(lshBucketSparkExpr("q")).cast("long"))
      val qs = all.join(annQueryIds(all), "vec_id")
        .select(col("vec_id").as("q_id"), col("q").as("qq"),
          col("nq").as("na"), col("bucket"))
      val scored = qs.join(
          all.select(col("vec_id").as("cand_id"), col("q"),
            col("nq").as("nb"), col("bucket")), Seq("bucket"))
        .where(col("cand_id") =!= col("q_id"))
        .select(col("q_id"), col("bucket"), col("cand_id"),
          expr("ivec_dot(qq, q)")
            .as("dot"), col("na"), col("nb"))
        .withColumn("cos", expr(CosExpr))
      scored
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q_id")
            .orderBy(desc("cos"), asc("cand_id"))).cast("long"))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("bucket"), col("rank"), col("cand_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    // Multimodal decode, REAL codec: a deterministic grayscale image is
    // planted per doc_id (construction rule in operators.Multimodal),
    // encoded to actual PNG bytes with the JDK ImageIO writer, then the
    // query decodes those bytes back through the real PNG parser inside
    // batched mapPartitions and emits dimension + pixel statistics. The
    // oracle recomputes the same features from the construction rule alone
    // — any codec round-trip bug (stride, color model, truncation) breaks
    // the hash match.
    // NB the repartition(): the payload table may scan as a handful of
    // parquet splits, and without a rebalance the CPU-bound codec work
    // would underparallelize (measured: 3.3 s → 1 task at sf0.1). Real
    // payload columns at scale arrive pre-spread, but any CPU-heavy stage
    // fed by a narrow scan must rebalance.
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "png")
        .repartition(s.sparkContext.defaultParallelism).as[graft.operators.MediaRecord]
      graft.operators.Multimodal.extractImages(recs).toDF().orderBy("doc_id")
    }),

    // Multimodal PERCEPTUAL DEDUP — aHash over the REAL decoded rasters
    // (8×8 grid sample → integer-mean threshold → 64-bit hash), then
    // hamming-near pairs via the simhash band discipline: 8 bands of 8
    // bits, pigeonhole-LOSSLESS for hamming ≤ 7, band buckets df-capped
    // at 64. The image twin of the text near-dup family: codec work runs
    // where the bytes live, the self-join only ever sees band-bucket
    // candidates, and bit_count(xor) verifies exactly. The oracle replays
    // hash + bands from the fixture's pixel rule.
    "q_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "png")
        .repartition(s.sparkContext.defaultParallelism)
        .as[graft.operators.MediaRecord]
      val hashed = graft.operators.Multimodal.extractAHash(recs)
        .toDF().select("doc_id", "ahash").ckpt()
      val bands = hashed
        .select(col("doc_id"), col("ahash"),
          explode(expr("sequence(0, 7)")).as("b"))
        .withColumn("bv", expr("shiftright(ahash, CAST(8 * b AS INT)) & 255"))
      val keep = bands.groupBy("b", "bv").agg(count(lit(1)).as("n"))
        .where(col("n") <= BandBucketCap).select("b", "bv")
      val bk = bands.join(keep, Seq("b", "bv"))
      val cand = bk.alias("x").join(bk.alias("y"), Seq("b", "bv"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          col("x.ahash").as("h1"), col("y.ahash").as("h2"))
        .distinct()
      cand.withColumn("ham", expr("bit_count(h1 ^ h2)").cast("long"))
        .where(col("ham") <= 7)
        .select("d1", "d2", "ham")
        .orderBy("d1", "d2")
    }),

    // Multimodal RESIZE — the decoded raster downscaled nearest-neighbor
    // (out(x,y) = in(2x,2y)) inside the same batched mapPartitions; codec
    // AND geometry are both under test because the oracle recomputes the
    // sampled positions from the construction rule. Decode+transform runs
    // where the bytes live — no shuffle.
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "png")
        .repartition(s.sparkContext.defaultParallelism).as[graft.operators.MediaRecord]
      graft.operators.Multimodal.extractResized(recs).toDF().orderBy("doc_id")
    }),

    // Multimodal FRAME SAMPLING — a video-shaped payload (4..8 raw frames
    // concatenated, zlib-compressed) is inflated with the real codec,
    // sliced into frames by offset, and every 2nd frame's pixel sum is
    // emitted. Torn payloads (length not a whole number of frames) drop
    // like corrupt images. The oracle replays the frame rule per sampled
    // index.
    "q_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "video")
        .repartition(s.sparkContext.defaultParallelism).as[graft.operators.MediaRecord]
      graft.operators.Multimodal.extractFrames(recs).toDF()
        .orderBy("doc_id", "frame")
    }),

    // Multimodal inflate, REAL codec: each doc's text is compressed to a
    // real zlib stream (java.util.zip.Deflater), then the query inflates
    // the bytes back and emits the recovered length + md5 — the round-trip
    // proof the oracle recomputes from the uncompressed source directly.
    // (Compressed size is encoder-dependent and deliberately not output.)
    "q_multimodal_inflate" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "zlib")
        .repartition(s.sparkContext.defaultParallelism).as[graft.operators.MediaRecord]
      graft.operators.Multimodal.extractInflate(recs).toDF().orderBy("doc_id")
    }),

    // Multimodal AUDIO, REAL codec: a deterministic 16-bit mono PCM
    // signal is written per doc_id as actual RIFF/WAV bytes (canonical
    // 44-byte header, hand-rolled to the spec), then decoded back through
    // the INDEPENDENT JDK parser (javax.sound.sampled.AudioSystem) and
    // amplitude statistics emitted. The oracle recomputes the same
    // features from the construction rule alone — completing the
    // image/audio/video modality triple on the same binary-column
    // plumbing (zero shuffle, batched mapPartitions, drop-and-count).
    "q_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      val recs = mediaTable(s, dir, "wav")
        .repartition(s.sparkContext.defaultParallelism).as[graft.operators.MediaRecord]
      graft.operators.Multimodal.extractAudio(recs).toDF().orderBy("doc_id")
    }),

    // CAPSTONE — the full training-data prep pipeline in one plan:
    // quality gate (≥ minTok kept tokens) → language gate (predicted 'en')
    // → exact dedup (first doc per text survives) → near-dedup
    // (MinHash-LSH candidates → verified Jaccard ≥ 0.5 → greedy apply) →
    // kept-corpus summary. Every stage is the same logic as its standalone
    // query, so the composition is oracle-checked end to end.
    "q_pipeline_prep" -> ((s, dir) => {
      val minTok = 20
      val scoreAggs = Stops.map { case (lang, words) =>
        sum(expr(s"CASE WHEN word IN ${inList(words)} THEN 1 ELSE 0 END"))
          .cast("long").as(s"s_$lang")
      }
      val sc = toks(s, dir).groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), scoreAggs: _*)
        .withColumn("pred", expr(PredCase))
      // verifiedDupIds is the whole dedup stage: exact (non-representative
      // of a text cluster) ∪ verified near-dup representatives.
      docs(s, dir)
        .join(sc.where(col("n_tok") >= minTok && col("pred") === "en")
          .select("doc_id"), "doc_id")
        .join(verifiedDupIds(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // CAPSTONE v2 — corpus ASSEMBLY: where q_pipeline_prep ends at the
    // kept set, this carries it to training-ready shards in the SAME
    // declarative plan: quality gate (≥ minTok kept tokens, all langs) →
    // near-dedup drop → exact-ratio domain mixing (4:2:2:1:1 per lang) →
    // deterministic shard shuffle (md5 fold + independent-hash in-shard
    // order) → ~512-token greedy packing per shard. Every stage is the
    // same logic as its standalone query (q_mix_sources /
    // q_shuffle_shards / q_pack_sequences), so the end-to-end composition
    // is oracle-checked. Both rank stages ride Ranks.withinKey; packing
    // windows partition by shard — nothing global, nothing single-task.
    "q_pipeline_assemble" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val minTok = 20
      val ntok = toks(s, dir).groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      // kept embeds the whole dedup chain and has TWO consumers (the
      // per-lang counts and the mixing rank). Unlike the narrow codegen'd
      // shingle pipelines the `maybePersist` auto policy was measured on
      // (recompute wins locally), kept's upstream is WIDE — shuffled LSH
      // band joins + Jaccard verify — so re-execution is never cheap:
      // persisting wins at every scale (measured 11.2 → 9.9 s at sf0.1).
      val kept = docs(s, dir).select("doc_id", "lang")
        .join(ntok.where(col("n_tok") >= minTok), "doc_id")
        .join(verifiedDupIds(s, dir), Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wDf = MixWeights.toDF("lang", "w")
      val withW = kept.groupBy("lang").agg(count(lit(1)).as("n")).join(wDf, "lang")
      val units = withW.agg(min(expr("n DIV w")).as("u"))
      val mixed = graft.operators.Ranks.withinKey(
          kept.withColumn("hx",
            md5(concat(lit("mix:"), col("doc_id").cast("string")))),
          "lang", Seq("hx", "doc_id"))
        .join(broadcast(withW.select("lang", "w")), "lang")
        .crossJoin(broadcast(units))
        .where(col("rk") <= col("w") * col("u"))
        .select("doc_id", "n_tok")
      val positioned = graft.operators.Ranks.withinKey(
          mixed.withColumn("shard", expr(s"($HashBucketSpark) % 8"))
            .withColumn("h",
              md5(concat(lit("ord"), col("doc_id").cast("string")))),
          "shard", Seq("h", "doc_id"))
        .withColumnRenamed("rk", "pos")
      val byShard = Window.partitionBy("shard").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      positioned.withColumn("cum", sum(col("n_tok")).over(byShard))
        .withColumn("bin",
          floor((col("cum") - col("n_tok")) / lit(PackBudget)).cast("long"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard", "bin")
    }),

    // Language ID: stopword-hit scoring with a deterministic argmax.
    "q_lang_id" -> ((s, dir) => {
      val scoreAggs = Stops.map { case (lang, words) =>
        sum(expr(s"CASE WHEN word IN ${inList(words)} THEN 1 ELSE 0 END"))
          .cast("long").as(s"s_$lang")
      }
      toks(s, dir).groupBy("doc_id").agg(scoreAggs.head, scoreAggs.tail: _*)
        .withColumn("pred", expr(PredCase))
        .orderBy("doc_id")
    }),

    // Language ID, character-n-gram variant: score = count of language-
    // characteristic bigrams (all alternatives same-length so Java-regex
    // and RE2 scanning agree), deterministic argmax as in q_lang_id.
    "q_lang_ngram" -> ((s, dir) => {
      val scoreCols = Bigrams.map { case (lang, pat) =>
        regexp_count(col("text"), lit(pat)).cast("long").as(s"s_$lang")
      }
      docs(s, dir).select(col("doc_id") +: scoreCols: _*)
        .withColumn("pred", expr(PredCase))
        .orderBy("doc_id")
    }),

    // Quality scoring: token stats + stopword/digit ratios → composite score.
    "q_quality" -> ((s, dir) => {
      val en = Stops.head._2
      val st = toks(s, dir).groupBy("doc_id").agg(
        count(lit(1)).as("n_tok"),
        sum(length(col("word"))).as("sum_len"),
        sum(expr(s"CASE WHEN word IN ${inList(en)} THEN 1 ELSE 0 END")).as("n_stop"))
      docs(s, dir).join(st, "doc_id")
        .withColumn("avg_len", round(expr("CAST(sum_len AS DOUBLE) / n_tok"), 4))
        .withColumn("stop_ratio", round(expr("CAST(n_stop AS DOUBLE) / n_tok"), 4))
        .withColumn("digit_ratio",
          round(expr("CAST(regexp_count(text, '[0-9]') AS DOUBLE) / greatest(length(text), 1)"), 4))
        .withColumn("quality", round(
          expr("least(CAST(n_tok AS DOUBLE)/100, 1.0)*0.5") +
            expr("CASE WHEN avg_len >= 3 AND avg_len <= 8 THEN 0.3 ELSE 0.0 END") +
            expr("least(stop_ratio*5, 1.0)*0.2"), 4))
        .select(col("doc_id"), col("n_tok"), col("avg_len"), col("stop_ratio"),
          col("digit_ratio"), col("quality"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens + a BPE-ish regex token stream.
    // NB: regexp_count via the typed API — the SQL-literal path would eat
    // the \s escape in the pattern.
    "q_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        expr("CAST(size(split(trim(text), ' +')) AS BIGINT)").as("n_ws"),
        regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe"),
        col("n_chars"))
        .orderBy("doc_id")),

    // Token-budget apportionment (Hamilton / largest-remainder): given a
    // global training budget of 10⁶ tokens, allocate per-source quotas
    // proportional to token counts with EXACT integer arithmetic — base =
    // ⌊B·c/C⌋, then the B − Σbase leftover units go to the largest
    // remainders (B·c mod C, ties to source name). The apportionment runs
    // on the per-source aggregate (|sources| rows — the q_survival-style
    // bounded window); Σquota = B exactly, no float proportions to drift.
    // B·c needs DECIMAL(38,0) past ~10¹³ tokens/source — noted like the
    // sketch family.
    "q_token_budget" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val B = 1000000L
      val counts = toks(s, dir)
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(count(lit(1)).as("c"))
      val tot = broadcast(counts.agg(sum(col("c")).as("ctot")))
      val q = counts.crossJoin(tot)
        .withColumn("base", expr(s"($B * c) div ctot"))
        .withColumn("rem", expr(s"($B * c) % ctot"))
      val extra = broadcast(q.agg((lit(B) - sum(col("base"))).as("extra")))
      q.withColumn("rnk", row_number()
          .over(Window.orderBy(desc("rem"), asc("source"))).cast("long"))
        .crossJoin(extra)
        .withColumn("quota", col("base") +
          when(col("rnk") <= col("extra"), 1L).otherwise(0L))
        .select(col("source"), col("c").as("tokens"), col("quota"))
        .orderBy("source")
    }),

    // Document fingerprint: md5 over the sorted distinct token set (bag-of-
    // words identity, robust to word order — catches shuffled duplicates).
    // Greedy quality-density selection under a character budget — "take
    // the best data until the budget runs out". Scale-honest formulation:
    // instead of a global sort + running sum over the corpus (single-task
    // window), docs are bucketed by integer type-token ratio (1000·u div w,
    // ≤1001 buckets at ANY corpus size), the cumsum + cutoff run over the
    // bounded bucket AGGREGATE, and whole buckets are taken while the
    // cumulative cost fits. Corpus-scale work: one tokenize agg shuffle +
    // one bucket agg; everything after is metadata-scale.
    "q_budget_select" -> ((s, dir) => {
      val B = 50000L
      val per = toks(s, dir).groupBy("doc_id")
        .agg(count(lit(1)).as("w"), countDistinct(col("word")).as("u"))
        .join(docs(s, dir).select("doc_id", "n_chars"), "doc_id")
        .withColumn("bucket", expr("(1000 * u) div w"))
      val buckets = per.groupBy("bucket")
        .agg(count(lit(1)).as("nd"),
          sum(col("n_chars").cast("long")).as("cost"))
      buckets
        .withColumn("cum", sum(col("cost"))
          .over(Window.orderBy(desc("bucket"))))
        .where(col("cum") <= B)
        .agg(count(lit(1)).as("n_buckets"),
          coalesce(sum(col("nd")), lit(0L)).as("n_docs"),
          coalesce(sum(col("cost")), lit(0L)).as("total_cost"),
          min(col("bucket")).as("cutoff_bucket"))
        .withColumn("budget_left", lit(B) - col("total_cost"))
    }),

    // Flesch reading-ease profile per source — the classic readability
    // quality signal. Sentences = non-empty [.!?]-delimited chunks
    // (floored at 1), words = whitespace tokens, syllables = vowel-group
    // runs [aeiouy]+ over the lowercased text (whitespace carries no
    // vowels, so whole-text counting ≡ per-word counting, saving the
    // explode). All three are exact BIGINTs from one narrow scan; the
    // score 206.835 − 1.015·(W/S) − 84.6·(Syl/W) is the same scalar
    // expression both engines evaluate on identical integers, pre-rounded
    // per doc then decimal-summed for the per-source mean.
    "q_readability" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("words", size(filter(split(col("text"), "\\s+"),
          x => length(x) > 0)).cast("long"))
        .withColumn("sents", greatest(lit(1L),
          size(filter(split(col("text"), "[.!?]+"),
            x => length(trim(x)) > 0)).cast("long")))
        .withColumn("syls", size(regexp_extract_all(lower(col("text")),
          lit("[aeiouy]+"), lit(0))).cast("long"))
        .where(col("words") > 0)
        .withColumn("flesch", expr(
          "CAST(round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)" +
            " - 84.6 * (CAST(syls AS DOUBLE) / words), 4) AS DECIMAL(18,4))"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("words")).as("total_words"),
          sum(col("syls")).as("total_syls"),
          expr("round(CAST(sum(flesch) AS DOUBLE) / count(*), 6)")
            .as("avg_flesch"))
        .orderBy("source")),

    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Tokenize.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Winnowing fingerprints (operators.Winnow — Schleimer/MOSS): every
    // w-window of k-gram hashes contributes its MINIMUM hash; the distinct
    // selected set is the document fingerprint — ~2/(w+1) the density of
    // full shingling with a guarantee that any match of length ≥ w+k-1
    // shares a fingerprint. One narrow gram explode + one doc_id window
    // shuffle; fingerprint set md5'd so the dump stays one row per doc.
    // WinnowSpec cross-checks the operator against an in-memory mirror
    // and the match guarantee on random strings.
    "q_winnow" -> ((s, dir) =>
      graft.operators.Winnow
        .selected(docs(s, dir), "doc_id", "text", WinnowK, WinnowW)
        .groupBy("doc_id")
        .agg(max(col("ng")).as("n_grams"),
          sort_array(collect_set(col("wm"))).as("fps"))
        .select(col("doc_id"), col("n_grams"),
          expr("CAST(size(fps) AS BIGINT)").as("n_fp"),
          expr("md5(array_join(transform(fps, x -> CAST(x AS STRING)), ','))")
            .as("fp_md5"))
        .orderBy("doc_id")),

    // Winnowing as a dedup scale path: docs whose selected-fingerprint
    // sets overlap heavily are near-dups. Same bucket-join discipline as
    // minhash/ngram: a fingerprint's document frequency is capped (df in
    // [2, WinnowDfCap]) before the self-join, so corpus boilerplate (a
    // fingerprint in thousands of docs) never fans out — pairs per
    // fingerprint ≤ C(cap, 2) at any corpus size. Pairs are kept when the
    // overlap coefficient n_shared / min(|fps_a|, |fps_b|) ≥ threshold —
    // a set-containment test, so a doc embedded in a longer one still
    // scores 1.0. The oracle replays the identical cap and ratio.
    "q_winnow_pairs" -> ((s, dir) => {
      // the distinct fingerprint set is ~2/(w+1) the gram volume and has
      // FOUR consumers (sizes, df filter, both join sides) — persist it
      // (policy knob) so the explode+window pipeline runs once
      val fp = maybePersist(graft.operators.Winnow
        .selected(docs(s, dir), "doc_id", "text", WinnowK, WinnowW)
        .select(col("doc_id"), col("wm")).distinct())
      val nfp = fp.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      val rare = fp.groupBy("wm").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2 && col("c") <= WinnowDfCap).select("wm")
      val capped = fp.join(rare, Seq("wm"))
      capped.alias("x")
        .join(capped.alias("y"),
          col("x.wm") === col("y.wm") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(nfp.select(col("doc_id").as("a"), col("nf").as("na")), Seq("a"))
        .join(nfp.select(col("doc_id").as("b"), col("nf").as("nb")), Seq("b"))
        .where(col("n_shared") >= least(col("na"), col("nb")) * WinnowOverlap)
        .select(col("a"), col("b"), col("n_shared"),
          round(col("n_shared") / least(col("na"), col("nb")), 4).as("overlap"))
        .orderBy("a", "b")
    }),

    // SQL front door for the winnowing Generator: the same selection
    // reached as LATERAL VIEW winnow_fingerprints(text, k, w) over plain
    // SQL text — proof the registered function library composes in SQL,
    // not just through the Column API. Output: per-doc fingerprint-set
    // size (docs with no full window emit no rows on either engine).
    "q_sql_winnow" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      docs(s, dir).createOrReplaceTempView("documents_wv")
      s.sql(
        s"""SELECT doc_id, CAST(count(DISTINCT wm) AS BIGINT) AS n_fp
           |FROM documents_wv
           |LATERAL VIEW winnow_fingerprints(text, $WinnowK, $WinnowW) wf AS i, wm, ng
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    }),

    // STREAMING SINK ROUND-TRIP: a real Structured Streaming job (file
    // source over the documents parquet, AvailableNow trigger) upserts
    // per-batch word counts into a parquet state table via foreachBatch —
    // the production "stream into a queryable table" shape — and the
    // RESULT of the batch read-back is what the DuckDB oracle checks
    // (batch wordcount over the same corpus). State is versioned per
    // batch (state_N reads state_{N-1}) so the upsert never overwrites
    // a directory it is reading; the checkpoint makes re-runs no-ops.
    "q_stream_sink_roundtrip" -> ((s, dir) => {
      // keyed by the sf dir name: two corpora in one JVM must not fold
      // batches into each other's state tables
      val base = s"$TmpRoot/stream_upsert_${new java.io.File(dir).getName}"
      val sch = s.read.parquet(s"$dir/documents.parquet").schema
      // the file source wants a DIRECTORY; the harness table is a single
      // file inside the sf dir, so scope the listing with a glob filter
      val src = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
      val words = Tokenize.tokenize(src.select(col("doc_id"), col("text")), "text")
        .select("word")
      words.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val ss = batch.sparkSession
          val prev = s"$base/state_${id - 1}"
          val counts = batch.groupBy("word")
            .agg(count(lit(1)).cast("long").as("n"))
          val merged =
            if (java.nio.file.Files.exists(java.nio.file.Paths.get(prev)))
              ss.read.parquet(prev).unionByName(counts)
                .groupBy("word").agg(sum(col("n")).cast("long").as("n"))
            else counts
          merged.write.mode("overwrite").parquet(s"$base/state_$id")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      val latest = Option(new java.io.File(base).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .map(_.getName).filter(_.startsWith("state_"))
        .map(_.stripPrefix("state_").toLong)
        .maxOption.getOrElse(sys.error(
          s"no state_* under $base: checkpoint survived but state dirs " +
            "are gone — delete the checkpoint to replay"))
      s.read.parquet(s"$base/state_$latest").orderBy("word")
    }),

    // STREAM-STREAM JOIN SINK: the watermarked click→purchase inner join
    // (StreamOps.clickToPurchase — user equi-key + event-time bound, the
    // state-eviction contract of any unbounded-unbounded join) run as a
    // real AvailableNow job over the events parquet, appended to a parquet
    // sink, then batch-read and DuckDB-checked against the equivalent
    // batch join. Inner stream-stream joins emit matches in the batch
    // they occur, so the single-file AvailableNow run is complete by
    // construction; the checkpoint makes re-runs no-ops.
    "q_stream_join_sink" -> ((s, dir) => {
      import s.implicits._
      val base = s"$TmpRoot/stream_join_${new java.io.File(dir).getName}"
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val src = normalizeTs(s.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val ev = src.as[graft.streaming.Event]
      val clicks = ev.where(col("event_type") === "click")
        .as[graft.streaming.Event]
      val purchases = ev.where(col("event_type") === "purchase")
        .as[graft.streaming.Event]
      graft.streaming.StreamOps.clickToPurchase(clicks, purchases)
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .format("parquet").option("path", s"$base/out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$base/out")
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          round(col("purchase_value"), 2).as("purchase_value"))
        .orderBy("click_id", "purchase_id")
    }),

    // K-MEANS corpus clustering (operators.KMeans): fixed-iteration
    // Lloyd's over the integer-quantized embeddings — k smallest-id init,
    // exact-BIGINT assignment distances (×1000 fixed-point centroids), so
    // there is no floating-point accumulation order anywhere and the
    // DuckDB oracle unrolls the identical iterations. Output: per-cluster
    // membership stats + the centroid fingerprint.
    "q_kmeans" -> ((s, dir) => {
      val vecs = quantized(s, dir).select(col("vec_id").as("id"), col("q"))
      val cents = graft.operators.KMeans.centroids(vecs, KmK, KmIters)
      val q1000 = vecs.select(col("id"),
        expr("transform(q, x -> x * CAST(1000 AS BIGINT))").as("v"))
      graft.operators.KMeans.assign(q1000, cents)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          min(col("id")).as("min_vec"), max(col("id")).as("max_vec"),
          // exact decimal sum (~2·10¹⁹ at sf0.01 — beyond float64
          // exactness) emitted as its exact DIGIT STRING: a decimal128
          // column here is the one value in the catalog whose pandas/
          // pyarrow representation can drift between the oracle's DuckDB
          // and the parquet reader (the r4/r5 driver-gate hash mismatch;
          // same class as the q_smoothed_rate DECIMAL/DOUBLE drift). A
          // VARCHAR of the exact integer has one representation everywhere.
          sum(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("string").as("inertia"))
        .join(cents.select(col("cid"),
          expr("md5(array_join(transform(c1000, x -> CAST(x AS STRING)), ','))")
            .as("c_md5")), "cid")
        .orderBy("cid")
    }),

    // Simplified (centroid-based) silhouette of the q_kmeans clustering:
    // per point, a = distance to its own centroid, b = distance to the
    // nearest OTHER centroid, s = (b − a)/b — the clustering-quality
    // audit run before trusting cluster-quota sampling (q_sample_diverse).
    // Centroid-based silhouette is the LINEAR form (k distances per
    // point against the broadcast k×dims table) — full silhouette's
    // per-cluster all-pairs would be quadratic at scale. Distances are
    // exact BIGINTs; sqrt/divide are two correctly-rounded IEEE ops with
    // one spelling in both engines; per-point scores 6-rounded then
    // decimal-summed per cluster.
    "q_silhouette" -> ((s, dir) => {
      val vecs = quantized(s, dir).select(col("vec_id").as("id"), col("q"))
      val cents = graft.operators.KMeans.centroids(vecs, KmK, KmIters)
      val dists = vecs.select(col("id"),
          expr("transform(q, x -> x * CAST(1000 AS BIGINT))").as("v"))
        .crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          expr("ivec_sqdist(v, c1000)").as("d2"))
      dists.groupBy("id").agg(
          min(struct(col("d2"), col("cid"))).as("m1"),
          expr("element_at(array_sort(collect_list(struct(d2, cid))), 2).d2")
            .as("b2"))
        .select(col("m1.cid").as("cid"),
          expr("round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(m1.d2 AS DOUBLE)))" +
            " / sqrt(CAST(b2 AS DOUBLE)), 6)").as("sc"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), dsum(col("sc"), 6).as("ssum"))
        .select(col("cid"), col("n"),
          expr("round(ssum / n, 6)").as("mean_sil"))
        .orderBy("cid")
    }),

    // SEMANTIC DEDUP (SemDeDup, Abbas et al. '23): k-means buckets the
    // embedding space, then near-duplicates are pruned ONLY within each
    // cluster — the clustering IS the blocking step, so the pair join is
    // Σ|cluster|², never corpus², and in the real recipe k grows with
    // the corpus to keep cluster sizes bounded (here k = KmK, the
    // harness-scale contract; the same capped-bucket shape as LSH band
    // dedup). Keep-first semantics: a vector drops iff some SMALLER id
    // in its cluster has quantized cosine ≥ SemTau with it — exact
    // integer dots, one identical float chain, no iteration. Zero-norm
    // vectors are excluded up front (cosine undefined).
    "q_semdedup" -> ((s, dir) => {
      val vecs = quantized(s, dir).select(col("vec_id").as("id"),
        col("q"), col("nq"))
      val cents = graft.operators.KMeans.centroids(
        vecs.select("id", "q"), KmK, KmIters)
      val asg = graft.operators.KMeans.assign(
        vecs.select(col("id"),
          expr("transform(q, x -> x * CAST(1000 AS BIGINT))").as("v")),
        cents).select("id", "cid")
      val qa = vecs.where(col("nq") > 0).join(asg, "id")
      val dropped = qa.alias("x").join(qa.alias("y"),
          col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
        .select(col("y.id").as("id"),
          expr("ivec_dot(x.q, y.q)").as("dot"),
          col("x.nq").as("na"), col("y.nq").as("nb"))
        .where(expr(CosExpr) >= SemTau)
        .select("id").distinct().withColumn("drp", lit(1L))
      qa.join(dropped, Seq("id"), "left_outer")
        .groupBy("cid")
        .agg(count(lit(1)).as("n"),
          sum(when(col("drp").isNull, 1L).otherwise(0L)).as("n_kept"),
          min(when(col("drp").isNull, col("id"))).as("min_kept"),
          max(when(col("drp").isNull, col("id"))).as("max_kept"))
        .orderBy("cid")
    }),

    // DIVERSITY SAMPLING — clustering and sampling COMPOSED: k-means
    // buckets the embedding space, then a fixed per-cluster quota keeps
    // the DiverseQuota smallest (md5, id) ranks per cluster (via the same
    // distributed Ranks.withinKey — a popular cluster never ranks on one
    // task). The standard "cover the space, don't oversample the dense
    // core" curation step; the oracle replays clustering + quota exactly.
    "q_sample_diverse" -> ((s, dir) => {
      val vecs = quantized(s, dir).select(col("vec_id").as("id"), col("q"))
      val cents = graft.operators.KMeans.centroids(vecs, KmK, KmIters)
      val q1000 = vecs.select(col("id"),
        expr("transform(q, x -> x * CAST(1000 AS BIGINT))").as("v"))
      val assigned = graft.operators.KMeans.assign(q1000, cents)
        .withColumn("hx", md5(concat(lit("div:"), col("id").cast("string"))))
      graft.operators.Ranks.withinKey(assigned, "cid", Seq("hx", "id"))
        .where(col("rk") <= DiverseQuota)
        .groupBy("cid")
        .agg(count(lit(1)).as("n_kept"), min(col("id")).as("min_kept"),
          max(col("id")).as("max_kept"), sum(col("id")).as("sum_kept"))
        .orderBy("cid")
    }),

    // DOMAIN MIXING (mixture resampling): downsample each language to hit
    // a target ratio (4:2:2:1:1) exactly — the data-mixing step of LLM
    // corpus assembly. Achievable size is exact integer arithmetic
    // (units = min over langs of n DIV w; kept = w·units) and the keep
    // rule is deterministic: the w·units smallest (md5(doc_id), doc_id)
    // ranks per lang, ranked distributively by Ranks.withinKey — no
    // per-lang single-task window at any corpus size.
    "q_mix_sources" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("hx", md5(concat(lit("mix:"), col("doc_id").cast("string"))))
      val wDf = MixWeights.toDF("lang", "w")
      val counts = d.groupBy("lang").agg(count(lit(1)).as("n"))
      val withW = counts.join(wDf, "lang")
      val units = withW.agg(min(expr("n DIV w")).as("u"))
      val kept = graft.operators.Ranks.withinKey(d, "lang", Seq("hx", "doc_id"))
        .join(broadcast(withW.select("lang", "w")), "lang")
        .crossJoin(broadcast(units))
        .where(col("rk") <= col("w") * col("u"))
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"),
          min(col("doc_id")).as("first_kept"))
        .join(counts, Seq("lang"))
        .select("lang", "n", "n_kept", "kept_chars", "first_kept")
        .orderBy("lang")
    }),

    // STREAMING WINDOWED AGGREGATION through a sink: tumbling 1-hour
    // event-time windows aggregated in COMPLETE mode (state = the whole
    // window table — the dashboard-refresh shape), snapshotted per batch
    // into a versioned parquet table via foreachBatch; the batch read-back
    // of the final snapshot must equal the batch windowed aggregate (the
    // oracle). Window starts are emitted as epoch micros so the parquet
    // types line up engine-to-engine. Complements q_stream_sink_roundtrip
    // (append-mode counts) and the StreamOpsSpec watermark/late-data
    // coverage.
    "q_stream_window_sink" -> ((s, dir) => {
      val base = s"$TmpRoot/stream_window_${new java.io.File(dir).getName}"
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val src = normalizeTs(s.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))
      src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("ws"),
          col("event_type"), col("n"))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("complete")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$base/state_$id")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      val latest = Option(new java.io.File(base).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .map(_.getName).filter(_.startsWith("state_"))
        .map(_.stripPrefix("state_").toLong)
        .maxOption.getOrElse(sys.error(
          s"no state_* under $base: checkpoint survived but state dirs " +
            "are gone — delete the checkpoint to replay"))
      s.read.parquet(s"$base/state_$latest").orderBy("ws", "event_type")
    }),

    // STREAMING DEDUP SINK (4th oracle-gated stream): the
    // transformWithState duplicate-accounting processor (StreamOps
    // .dedupCounts — engine-managed ValueState per content key, the
    // arbitrary-state API the spec tier exercises) run as a real
    // AvailableNow job over the events parquet; each batch's updated
    // (key, n) rows land in a per-batch parquet and the LATEST batch
    // per key is the final state — which the DuckDB oracle must equal
    // via a plain batch GROUP BY. Proves the stateful-processor tier
    // end-to-end, not just in-JVM.
    "q_stream_dedup_sink" -> ((s, dir) => {
      import s.implicits._
      val base = s"$TmpRoot/stream_dedup_${new java.io.File(dir).getName}"
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val src = s.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
      val keys = src.select(concat(col("user_id").cast("string"),
        lit(":"), col("event_type")).as("value")).as[String]
      // transformWithState requires the RocksDB store (multiple column
      // families); restore the session's provider afterwards
      val pk = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(pk)
      s.conf.set(pk, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try {
        graft.streaming.StreamOps.dedupCounts(keys).toDF()
          .writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("update")
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(s"$base/sink")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally prev match {
        case Some(v) => s.conf.set(pk, v)
        case None => s.conf.unset(pk)
      }
      val sink = s.read.parquet(s"$base/sink")
      // latest batch per key wins (update-mode semantics)
      sink.groupBy("key")
        .agg(max(struct(col("batch_id"), col("n"))).as("m"))
        .select(col("key"), col("m.n").as("n"))
        .orderBy("key")
    }),

    // Vocabulary build + out-of-vocabulary rate (the tokenizer-coverage
    // signal): top-V words by corpus frequency (count-desc/word-asc so the
    // cut is deterministic under ties), then per-doc OOV fraction. The
    // vocab is tiny by construction → broadcast probe; the corpus side
    // aggregates map-side and shuffles only |docs| rows.
    "q_vocab_oov" -> ((s, dir) => {
      val toks = corpusToks(s, dir)
      val vocab = toks.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc).limit(VocabSize)
        .select(col("word"), lit(1L).as("in_v"))
      toks.join(broadcast(vocab), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_toks"), col("n_oov"),
          round(col("n_oov") / col("n_toks"), 4).as("oov_rate"))
        .orderBy("doc_id")
    }),

    // Count-min sketch over the token frequency stream: d hash rows ×
    // w cells, cell = Σ counts of words hashing there — merge is
    // elementwise sum, so the sketch is commutative/associative (partial
    // map-side aggregation works, merge order can't change a cell). The
    // query materializes the sketch AND probes it for every vocab word:
    // n_est = min over rows of the word's cell ≥ n_true, with equality
    // unless the word collides in all d rows (width 64 forces real
    // collisions at 31 words × 4 rows). Both engines replay the identical
    // md5-derived hash family.
    "q_sketch_cms" -> ((s, dir) =>
      graft.operators.Sketches
        .cmsEstimates(corpusToks(s, dir).select("word"), "word", CmsDepth, CmsWidth)
        .orderBy("word")),

    // Grouped CMS — one independent sketch PER SOURCE in a single pass
    // (the per-source/per-day word-frequency profile), mirroring
    // q_sketch_hll_grouped's shape: the shuffle carries |sources|·d·w
    // cells no matter the corpus size, and per-group estimates still
    // never undercount. Words are attributed to a doc's source via the
    // tokenize join.
    "q_sketch_cms_grouped" -> ((s, dir) => {
      val t = toks(s, dir)
        .join(docs(s, dir).select("doc_id", "source"), "doc_id")
      graft.operators.Sketches
        .cmsEstimates(t.select("source", "word"), "word", CmsDepth, CmsWidth,
          Seq("source"))
        .orderBy("source", "word")
    }),

    // Heavy hitters (φ = 1/64 of corpus tokens) via sketch-then-verify:
    // CMS point estimates never undercount, so thresholding n_est yields
    // a candidate set with NO false negatives; the exact count then
    // confirms or rejects each candidate. At 100 TB the pattern's value
    // is that exact counting is confined to |candidates| ≈ 1/φ keys —
    // the sketch pass is constant-state and the threshold is
    // corpus-relative (integer tot div 64 — scale-honest, no magic
    // absolute count). Unconfirmed rows (collision-inflated) are KEPT
    // with confirmed=0 so the oracle pins the false-positive behavior
    // too, not just the survivors.
    "q_heavy_hitters" -> ((s, dir) => {
      val t = toks(s, dir)
      val est = graft.operators.Sketches
        .cmsEstimates(t.select("word"), "word", CmsDepth, CmsWidth)
      val total = t.agg(count(lit(1)).as("tot"))
      est.crossJoin(broadcast(total))
        .withColumn("thr", expr("tot div 64"))
        .where(col("n_est") >= col("thr"))
        .select(col("word"), col("n_est"), col("n_true"),
          when(col("n_true") >= col("thr"), 1L).otherwise(0L).as("confirmed"))
        .orderBy("word")
    }),

    // HyperLogLog from scratch (Flajolet et al.): 64 registers, register =
    // max leading-zero rank of the 54-bit hash remainder — max is
    // order-free, so the register table is exact under any partitioning.
    // The harmonic-mean estimate keeps ALL integer math exact: Σ 2^-reg is
    // computed as Σ 2^(R-reg) (a BIGINT — 64 terms ≤ 2^54) over the max
    // register R, leaving exactly one IEEE multiply+divide at the end,
    // identical in both engines. n=14.7k keys ≫ 2.5m=160, so the
    // small-range linear-counting correction path never triggers (noted,
    // not implemented). reg_md5 pins the full register table.
    "q_sketch_hll" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val regs = graft.operators.Sketches
        .hllRegisters(li.select(col("l_orderkey").as("k")), "k", HllM)
      val est = graft.operators.Sketches.hllEstimate(regs, HllM, HllAlpha)
      val regMd5 = regs.agg(
        expr("md5(array_join(transform(sort_array(collect_list(struct(bucket, reg))), x -> CAST(x.reg AS STRING)), ','))")
          .as("reg_md5"))
      li.agg(count_distinct(col("l_orderkey")).as("n_true"))
        .crossJoin(broadcast(est))
        .crossJoin(broadcast(regMd5))
        .select(col("n_true"), lit(HllM.toLong).as("m"), col("est"), col("reg_md5"))
    }),

    // Native Generator (the UDTF extension tier, completing the custom-
    // operator surface: expression / optimizer rule / strategy+exec /
    // parser / DSv2 / generator): the sampled char-shingle explode as ONE
    // GenerateExec row-emitter — the HOF spelling
    // explode(transform(sequence(...))) materializes a per-row array of
    // len/stride elements first; the generator never allocates it. Stats
    // per doc over the generated shingle stream.
    "q_shingle_gen" -> ((s, dir) =>
      docs(s, dir)
        .selectExpr("doc_id", s"char_shingles(text, $K, $Stride)")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          count_distinct(col("sh")).as("n_distinct"),
          min(col("sh")).as("min_sh"), max(col("sh")).as("max_sh"))
        .orderBy("doc_id")),

    // HLL MERGEABILITY — the property the sketch exists for at 100 TB:
    // the register tables of two populations (here: view vs purchase
    // users) merge by elementwise MAX into the exact sketch of their
    // union — no re-scan of either input — and inclusion-exclusion gives
    // an intersection estimate for free. This is how per-partition /
    // per-day sketches roll up to any ad-hoc slice.
    "q_sketch_hll_union" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      def slice(t: String) =
        ev.where(col("event_type") === t).select(col("user_id").as("k"))
      val ra = graft.operators.Sketches.hllRegisters(slice("view"), "k", HllM)
      val rb = graft.operators.Sketches.hllRegisters(slice("purchase"), "k", HllM)
      val merged = ra.select(col("bucket"), col("reg").as("rega"))
        .join(rb.select(col("bucket"), col("reg").as("regb")), "bucket")
        .select(col("bucket"), greatest(col("rega"), col("regb")).as("reg"))
      def est1(regs: DataFrame, as: String) = graft.operators.Sketches
        .hllEstimate(regs, HllM, HllAlpha).select(col("est").as(as))
      slice("view").agg(count_distinct(col("k")).as("n_a"))
        .crossJoin(broadcast(
          slice("purchase").agg(count_distinct(col("k")).as("n_b"))))
        .crossJoin(broadcast(
          ev.where(col("event_type").isin("view", "purchase"))
            .agg(count_distinct(col("user_id")).as("n_union_true"))))
        .crossJoin(broadcast(est1(ra, "est_a")))
        .crossJoin(broadcast(est1(rb, "est_b")))
        .crossJoin(broadcast(est1(merged, "est_union")))
        .select(col("n_a"), col("n_b"), col("n_union_true"),
          col("est_a"), col("est_b"), col("est_union"),
          round(col("est_a") + col("est_b") - col("est_union"), 2)
            .as("est_inter"))
    }),

    // Data-quality expectation checks — the validation stage every ingest
    // pipeline runs before training data is admitted: each rule is a
    // conditional sum over ONE shared scan (no per-rule pass), so adding a
    // rule costs one codegen'd expression, not a job. Violations are
    // counted, not fatal — the downstream filter decides.
    "q_dq_checks" -> ((s, dir) => {
      val checks: Seq[(String, Column)] = Seq(
        "null_text" -> (col("text").isNull || length(col("text")) === 0),
        "bad_lang" -> !col("lang").isin("en", "fr", "de", "es", "zh"),
        "n_chars_mismatch" -> (col("n_chars") =!= length(col("text"))),
        "negative_id" -> (col("doc_id") < 0),
        "oversize" -> (col("n_chars") > 100000))
      docs(s, dir).agg(
        count(lit(1)).as("n_rows"),
        checks.map { case (n, c) =>
          sum(when(c, 1L).otherwise(0L)).as(s"viol_$n")
        }: _*)
    }),

    // Bloom filter from scratch (completing the sketch trio): k md5-derived
    // bit positions per member key; the filter is the distinct set-bit
    // set — union is the merge, so build parallelizes like any distinct.
    // The query then probes a DISJOINT key set (members shifted by 10^6),
    // so every positive is a FALSE positive and the measured fp rate is
    // exact — observed ≈ (1-e^(-kn/m))^k. bits_md5 pins the whole filter;
    // everything is integer/md5 math, identical in both engines. (The
    // production operator for join pruning is operators.BloomPrune /
    // q_join_bloom — this query is the sketch itself, oracle-checked.)
    "q_sketch_bloom" -> ((s, dir) => {
      val members = table(s, dir, "customer").select(col("c_custkey").as("key"))
      val bits = members
        .select(col("key"), explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
        .select(expr(s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', CAST(key AS STRING))), 1, 8), 16, 10) AS BIGINT) % $BloomM")
          .as("pos")).distinct()
      val probes = members.select((col("key") + 1000000L).as("pkey"))
      val probePos = probes
        .select(col("pkey"), explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
        .select(col("pkey"),
          expr(s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', CAST(pkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % $BloomM")
            .as("pos"))
      val fp = probePos.join(bits, Seq("pos"))
        .groupBy("pkey").agg(count(lit(1)).as("hits"))
        .where(col("hits") === BloomK)
      members.agg(count(lit(1)).as("n_members"))
        .crossJoin(bits.agg(count(lit(1)).as("n_bits"),
          expr("md5(array_join(transform(sort_array(collect_list(pos)), x -> CAST(x AS STRING)), ','))")
            .as("bits_md5")))
        .crossJoin(probes.agg(count(lit(1)).as("n_probes")))
        .crossJoin(fp.agg(count(lit(1)).as("n_fp")))
        .select(col("n_members"), col("n_bits"), col("n_probes"), col("n_fp"),
          round(col("n_fp") / col("n_probes"), 6).as("fp_rate"), col("bits_md5"))
    }),

    // Grouped HyperLogLog — the realistic shape: one sketch PER KEY
    // (approx distinct users per event type), all keys in a single pass.
    // Same exact-integer register math as q_sketch_hll; the shuffle
    // carries |keys|·m register rows no matter how many events stream
    // through. No small-range linear-counting correction (it needs ln(),
    // whose last-ulp behavior differs across libm implementations — the
    // uncorrected estimate is the same IEEE expression in both engines).
    "q_sketch_hll_grouped" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val regs = graft.operators.Sketches.hllRegisters(
        ev.select("event_type", "user_id"), "user_id", HllM, Seq("event_type"))
      val est = graft.operators.Sketches
        .hllEstimate(regs, HllM, HllAlpha, Seq("event_type"))
      ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n_true"))
        .join(est, Seq("event_type"))
        .orderBy("event_type")
    }),

    // T5-style span corruption accounting: deterministic span starts
    // (md5(doc:pos) ≡ 0 mod 10), fixed span width 3, overlapping spans
    // UNION — a position is masked iff a start falls in [pos−2, pos]
    // (rolling max over the start flag), span count = maximal-run starts
    // (masked ∧ ¬lag(masked)). Pure integer/window ops, reproducible at
    // any partitioning; windows are per-doc over token positions (doc-
    // length bounded), the corpus-scale stage is one tokenize explode +
    // one per-source aggregation.
    "q_span_corrupt" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pos = docs(s, dir)
        .select(col("doc_id"), col("source"),
          posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
        .withColumn("st", expr(
          "CAST(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', " +
            "CAST(p AS STRING))), 1, 8), 16, 10) AS BIGINT) % 10 = 0 AS INT)"))
      val win = Window.partitionBy("doc_id").orderBy("p")
      val masked = pos
        .withColumn("m",
          max(col("st")).over(win.rowsBetween(-2, Window.currentRow)))
        .withColumn("run_start", expr(
          "CAST(m = 1 AND coalesce(lag(m, 1) OVER " +
            "(PARTITION BY doc_id ORDER BY p), 0) = 0 AS INT)"))
      masked.groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("m")).cast("long").as("n_masked"),
          sum(col("run_start")).cast("long").as("n_spans"))
        .withColumn("mask_ratio", expr(
          "round(CAST(n_masked AS DOUBLE) / n_tokens, 6)"))
        .orderBy("source")
    }),

    // ROLLING-WINDOW HLL: 7-day rolling distinct users per day, computed
    // by max-merging the per-day register tables over a RANGE window
    // frame — the "sliding distinct" a dashboard needs, at register cost.
    // This is the mergeability property in window form: the frame never
    // touches raw events, only the |days|×m register table (metadata-
    // scale at any corpus size); the one corpus-scale stage is the
    // per-day register aggregation. Exact truth comes from a bounded ×7
    // day explode over the distinct (day, user) pairs — a bin fan-out,
    // not a range BNLJ.
    "q_sketch_hll_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
        .select(expr("CAST(unix_date(to_date(ts)) AS BIGINT)").as("day"),
          col("user_id"))
      val regs = graft.operators.Sketches
        .hllRegisters(ev, "user_id", HllM, Seq("day"))
      val w = Window.partitionBy("bucket").orderBy("day").rangeBetween(-6, 0)
      val merged = regs.withColumn("mreg", max("reg").over(w))
        .select(col("day"), col("bucket"), col("mreg").as("reg"))
      val est = graft.operators.Sketches
        .hllEstimate(merged, HllM, HllAlpha, Seq("day"))
      val du = ev.distinct()
      val days = du.select("day").distinct()
      val truth = du
        .select(explode(expr("sequence(day, day + 6)")).as("day"),
          col("user_id"))
        .join(days, Seq("day"), "left_semi")
        .groupBy("day").agg(count_distinct(col("user_id")).as("n_true"))
      truth.join(est, Seq("day")).orderBy("day")
    }),

    // Repetition signals (the Gopher-style quality filters): duplicate-
    // token fraction and most-common-token fraction per doc. Template spam
    // and keyword stuffing sit at high dup_frac/top_frac. One narrow
    // tokenize + two partial-agg collapses; ratios are single IEEE
    // divisions over exact integers — engine-identical.
    "q_repetition" -> ((s, dir) => {
      val wc = toks(s, dir).groupBy("doc_id", "word")
        .agg(count(lit(1)).as("n"))
      wc.groupBy("doc_id").agg(
          sum(col("n")).as("n_tok"),
          count(lit(1)).as("n_distinct"),
          max(col("n")).as("top_n"))
        .withColumn("dup_frac",
          round(expr("1.0 - CAST(n_distinct AS DOUBLE) / n_tok"), 4))
        .withColumn("top_frac",
          round(expr("CAST(top_n AS DOUBLE) / n_tok"), 4))
        .orderBy("doc_id")
    }),

    // Context-window chunking with overlap: each doc's token stream split
    // into 32-token windows at stride 24 (the training-sample slicing
    // step between cleaning and packing). Emits one row per chunk —
    // boundaries are closed-form over the whitespace token count, so the
    // explode is a narrow fan-out with no shuffle at all.
    "q_chunk_overlap" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          expr("CAST(size(split(trim(text), ' +')) AS BIGINT)").as("n_tok"))
        .withColumn("n_chunks", expr(
          "CASE WHEN n_tok <= 32 THEN CAST(1 AS BIGINT) " +
            "ELSE 1 + CAST(floor((n_tok - 32 + 23) / 24.0) AS BIGINT) END"))
        .select(col("doc_id"), col("n_tok"),
          explode(expr("sequence(CAST(1 AS BIGINT), n_chunks)")).as("chunk_id"))
        .withColumn("chunk_start", expr("1 + (chunk_id - 1) * 24"))
        .withColumn("chunk_len",
          expr("least(n_tok - chunk_start + 1, CAST(32 AS BIGINT))"))
        .orderBy("doc_id", "chunk_id")),

    // SUB-document dedup: exact paragraph-level dedup across the corpus
    // (boilerplate headers/footers repeat across docs that are NOT
    // near-dups as wholes — the real-pipeline granularity below document
    // dedup). Keeper = first occurrence in (doc_id, position) order.
    // Scale shape: groupBy(para) with a lexicographic min-struct collapses
    // map-side (a paragraph duplicated 10⁶× shuffles ≤ 1 row per map
    // partition, not 10⁶ rows into one window sort), then one join back —
    // no per-group sort anywhere.
    // Dedup-channel AGREEMENT eval: how much of the lexical near-dup
    // signal (trigram Jaccard ≥ 0.2, the q_dedup_ngram chain) does the
    // semantic channel (embedding cos ≥ 0.7, label-blocked over ALL
    // vectors) recover, and vice versa — the calibration a pipeline runs
    // before trusting one channel alone. Pair-set Jaccard over exact
    // integer counts; both channels keep their own blocking discipline
    // (df-capped trigrams / IVF labels), so neither goes corpus×corpus.
    "q_dedup_agreement" -> ((s, dir) => {
      val ws = docs(s, dir)
        .select(col("doc_id"), col("source"),
          Tokenize.tokenArray(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
      val tri = maybePersist(ws.select(col("doc_id"), col("source"),
        explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', element_at(ws,i), element_at(ws,i+1), element_at(ws,i+2)))"))
          .as("sh"))
        .distinct())
      val rare = tri.groupBy("source", "sh")
        .agg(count(lit(1)).as("dfreq")).where(col("dfreq") <= NgramDfCap)
        .select("source", "sh")
      val trif = tri.join(rare, Seq("source", "sh"))
      val sz = trif.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val lex = trif.alias("x")
        .join(trif.alias("y"),
          col("x.source") === col("y.source") && col("x.sh") === col("y.sh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("co"))
        .join(sz.select(col("doc_id").as("d1"), col("sz").as("sa")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("sb")), "d2")
        .where(expr("CAST(co AS DOUBLE) / (sa + sb - co) >= 0.2"))
        .select("d1", "d2")
      val all = quantized(s, dir).where(col("nq") > 0)
      val sem = all.alias("a")
        .join(all.alias("b"), col("a.label") === col("b.label")
          && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
          expr("ivec_dot(a.q, b.q)").as("dot"),
          col("a.nq").as("na"), col("b.nq").as("nb"))
        .where(expr(s"$CosExpr >= 0.7"))
        .select("d1", "d2")
      val both = lex.join(sem, Seq("d1", "d2"))
      lex.agg(count(lit(1)).as("n_lex"))
        .crossJoin(sem.agg(count(lit(1)).as("n_sem")))
        .crossJoin(both.agg(count(lit(1)).as("n_both")))
        .select(col("n_lex"), col("n_sem"), col("n_both"),
          expr("round(CAST(n_both AS DOUBLE) / (n_lex + n_sem - n_both), 6)")
            .as("agreement"))
    }),

    "q_dedup_paragraph" -> ((s, dir) => {
      val paras = docs(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
          trim(col("col")).as("para"))
        .where(length(col("para")) > 0)
      val firsts = paras.groupBy("para")
        .agg(min(struct(col("doc_id"), col("i"))).as("first"))
      paras.join(firsts, "para")
        .withColumn("kept", col("doc_id") === col("first.doc_id") &&
          col("i") === col("first.i"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_paras"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), length(col("para")).cast("long"))
            .otherwise(0L)).as("kept_chars"))
        .orderBy("doc_id")
    }),

    // Near-dup CLUSTERS via connected components: pointer-doubling
    // min-label propagation over the verified-pair graph (the union-find
    // view of dedup — the greedy d2-drop of q_dedup_apply is one policy;
    // this exposes the clusters themselves). O(log diameter) rounds, hard
    // round cap, convergence count folded into the propagation job — see
    // operators.ConnectedComponents. Oracle = DuckDB recursive CTE, a
    // different fixpoint algorithm entirely.
    "q_dedup_components" -> ((s, dir) => {
      val vp = verifiedPairs(s, dir)
      val (labels, _) = graft.operators.ConnectedComponents.labels(
        vp.select(col("d1").as("a"), col("d2").as("b")))
      labels.groupBy("l").agg(count(lit(1)).as("n_members"),
          max(col("v")).as("max_id"))
        .select(col("l").as("comp_id"), col("n_members"), col("max_id"))
        .orderBy("comp_id")
    }),

    // Near-dup clusters with a KEEP-BEST policy: per component, retain
    // the LONGEST member (n_chars, smallest doc_id on ties) — the
    // C4/RefinedWeb-style "keep the richest near-dup" curation rule, vs
    // the min-id policy of q_dedup_apply. Same components machinery; the
    // argmax is one max-struct aggregate (map-side partials — never a
    // per-component sort), doc length joins from the broadcast-size
    // documents dim at sf but shuffles on doc_id at corpus scale.
    "q_dedup_keep_best" -> ((s, dir) => {
      val vp = verifiedPairs(s, dir)
      val (labels, _) = graft.operators.ConnectedComponents.labels(
        vp.select(col("d1").as("a"), col("d2").as("b")))
      labels.join(docs(s, dir).select(col("doc_id").as("v"), col("n_chars")),
          Seq("v"))
        .groupBy("l")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("n_chars"), (-col("v")).as("nid"))).as("mx"))
        .select(col("l").as("comp_id"), col("n_members"),
          (-col("mx.nid")).as("keep_id"),
          col("mx.n_chars").cast("long").as("keep_chars"))
        .orderBy("comp_id")
    }),

    // Pearson correlation between embedding dimensions, per label —
    // computed from the five INTEGER power sums (n, Σx, Σy, Σxy, Σx², Σy²)
    // over the quantized vectors: every sum is exact (< 2^53) hence
    // order-independent, and the final correlation is one deterministic
    // IEEE expression over them. The built-in corr() accumulates doubles
    // in partition order and CANNOT hash-match across engines — this is
    // the determinism-disciplined spelling of the same statistic.
    "q_corr" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), expr(QuantSpark).as("q"))
        .select(col("label"), expr("element_at(q, 1)").as("x"),
          expr("element_at(q, 2)").as("y"))
        .groupBy("label").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x*y")).as("sxy"),
          sum(expr("x*x")).as("sxx"), sum(expr("y*y")).as("syy"))
        .withColumn("corr", round(expr(
          """(CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
            | sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) *
            |       (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))""".stripMargin), 6))
        .select("label", "n", "corr")
        .orderBy("label")),

    // The APPLY stage of paragraph dedup: rebuild each document from only
    // its KEPT paragraphs (first global occurrence), in original order.
    // collect_list is order-nondeterministic, so the rebuild sorts
    // struct(i, para) pairs (unique i) before joining — deterministic
    // under any partitioning; output is the md5 of the cleaned text plus
    // kept counts, keeping the dump small.
    "q_clean_paragraph" -> ((s, dir) => {
      val paras = docs(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
          trim(col("col")).as("para"))
        .where(length(col("para")) > 0)
      val firsts = paras.groupBy("para")
        .agg(min(struct(col("doc_id"), col("i"))).as("first"))
      paras.join(firsts, "para")
        .where(col("doc_id") === col("first.doc_id") &&
          col("i") === col("first.i"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("i"), col("para"))))
          .as("ps"))
        .select(col("doc_id"),
          expr("CAST(size(ps) AS BIGINT)").as("n_kept"),
          expr("md5(array_join(transform(ps, s -> s.para), '. '))")
            .as("clean_md5"))
        .orderBy("doc_id")
    }),

    // Higher-order array functions over the embedding vectors: filter /
    // exists / transform+aggregate — the lambda-function family (used
    // inside every ANN query) exercised as first-class operators on the
    // quantized (exact-integer) representation so both engines agree.
    "q_array_hof" -> ((s, dir) =>
      emb(s, dir)
        .select(col("vec_id"), expr(QuantSpark).as("q"))
        .select(col("vec_id"),
          expr("CAST(size(filter(q, x -> x > 0)) AS BIGINT)").as("n_pos"),
          expr("exists(q, x -> x >= 900)").as("has_big"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))").as("l1"),
          expr("CAST(array_max(q) AS BIGINT)").as("qmax"),
          expr("CAST(array_min(q) AS BIGINT)").as("qmin"))
        .orderBy("vec_id")),

    // n-gram LM quality scoring (the CCNet/KenLM-style filter): train a
    // char-bigram model on the corpus itself (P(c2|c1) = cnt(c1c2) /
    // cnt(c1 at non-final positions)), then score each doc by its average
    // negative log-likelihood — low = typical text, high = gibberish.
    // The model is |charset|² rows → broadcast joins; scoring is one
    // narrow pass. Same determinism scheme as q_char_entropy: exact
    // integer-ratio division, ln pre-rounded to 8, decimal-summed terms.
    "q_lm_score" -> ((s, dir) => lmScores(s, dir).orderBy("doc_id")),

    // PERPLEXITY-PERCENTILE FILTERING — the scoring composed with the
    // distributed percentile into the actual CCNet-style corpus gate:
    // keep documents whose average NLL is at or below the corpus p75
    // (computed by operators.Percentiles — no whole-corpus buffer), drop
    // the worst quartile. Output: kept-set summary + the threshold. The
    // oracle recomputes the same scores and quantile_cont threshold.
    "q_filter_perplexity" -> ((s, dir) => {
      // eager materialization: the per-doc score table (|docs| rows) has
      // FOUR consumers downstream (Percentiles' two rank branches, the
      // count metadata, and the keep-filter scan) — without it each one
      // re-executes the per-character bigram explode of the whole corpus
      // (measured 25.3 → ~2 s at sf0.1)
      val scores = lmScores(s, dir).withColumn("__g", lit(1))
        .ckpt()
      val thr = graft.operators.Percentiles
        .exact(scores, "__g", "nll", Seq(0.75))
        .select(col("q").as("thr"))
      // + 1e-9: nll values live on a 1e-4 grid while engine-specific IEEE
      // evaluation (FMA contraction, rounding spellings) can move the
      // interpolated threshold by an ulp (~1e-16) — the epsilon makes the
      // keep rule boundary-proof without admitting any extra grid point
      scores.crossJoin(broadcast(thr))
        .where(col("nll") <= col("thr") + 1e-9)
        .agg(count(lit(1)).as("n_kept"), sum(col("n_bigrams")).as("kept_bigrams"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // Interpolated Kneser-Ney bigram LM (Chen & Goodman '99) with dyadic
    // discount d = 3/4 — the production-grade quality scorer beside
    // q_lm_score's add-one model. Train on the hash-bucket < 80 split,
    // score the ≥ 80 held-out docs. Every case of
    //   P_KN(w|v) = max(c(vw)−d, 0)/c(v·) + d·N1+(v·)/c(v·) · N1+(·w)/NB
    // cross-multiplies into ONE integer rational (d = 3/4 makes 4·c − 3
    // exact), so ln P = round(ln(num),8) − round(ln(den),8) over BIGINTs —
    // the house ln-of-integer discipline; no float ever feeds a log.
    // Unseen context backs off to add-one continuation ((N1+(·w)+1)/(NB+V)).
    // Shape: test bigrams join three aggregate tables (bigram counts,
    // per-context totals, per-word continuation counts) on their keys —
    // shuffle equi-joins sized by |bigram types|, never corpus×corpus;
    // the 1-row totals broadcast. BIGINT products need DECIMAL(38,0) +
    // decimal-ln past ~10¹⁸ — the sketch-family upgrade path.
    "q_lm_kn" -> ((s, dir) => {
      val bg = docs(s, dir)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("a"))
        // size guard BEFORE the sequence: Spark's sequence(1, 0) steps
        // BACKWARD to [1, 0], so a one-token doc would emit two bogus
        // NULL-component bigrams while the oracle's generate_series(1, 0)
        // is empty — same guard as bigramPairs / the oracle's len(a) >= 2
        .where(expr("size(a) >= 2"))
        .select(col("doc_id"), col("source"),
          explode(expr(
            "transform(sequence(1, size(a) - 1)," +
              " i -> struct(a[i-1] AS v, a[i] AS w))")).as("b"))
        .select(col("doc_id"), col("source"),
          col("b.v").as("v"), col("b.w").as("w"))
      val train = bg.where(expr(HashBucketSpark) < 80)
      val cvw = train.groupBy("v", "w").agg(count(lit(1)).as("c"))
      val cv = cvw.groupBy("v")
        .agg(sum(col("c")).as("cv"), count(lit(1)).as("n1f"))
      val n1b = cvw.groupBy("w").agg(count(lit(1)).as("n1b"))
      val tot = broadcast(cvw.agg(count(lit(1)).as("nb"))
        .crossJoin(train.select(col("v").as("t"))
          .unionAll(train.select(col("w").as("t")))
          .agg(count_distinct(col("t")).as("vv"))))
      bg.where(expr(HashBucketSpark) >= 80)
        .join(cvw, Seq("v", "w"), "left_outer")
        .join(cv, Seq("v"), "left_outer")
        .join(n1b, Seq("w"), "left_outer")
        .crossJoin(tot)
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .withColumn("cv", coalesce(col("cv"), lit(0L)))
        .withColumn("n1f", coalesce(col("n1f"), lit(0L)))
        .withColumn("n1b", coalesce(col("n1b"), lit(0L)))
        .withColumn("num", expr(
          """CASE WHEN cv > 0 AND c > 0 THEN (4*c - 3)*nb + 3*n1f*n1b
            |     WHEN cv > 0 THEN 3*n1f*n1b + 1
            |     ELSE n1b + 1 END""".stripMargin))
        .withColumn("den", expr(
          "CASE WHEN cv > 0 THEN 4*cv*nb ELSE nb + vv END"))
        .withColumn("lp", expr(
          "round(ln(CAST(num AS DOUBLE)), 8) - round(ln(CAST(den AS DOUBLE)), 8)"))
        .groupBy("source")
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_bigrams"),
          expr("round(-CAST(sum(CAST(lp AS DECIMAL(18,8))) AS DOUBLE)" +
            " / count(*), 6)").as("avg_nll"))
        .orderBy("source")
    }),

    // Benchmark decontamination: fraction of each doc's 8-char shingles
    // that appear in a held-out "benchmark" set (here: every 97th doc
    // stands in for an eval suite). The real-pipeline shape: benchmark
    // shingle set is small → broadcast; the corpus side is one narrow
    // pass + one broadcast semi-probe, never a corpus-corpus join.
    "q_contamination" -> ((s, dir) => {
      val s8 = docs(s, dir).where(length(col("text")) >= K)
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("text")) - (K - 1), lit(Stride)))
            .as("i"), col("text"))
        .select(col("doc_id"), expr(s"substring(text, i, $K)").as("sh"))
        .distinct()
      val bench = s8.where(col("doc_id") % 97 === 0).select("sh").distinct()
      s8.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("sh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("frac", round(expr("CAST(n_hit AS DOUBLE) / n_sh"), 4))
        .orderBy("doc_id")
    }),

    // Character-entropy quality signal: H = -Σ p·ln(p) over the per-doc
    // character distribution (gibberish and template spam sit at the
    // entropy extremes). Determinism: p = cnt/total is one exact IEEE
    // division; ln is pre-rounded to 8 decimals (libm 1-ulp differences);
    // each term is cast to DECIMAL before the sum so accumulation order
    // can't change the result (same technique as q_tfidf's idf).
    "q_char_entropy" -> ((s, dir) => {
      val ch = docs(s, dir).where(length(col("text")) > 0)
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      val cnt = ch.groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy("doc_id").agg(sum(col("cnt")).as("total"))
      cnt.join(tot, "doc_id")
        .withColumn("term", expr(
          "CAST((CAST(cnt AS DOUBLE)/total) * round(ln(CAST(cnt AS DOUBLE)/total), 8) AS DECIMAL(28,10))"))
        .groupBy("doc_id")
        .agg(round((-sum(col("term"))).cast("double"), 4).as("entropy"),
          count(lit(1)).as("n_classes"))
        .orderBy("doc_id")
    }),

    // Document-length histogram (100-char buckets): the size-distribution
    // profile that drives packing budgets and truncation policies.
    "q_len_histogram" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(floor(col("n_chars") / lit(100)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("bucket")),

    // Deterministic hash sampling: keep docs whose stable md5-derived
    // bucket (of the KEY, not the row — re-runs and re-partitions agree)
    // falls under the rate. The scalable sampling primitive: a narrow
    // filter, no shuffle, no RNG state, reproducible across engines and
    // cluster sizes.
    "q_sample_hash" -> ((s, dir) =>
      docs(s, dir)
        .where(expr(s"$HashBucketSpark < 10"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // Uniform k-per-key sample via the NATIVE TopKPerKey operator: rank
    // docs inside each lang by a stable md5 of the key and keep the k
    // smallest. Equivalent to per-group reservoir sampling but
    // deterministic (reproducible across runs/cluster sizes) and planned as
    // map-side bounded-heap prune → 1 Exchange → final prune — each map
    // partition contributes ≤ k rows per lang to the shuffle, vs a full
    // per-group window sort. The oracle spells the same selection as a
    // row_number window.
    "q_sample_per_key" -> ((s, dir) => {
      val ranked = docs(s, dir).select(col("lang"), col("doc_id"),
        md5(concat(lit("smp-"), col("doc_id").cast("string"))).as("r"))
      graft.operators.TopK.perKey(ranked, Seq("lang"), Seq(("r", true)), 5)
        .select("lang", "doc_id").orderBy("lang", "doc_id")
    }),

    // Weighted (probability-proportional-to-size) Poisson sampling with an
    // INTEGER-exact inclusion rule: doc i is kept iff
    // bucket_i · W < k · w_i · 2^32, i.e. u < min(1, k·w_i/W) with
    // u = bucket/2^32 — no floating comparison anywhere near the decision
    // boundary, so both engines keep the identical sample. W is one cheap
    // global agg broadcast like tfidf's N; the filter itself is narrow and
    // shuffle-free. (The BIGINT product bounds hold to ~2^30 total weight;
    // beyond that, pre-scale W — noted, irrelevant at catalog scale.)
    "q_sample_pps" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
        .withColumn("bucket",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      val tot = d.agg(sum(col("n_chars")).as("W"))
      d.crossJoin(broadcast(tot))
        .where(col("bucket") * col("W") < lit(PpsK.toLong) * col("n_chars") * lit(1L << 32))
        .select(col("doc_id"), col("n_chars"),
          round(least(lit(1.0).cast("double"),
            (lit(PpsK.toLong) * col("n_chars")) / col("W")), 6).as("p"))
        .orderBy("doc_id")
    }),

    // Per-label embedding centroids — the k-means/IVF building block. The
    // quantized components sum exactly in BIGINT (order-free under any
    // partitioning); the only IEEE op is the terminal mean division. One
    // narrow posexplode + one (label, pos) shuffle of integer partials.
    "q_centroid" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(expr(QuantSpark)))
        .groupBy(col("label").cast("long").as("label"),
          (col("pos") + 1).cast("long").as("pos"))
        .agg(count(lit(1)).as("n"), sum(col("col")).as("sq"))
        .select(col("label"), col("pos"), col("n"), col("sq"),
          round(col("sq").cast("double") / col("n"), 4).as("c"))
        .orderBy("label", "pos")),

    // Deterministic train/val/test split (80/10/10) by the same key hash,
    // with per-split stats: the split is a pure function of doc_id, so
    // adding data never moves an existing doc across splits.
    "q_split_train" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("bucket", expr(HashBucketSpark))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("split")),

    // PII scrubbing: URLs, emails, then long digit runs masked with typed
    // placeholders (RE2-safe patterns — no backrefs/lookahead — so Java
    // and DuckDB regex engines agree). The corpus has no PII, so the
    // query plants synthetic markers derived from doc_id and the oracle
    // plants the same — masking is genuinely exercised on every row.
    "q_scrub_pii" -> ((s, dir) => {
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or https://ex.com/u/"), col("doc_id").cast("string"),
        lit(" ref "), (col("doc_id") * 1000000 + 424242).cast("string"))
      val scrubbed =
        regexp_replace(
          regexp_replace(
            regexp_replace(aug, lit(UrlRe), lit("<URL>")),
            lit(EmailRe), lit("<EMAIL>")),
          lit(DigitsRe), lit("<NUM>"))
      docs(s, dir).select(col("doc_id"),
        regexp_count(aug, lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(aug, lit(UrlRe)).cast("long").as("n_url"),
        scrubbed.as("clean"))
        .orderBy("doc_id")
    }),

    // Sequence packing: concatenate docs (in doc_id order) into training
    // rows of ~512 whitespace tokens, greedy running-sum binning. Packing
    // is per-lang so the window is partition-parallel — the 100 TB shape
    // is "pack within shard", never a global single-partition window.
    "q_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byLang = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          expr("CAST(size(split(trim(text), ' +')) AS BIGINT)").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(byLang))
        .withColumn("bin",
          floor((col("cum") - col("n_tok")) / lit(PackBudget)).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin")
    }),

    // BM25 relevance: top-20 docs for a fixed query-term set. The scale
    // shape is two narrow token aggregations (doc length; tf filtered to
    // the query terms BEFORE the shuffle) plus broadcasts of the tiny
    // df/stats sides — the corpus is never joined to itself and the top-k
    // is a TakeOrderedAndProject, not a global sort. Determinism: ln() is
    // not correctly-rounded across libms, so idf is pre-rounded to 8
    // decimals (the q_tfidf technique); the remaining ops (+,-,*,/) are
    // IEEE-exact given identical spelling, and per-term contributions are
    // rounded to 6 decimals then decimal-summed so partitioning cannot
    // reorder a float sum.
    "q_bm25" -> ((s, dir) => {
      val t = toks(s, dir)
      val dl = t.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val tf = t.where(col("word").isin(BmTerms: _*))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      tf.join(broadcast(dfreq), "word").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("contrib", expr(BmContribExpr))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), dsum(col("contrib"), 6).as("score"))
        .orderBy(desc("score"), asc("doc_id")).limit(20)
        .select(col("doc_id"), col("n_terms"), col("score"))
    }),

    // Equi-DEPTH decile binning of per-doc token counts — the feature-
    // binning pass behind quantile bucketing, built on the distributed
    // two-level rank ([[graft.operators.Ranks.withinKey]]) instead of a
    // single-partition global window: bin = (rank-1)·10 div n over the
    // UNIQUE order (n_tok, doc_id), so ties never straddle bins
    // nondeterministically and everything stays in exact integers (no
    // interpolated quantile boundaries to ulp-flip cross-engine).
    "q_bin_equidepth" -> ((s, dir) => {
      val dl = toks(s, dir).groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      val n = dl.agg(count(lit(1)).as("n"))
      graft.operators.Ranks
        .withinKey(dl.withColumn("__k", lit(1)), "__k", Seq("n_tok", "doc_id"))
        .crossJoin(broadcast(n))
        .withColumn("bin", expr("(rk - 1) * 10 div n"))
        .groupBy(col("bin").cast("long").as("bin"))
        .agg(count(lit(1)).as("n_docs"), min("n_tok").as("lo"),
          max("n_tok").as("hi"), sum("n_tok").as("sum_tok"))
        .orderBy("bin")
    }),

    // BPE tokenizer training, first 3 merge rounds over the word-frequency
    // dictionary — the distributed core of tokenizer fitting: per round,
    // count adjacent symbol pairs weighted by word count (a narrow
    // explode + partial-agg'd sum), take the global argmax pair
    // (weight desc, pair asc — deterministic), and apply the merge with a
    // non-overlapping left-to-right literal replace. The chosen pair
    // flows back via crossJoin(broadcast(1 row)) — no driver collect, the
    // whole 3-round loop is ONE declarative plan. Scale: pair counting is
    // |vocab|-bound (not corpus-bound) after the word-count shuffle, and
    // each merge is a map-side string op.
    "q_bpe_merges" -> ((s, dir) => {
      val (_, merges) = bpeChain(s, dir)
      merges.zipWithIndex.map { case (t, i) =>
        t.withColumn("step", lit((i + 1).toLong))
      }.reduce(_ unionByName _)
        .select(col("step"), col("l"), col("r"), col("w"))
        .orderBy("step")
    }),

    // BPE APPLY — the tokenizer completes train→apply the way the dedup
    // family completes candidates→verify→apply: the 3 learned merges are
    // applied to the whole vocabulary (the same broadcast-pair literal
    // replace as training, so the two queries cannot drift) and each
    // word's resulting symbol count is emitted. n_sym is the per-word
    // token cost under the learned tokenizer — Σ cnt·n_sym is the corpus
    // token count a budget planner would use. All map-side after the
    // word-count collapse.
    "q_bpe_apply" -> ((s, dir) => {
      val (wc3, _) = bpeChain(s, dir)
      wc3.select(col("word"), col("cnt"),
        expr("CAST(size(split(trim(seq), ' ')) AS BIGINT)").as("n_sym"))
        .orderBy("word")
    }),

    // Deterministic training-data shuffle: shard = md5 bucket of doc_id
    // (the shared 100-bucket rule) folded to 8 shards,
    // within-shard position = rank of an INDEPENDENT salted hash (so the
    // order inside a shard is decorrelated from the shard assignment) via
    // `Ranks.withinKey` — a 10¹¹-doc shard never sorts on one task. The
    // whole permutation is a pure function of doc_id: re-runs, retries and
    // corpus growth never reorder existing docs relative to each other
    // within a shard (new docs splice in at their hash positions).
    "q_shuffle_shards" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
        .withColumn("shard", expr(s"($HashBucketSpark) % 8"))
        .withColumn("h", md5(concat(lit("ord"), col("doc_id").cast("string"))))
      graft.operators.Ranks.withinKey(d, "shard", Seq("h", "doc_id"))
        .select(col("doc_id"), col("shard"), col("rk").as("pos"))
        .orderBy("shard", "pos")
    }),

    // Mergeable equi-width histogram quantile sketch — the quantile member
    // of the CMS/HLL/Bloom family: per-(event_type, bin) counts merge by
    // SUM (commutative+associative → map-side partials do the work, the
    // shuffle carries |types|·|bins| cells at any corpus size), and the
    // p50/p90/p99 estimates read off the cumulative bins with error
    // bounded by one bin width. Target ranks are exact-integer ceil(p·n);
    // the bin pick is a min(struct) over qualifying bins; interpolation is
    // one terminal division (histEstExpr, shared with the oracle). The
    // exact-Percentiles operator answers the same question exactly at one
    // range shuffle of the DATA — this sketch answers it from constant
    // state, the profile-in-one-pass tradeoff.
    "q_sketch_quantile" -> ((s, dir) => {
      val ev = table(s, dir, "events").selectExpr("event_type",
        s"CAST(floor(value*100 + 0.5) AS BIGINT) div $HistBinW AS bin")
      val bins = ev.groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy("event_type").orderBy("bin")
      val wt = Window.partitionBy("event_type")
      val c = bins.withColumn("cum", sum("cnt").over(wc))
        .withColumn("n", sum("cnt").over(wt))
        .withColumn("cumb", col("cum") - col("cnt"))
      val aggs = HistPs.map { case (lbl, num, den) =>
        min(when(col("cum") >= expr(s"($num*n + ${den - 1}) div $den"),
          struct(col("bin"), col("cnt"), col("cumb"), col("n")))).as(s"m_$lbl")
      }
      val sel = c.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
      val ests = HistPs.map { case (lbl, num, den) =>
        expr(histEstExpr(s"m_$lbl.bin", s"m_$lbl.cnt",
          s"($num*m_$lbl.n + ${den - 1}) div $den", s"m_$lbl.cumb")).as(lbl)
      }
      sel.select(col("event_type") +: expr("m_q50.n").as("n") +: ests: _*)
        .orderBy("event_type")
    }),

    // Set-similarity self-join via PREFIX FILTERING (AllPairs/PPJoin) —
    // the LOSSLESS complement of the df-cap heuristic the LSH pipelines
    // use: order each doc's shingle set by global rarity (df asc, shingle
    // asc) and join only the first |s| − ceil(t·|s|) + 1 shingles. If
    // J(x,y) ≥ t then overlap ≥ ceil(t·|x|) (J ≥ t ⟹ |y| ≥ t·|x| ⟹
    // o ≥ t/(1+t)·(|x|+|y|) ≥ t·|x|), and an overlap that large cannot
    // avoid both prefixes (pigeonhole) — recall is GUARANTEED, no band
    // probability. Boilerplate never enters the join: high-df shingles
    // rank last and fall outside every prefix. Exact-dup collapse first
    // (reps) keeps true-duplicate clusters from re-creating the n² blowup
    // the prefix bound cannot prevent. Verify = exact integer Jaccard on
    // candidates only (9·inter ≥ 4·(sz1+sz2) — no float at the
    // threshold).
    "q_prefix_join" -> ((s, dir) =>
      // the factored [[prefixTruePairs]] chain (shared with
      // q_minhash_recall, which grades the LSH channel against it)
      prefixTruePairs(s, dir)
        .select(col("d1"), col("d2"), col("inter"), col("sz1"), col("sz2"),
          round(expr("CAST(inter AS DOUBLE) / CAST(sz1 + sz2 - inter AS DOUBLE)"), 4)
            .as("jac"))
        .orderBy("d1", "d2")),

    // Top-K bigrams per head word on the NATIVE TopKPerKey operator (the
    // n-gram language-model seed): adjacent token pairs from the SAME
    // split array the oracle sees, pair counts partial-agg'd map-side,
    // then the bounded-heap partial/final prune — ≤ k rows per head word
    // per map partition cross the one shuffle, never a per-head window
    // sort. The (cnt desc, w2 asc) ordering is total within a head, so
    // the native operator's row set equals the oracle's row_number
    // spelling exactly.
    "q_ngram_topk" -> ((s, dir) => {
      val counts = bigramPairs(s, dir)
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      graft.operators.TopK.perKey(counts, Seq("w1"),
        Seq(("cnt", false), ("w2", true)), NgramK)
        .orderBy("w1", "w2")
    }),

    // Grouped Bloom filter — one INDEPENDENT membership filter per
    // event_type in a single pass (bits keyed by (group, pos)), completing
    // the grouped-sketch symmetry with q_sketch_hll_grouped /
    // q_sketch_cms_grouped: the per-segment audience filter a router or
    // cache layer ships per partition. The distinct set-bit table is the
    // filter (union-mergeable); a disjoint probe set (key + 10⁶ — user
    // ids are far smaller) measures the REAL per-group FP rate, so every
    // probe hit is a measured false positive. Shuffles carry ≤
    // |groups|·m bits regardless of event volume.
    "q_sketch_bloom_grouped" -> ((s, dir) => {
      def posOf(c: String) =
        s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', CAST($c AS STRING))), 1, 8), 16, 10) AS BIGINT) % $BloomM"
      val members = table(s, dir, "events")
        .select(col("event_type"), col("user_id").as("key")).distinct()
      val bits = members
        .select(col("event_type"), col("key"),
          explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
        .select(col("event_type"), expr(posOf("key")).as("pos")).distinct()
      val probes = members
        .select(col("event_type"), (col("key") + 1000000L).as("pkey"))
      val probePos = probes
        .select(col("event_type"), col("pkey"),
          explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
        .select(col("event_type"), col("pkey"), expr(posOf("pkey")).as("pos"))
      val fp = probePos.join(bits, Seq("event_type", "pos"))
        .groupBy("event_type", "pkey").agg(count(lit(1)).as("hits"))
        .where(col("hits") === BloomK)
        .groupBy("event_type").agg(count(lit(1)).as("n_fp"))
      members.groupBy("event_type").agg(count(lit(1)).as("n_members"))
        .join(bits.groupBy("event_type").agg(count(lit(1)).as("n_bits")),
          Seq("event_type"))
        .join(fp, Seq("event_type"), "left_outer")
        .select(col("event_type"), col("n_members"), col("n_bits"),
          coalesce(col("n_fp"), lit(0L)).as("n_fp"),
          round(coalesce(col("n_fp"), lit(0L)) / col("n_members"), 6)
            .as("fp_rate"))
        .orderBy("event_type")
    }),

    // Hashing-trick featurizer (the bag-of-words → fixed-width sparse
    // vector ML front door): token → md5 bucket in [0, 64), per-doc
    // bucket counts in long (doc_id, bucket, cnt) shape — collisions are
    // the accepted tradeoff (the feature DIMENSION is corpus-independent,
    // no vocabulary build, no OOV). Narrow token map + one partial-agg'd
    // (doc, bucket) shuffle; linear at any corpus size.
    "q_feature_hash" -> ((s, dir) =>
      toks(s, dir)
        .select(col("doc_id"),
          expr(s"CAST(conv(substring(md5(word), 1, 8), 16, 10) AS BIGINT) % $FeatHashDim")
            .as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")),

    // Johnson-Lindenstrauss random projection — 64-dim embeddings mapped
    // to 8 dims through the SAME md5-seeded integer hyperplane matrix the
    // LSH bucketing uses (weights inlined as literals into both engines):
    // the distance-preserving dimensionality reducer feeding downstream
    // ANN/clustering at 1/8 the vector bytes. Quantized inputs × integer
    // weights keep every projected coordinate an exact BIGINT — no float
    // anywhere, partition-invariant. One narrow codegen'd map, zero
    // shuffles.
    "q_random_projection" -> ((s, dir) => {
      val dims = (0 until LshPlanes).map { p =>
        val arr = LshW(p).mkString("array(", "L, ", "L)")
        expr(s"ivec_dot(q, $arr)").as(s"d$p")
      }
      emb(s, dir).select(col("vec_id"), expr(QuantSpark).as("q"))
        .select(col("vec_id") +: dims: _*)
        .orderBy("vec_id")
    }),

    // Pointwise mutual information over adjacent-token pairs — the word
    // association score (collocation detection): PMI = ln(N·c12/(c1·c2))
    // where the marginals c1/c2 and N derive from the SAME pair-count
    // table (self-consistent, no tokenization drift). All counting is
    // exact integer partial-agg'd; ln is the one terminal float op
    // (rounded — same discipline as BM25's idf). Marginals broadcast
    // back; the min-count filter keeps only supported associations.
    "q_pmi" -> ((s, dir) => {
      val c = bigramPairs(s, dir)
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val lm = c.groupBy("w1").agg(sum(col("cnt")).as("c1"))
      val rm = c.groupBy("w2").agg(sum(col("cnt")).as("c2"))
      val nn = c.agg(sum(col("cnt")).as("nb"))
      c.where(col("cnt") >= PmiMinCount)
        .join(broadcast(lm), "w1").join(broadcast(rm), "w2")
        .crossJoin(broadcast(nn))
        .select(col("w1"), col("w2"), col("cnt"),
          round(expr(
            "ln(CAST(nb AS DOUBLE) * CAST(cnt AS DOUBLE) / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))"),
            6).as("pmi"))
        .orderBy("w1", "w2")
    })
  )

  // ---- sampling / scrubbing / packing constants (shared Spark + SQL) ----

  /** RE2-safe scrub patterns (no backrefs / lookaround): both Java regex
    * and DuckDB's RE2 interpret them identically. URL first (it may
    * contain @ and digits), then email, then long digit runs. */
  private val UrlRe = "https?://[A-Za-z0-9./_-]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DigitsRe = "[0-9]{6,}"

  /** Token budget per packed training row. */
  private val PackBudget = 512

  /** BM25 query terms: three common + one rare ("dup", df≈5% of docs) so
    * scores discriminate. */
  private[queries] val BmTerms = Seq("spark", "query", "vector", "dup")

  /** Shared BPE training chain (q_bpe_merges / q_bpe_apply): word counts →
    * char-split symbol sequences → 3 rounds of (weighted pair count →
    * deterministic argmax → broadcast literal merge). Returns the final
    * sequence table and the 3 chosen merges. One definition so train and
    * apply cannot drift. */
  private[queries] def bpeChain(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    // ckpt per round: each vocabulary state feeds BOTH the pair-count
    // argmax and the next merge — unmaterialized, the corpus tokenize
    // re-executes ~2× per round (plan audit: 19 Exchanges on the
    // fertility consumer before)
    import graft.operators.Ckpt._
    val wc0 = toks(s, dir).groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", concat(lit(" "),
        regexp_replace(col("word"), "(.)", "$1 ")))
      .ckpt()
    def top1(wc: DataFrame): DataFrame = wc
      .where(expr("size(split(trim(seq), ' ')) >= 2"))
      .select(col("cnt"), split(trim(col("seq")), " ").as("syms"))
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1)," +
          " i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("w"))
      .orderBy(desc("w"), asc("l"), asc("r")).limit(1)
    def merge(wc: DataFrame, t1: DataFrame): DataFrame = wc
      .crossJoin(broadcast(t1))
      .withColumn("seq", expr(
        "replace(seq, concat(' ', l, ' ', r, ' '), concat(' ', l, r, ' '))"))
      .select("word", "cnt", "seq")
      .ckpt()
    val t1 = top1(wc0); val wc1 = merge(wc0, t1)
    val t2 = top1(wc1); val wc2 = merge(wc1, t2)
    val t3 = top1(wc2); val wc3 = merge(wc2, t3)
    (wc3, Seq(t1, t2, t3))
  }

  /** Per-(doc, term) BM25 contribution (k1 = 1.2, b = 0.75), ONE string
    * parsed by BOTH engines (columns tf, df, dl, n_docs, sum_dl): spelling
    * the arithmetic once guarantees the identical IEEE evaluation order.
    * idf is pre-rounded to 8 decimals because ln() is not correctly-
    * rounded (q_tfidf note); every other op is exact-input +,-,*,/ —
    * correctly rounded, so bit-identical cross-engine. The final 6-decimal
    * round makes the contribution decimal-summable (order-free). */
  private[queries] val BmContribExpr: String =
    "round(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 8)" +
      " * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75" +
      " * (dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6)"

  // =========================================================================
  //  DuckDB oracles
  // =========================================================================

  private val ToksSql = Reference.ToksSql

  /** DuckDB replay of [[graft.operators.Winnow.selected]] at
    * ([[WinnowK]], [[WinnowW]]): ends in CTE `f` = (doc_id, i, wm, ng),
    * one row per full window. */
  private val WinnowSelSql: String =
    s"""xs AS (
       |  SELECT doc_id, text, length(text) - ${WinnowK - 1} AS ng,
       |    unnest(generate_series(1, length(text) - ${WinnowK - 1})) AS i
       |  FROM documents WHERE length(text) >= $WinnowK
       |),
       |g AS (
       |  SELECT doc_id, i, ng,
       |    ${hex2longSql(s"md5(substring(text, i, $WinnowK))", 1)} AS h
       |  FROM xs
       |),
       |wmw AS (
       |  SELECT doc_id, i, ng,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wm
       |  FROM g
       |),
       |f AS (SELECT doc_id, i, wm, ng FROM wmw WHERE i <= ng - ${WinnowW - 1})""".stripMargin

  /** Unrolled Lloyd replay (oracle twin of [[graft.operators.KMeans]] at
    * ([[KmK]], [[KmIters]])): c0 = init (k smallest ids), then per
    * iteration t: d_t (exact integer distances) → a_t (argmin, ties to
    * smaller cid) → c_t (fixed-point component update — the same
    * pure-integer round-half-up spelling as the operator: exactly-divisible
    * floor division, no DOUBLE on either engine). Ends with `af`
    * (final assignment: id, cid, d2) and `cm` (centroid md5 per cid). */
  private lazy val KmeansCtes: String = {
    val qvInit =
      s"""qv AS (
         |  SELECT vec_id AS id, i, 1000 * ${quantSqlElem("embedding[i]")} AS v
         |  FROM (SELECT vec_id, embedding,
         |               unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)
         |),
         |init AS (
         |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS cid
         |  FROM (SELECT DISTINCT id FROM qv ORDER BY id LIMIT $KmK)
         |),
         |c0 AS (SELECT init.cid, qv.i, qv.v AS c FROM init JOIN qv USING (id))""".stripMargin
    val steps = (1 to KmIters).map { t =>
      s"""d$t AS (
         |  SELECT qv.id, c.cid, sum((qv.v - c.c) * (qv.v - c.c)) AS d2
         |  FROM qv JOIN c${t - 1} c ON qv.i = c.i GROUP BY qv.id, c.cid
         |),
         |a$t AS (
         |  SELECT id, cid FROM (
         |    SELECT id, cid,
         |           row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
         |    FROM d$t) WHERE rn = 1
         |),
         |c$t AS (
         |  SELECT cid, i,
         |         CAST((2*s + n - ((((2*s + n) % (2*n)) + 2*n) % (2*n))) // (2*n) AS BIGINT) AS c
         |  FROM (SELECT a.cid, qv.i, sum(qv.v) AS s, count(*) AS n
         |        FROM a$t a JOIN qv USING (id) GROUP BY a.cid, qv.i)
         |)""".stripMargin
    }.mkString(",\n")
    s"""$qvInit,
       |$steps,
       |df AS (
       |  SELECT qv.id, c.cid, sum((qv.v - c.c) * (qv.v - c.c)) AS d2
       |  FROM qv JOIN c$KmIters c ON qv.i = c.i GROUP BY qv.id, c.cid
       |),
       |af AS (
       |  SELECT id, cid, d2 FROM (
       |    SELECT id, cid, d2,
       |           row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
       |    FROM df) WHERE rn = 1
       |),
       |cm AS (
       |  SELECT cid, md5(array_to_string(
       |    list_transform(list(c ORDER BY i), x -> CAST(x AS VARCHAR)), ',')) AS c_md5
       |  FROM c$KmIters GROUP BY cid
       |)""".stripMargin
  }

  /** Char-bigram LM replay (oracle twin of [[lmScores]]): ends in CTE
    * `scores` = (doc_id, n_bigrams, nll). */
  private val LmScoreCtes: String =
    """bg AS (
      |  SELECT doc_id, substr(text, i, 1) AS c1, substr(text, i, 2) AS bgm
      |  FROM (SELECT doc_id, text,
      |               unnest(generate_series(1, length(text) - 1)) AS i
      |        FROM documents WHERE length(text) >= 2)
      |),
      |bgc AS (SELECT bgm, count(*) AS bc FROM bg GROUP BY bgm),
      |c1c AS (SELECT c1, count(*) AS cc FROM bg GROUP BY c1),
      |t AS (
      |  SELECT bg.doc_id,
      |    CAST(round(ln(CAST(bc AS DOUBLE) / cc), 8) AS DECIMAL(28,10)) AS term
      |  FROM bg JOIN bgc USING (bgm) JOIN c1c USING (c1)
      |),
      |scores AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    round(-CAST(sum(term) AS DOUBLE) / count(*), 4) AS nll
      |  FROM t GROUP BY doc_id
      |)""".stripMargin

  private[queries] val MinhashSigSql: String = {
    val mins = (0 until H)
      .map(i => s"min((a + $i*b) % $Mod) AS h$i").mkString(",\n    ")
    s"""reps AS (
       |  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
       |),
       |sh AS (
       |  SELECT doc_id, substr(text, i, $K) AS sh
       |  FROM (SELECT doc_id, text,
       |               unnest(generate_series(1, length(text) - ${K - 1}, $Stride)) AS i
       |        FROM reps WHERE length(text) >= $K)
       |),
       |ab AS (
       |  SELECT doc_id, ${hex2longSql("md5(sh)", 1)} AS a,
       |         ${hex2longSql("md5(sh)", 9)} AS b
       |  FROM sh
       |),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM ab GROUP BY doc_id
       |)""".stripMargin
  }

  /** Oracle twin of [[verifiedDupIds]] (threshold 0.5); requires the
    * [[MinhashSigSql]] + [[BandsSql]] CTEs upstream. Defines CTEs
    * `pairs`, `sets`, `sz`, `neardups`, `exactdups`, `dropids`. */
  private lazy val NearDupsSql: String =
    """pairs AS (
      |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      |  FROM cbands x JOIN cbands y
      |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
      |),
      |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
      |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
      |neardups AS (
      |  SELECT DISTINCT p.d2 AS doc_id
      |  FROM pairs p
      |  JOIN (SELECT p2.d1, p2.d2, count(*) AS co
      |        FROM pairs p2
      |        JOIN sets a ON a.doc_id = p2.d1
      |        JOIN sets b ON b.doc_id = p2.d2 AND b.sh = a.sh
      |        GROUP BY p2.d1, p2.d2) co ON co.d1 = p.d1 AND co.d2 = p.d2
      |  JOIN sz sa ON sa.doc_id = p.d1
      |  JOIN sz sb ON sb.doc_id = p.d2
      |  WHERE CAST(co.co AS DOUBLE) / (sa.sz + sb.sz - co.co) >= 0.5
      |),
      |exactdups AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep
      |    FROM documents)
      |  WHERE doc_id <> keep
      |),
      |dropids AS (
      |  SELECT doc_id FROM neardups UNION SELECT doc_id FROM exactdups
      |)""".stripMargin

  /** One side of the q_delta_dedup oracle: doc slice → shingles → minhash
    * sig → band rows, all CTE names suffixed `_tag` (twin of the Spark
    * `shinglesOf` + `bandRowsFromShingles` pair over a bucket slice). */
  private def deltaSideSql(tag: String, pred: String): String = {
    val mins = (0 until H)
      .map(i => s"min((a + $i*b) % $Mod) AS h$i").mkString(",\n    ")
    val bandRows = (0 until Bands).map { b =>
      val v = (0 until R).map(r => s"CAST(h${b * R + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $v AS v FROM sig_$tag"
    }.mkString("\n  UNION ALL ")
    s"""d_$tag AS (SELECT doc_id, text FROM documents WHERE $pred),
       |sh_$tag AS (
       |  SELECT doc_id, substr(text, i, $K) AS sh
       |  FROM (SELECT doc_id, text,
       |               unnest(generate_series(1, length(text) - ${K - 1}, $Stride)) AS i
       |        FROM d_$tag WHERE length(text) >= $K)
       |),
       |ab_$tag AS (
       |  SELECT doc_id, ${hex2longSql("md5(sh)", 1)} AS a,
       |         ${hex2longSql("md5(sh)", 9)} AS b
       |  FROM sh_$tag
       |),
       |sig_$tag AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM ab_$tag GROUP BY doc_id
       |),
       |bands_$tag AS (
       |  $bandRows
       |)""".stripMargin
  }

  /** Band rows + the bucket-size cap: `cbands` is `bands` minus buckets
    * holding more than [[BandBucketCap]] docs (twin of the Spark-side
    * `smallBuckets` join in `minhashCandPairs`). */
  private[queries] val BandsSql: String =
    (0 until Bands).map { b =>
      val v = (0 until R).map(r => s"CAST(h${b * R + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $v AS v FROM sig"
    }.mkString("bands AS (\n  ", "\n  UNION ALL ", "\n)") +
      s""",
         |bsz AS (SELECT band, v, count(*) AS bn FROM bands GROUP BY band, v),
         |cbands AS (
         |  SELECT bands.doc_id, bands.band, bands.v
         |  FROM bands JOIN bsz USING (band, v) WHERE bsz.bn <= $BandBucketCap
         |)""".stripMargin

  val oracle: Map[String, String] = strictMap(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_dedup_url" ->
      """WITH raw AS (
        |  SELECT doc_id, concat(
        |    'HTTP://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
        |    source, '.Example.COM',
        |    CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END,
        |    '/p/', CAST(doc_id % 7 AS VARCHAR),
        |    CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 3 AS VARCHAR))
        |      WHEN 1 THEN concat('?id=', CAST(doc_id % 3 AS VARCHAR), '&utm_campaign=x')
        |      ELSE concat('?id=', CAST(doc_id % 3 AS VARCHAR)) END,
        |    CASE WHEN doc_id % 2 = 0 THEN '#Section-2' ELSE '' END) AS url
        |  FROM documents
        |),
        |u AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      replace(replace(lower(regexp_replace(url, '#.*$', '')),
        |              ':80/', '/'),
        |        '://www.', '://'),
        |      '/$', '') AS u1
        |  FROM raw
        |),
        |parts AS (
        |  SELECT doc_id, str_split(u1, '?')[1] AS base,
        |    COALESCE(str_split(u1, '?')[2], '') AS qq
        |  FROM u
        |),
        |canon AS (
        |  SELECT doc_id,
        |    concat(regexp_replace(base, '/$', ''),
        |      CASE WHEN q2 <> '' THEN concat('?', q2) ELSE '' END) AS canon
        |  FROM parts, LATERAL (
        |    SELECT array_to_string(
        |      list_sort(list_filter(str_split(qq, '&'),
        |                            p -> p NOT LIKE 'utm_%')), '&') AS q2)
        |)
        |SELECT canon, min(doc_id) AS keep_id, count(*) AS n
        |FROM canon GROUP BY 1
        |ORDER BY n DESC, canon LIMIT 20""".stripMargin,

    "q_curriculum" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN uniq * 10 >= words * 7 THEN 2
        |         WHEN uniq * 10 >= words * 4 THEN 1
        |         ELSE 0 END AS BIGINT) AS tier,
        |    md5('cur-' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM (SELECT doc_id,
        |          len(str_split(text, ' ')) AS words,
        |          len(list_distinct(str_split(text, ' '))) AS uniq
        |        FROM documents)
        |)
        |SELECT CAST(row_number() OVER (ORDER BY tier DESC, h, doc_id)
        |    AS BIGINT) AS pos,
        |  doc_id, tier
        |FROM scored ORDER BY tier DESC, h, doc_id LIMIT 50""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $MinhashSigSql,
         |$BandsSql,
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |)
         |SELECT d1, count(*) AS n_cand, min(d2) AS min_partner
         |FROM pairs GROUP BY d1 ORDER BY d1""".stripMargin,

    "q_dedup_minhash_verified" ->
      s"""WITH $MinhashSigSql,
         |$BandsSql,
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |),
         |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
         |co AS (
         |  SELECT p.d1, p.d2, count(*) AS co
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.d1
         |  JOIN sets b ON b.doc_id = p.d2 AND b.sh = a.sh
         |  GROUP BY p.d1, p.d2
         |)
         |SELECT p.d1, p.d2,
         |  round(CAST(coalesce(co.co, 0) AS DOUBLE)
         |        / (sa.sz + sb.sz - coalesce(co.co, 0)), 4) AS jac
         |FROM pairs p
         |LEFT JOIN co ON co.d1 = p.d1 AND co.d2 = p.d2
         |JOIN sz sa ON sa.doc_id = p.d1
         |JOIN sz sb ON sb.doc_id = p.d2
         |ORDER BY p.d1, p.d2""".stripMargin,

    "q_dedup_containment" ->
      s"""WITH $MinhashSigSql,
         |$BandsSql,
         |bpairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |),
         |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
         |samp AS (
         |  SELECT doc_id, sh FROM sets
         |  WHERE ${hex2longSql("md5(sh)", 1)} % $ContainSampleMod = 0
         |),
         |srare AS (SELECT sh FROM samp GROUP BY sh
         |          HAVING count(*) BETWEEN 2 AND $BandBucketCap),
         |spairs AS (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2
         |  FROM samp x JOIN srare USING (sh) JOIN samp y USING (sh)
         |  WHERE x.doc_id < y.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $ContainCoMin
         |),
         |pairs AS (SELECT d1, d2 FROM bpairs UNION SELECT d1, d2 FROM spairs),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
         |co AS (
         |  SELECT p.d1, p.d2, count(*) AS co
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.d1
         |  JOIN sets b ON b.doc_id = p.d2 AND b.sh = a.sh
         |  GROUP BY p.d1, p.d2
         |)
         |SELECT p.d1, p.d2,
         |  round(CAST(coalesce(co.co, 0) AS DOUBLE)
         |        / least(sa.sz, sb.sz), 4) AS containment
         |FROM pairs p
         |LEFT JOIN co ON co.d1 = p.d1 AND co.d2 = p.d2
         |JOIN sz sa ON sa.doc_id = p.d1
         |JOIN sz sb ON sb.doc_id = p.d2
         |WHERE CAST(coalesce(co.co, 0) AS DOUBLE) / least(sa.sz, sb.sz) >= 0.5
         |ORDER BY p.d1, p.d2""".stripMargin,

    "q_dedup_apply" ->
      s"""WITH $MinhashSigSql,
         |$BandsSql,
         |$NearDupsSql
         |SELECT count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropids)""".stripMargin,

    // Recursive-CTE fixpoint (a different algorithm than the Spark side's
    // label propagation): reach(v, l) holds every (vertex, label-that-
    // reaches-it); min per vertex = component min id. UNION dedup
    // guarantees termination.
    "q_dedup_components" ->
      s"""WITH RECURSIVE $MinhashSigSql,
         |$BandsSql,
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |),
         |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
         |vp AS (
         |  SELECT p.d1, p.d2
         |  FROM pairs p
         |  JOIN (SELECT p2.d1, p2.d2, count(*) AS co
         |        FROM pairs p2
         |        JOIN sets a ON a.doc_id = p2.d1
         |        JOIN sets b ON b.doc_id = p2.d2 AND b.sh = a.sh
         |        GROUP BY p2.d1, p2.d2) co ON co.d1 = p.d1 AND co.d2 = p.d2
         |  JOIN sz sa ON sa.doc_id = p.d1
         |  JOIN sz sb ON sb.doc_id = p.d2
         |  WHERE CAST(co.co AS DOUBLE) / (sa.sz + sb.sz - co.co) >= 0.5
         |),
         |edges AS (SELECT d1 AS a, d2 AS b FROM vp
         |          UNION ALL SELECT d2 AS a, d1 AS b FROM vp),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach AS (
         |  SELECT v, v AS l FROM verts
         |  UNION
         |  SELECT e.b AS v, r.l FROM reach r JOIN edges e ON e.a = r.v
         |),
         |comp AS (SELECT v, min(l) AS comp_id FROM reach GROUP BY v)
         |SELECT comp_id, count(*) AS n_members, max(v) AS max_id
         |FROM comp GROUP BY comp_id ORDER BY comp_id""".stripMargin,

    // Same recursive-CTE components, + the keep-best argmax: longest
    // member, smallest doc_id on equal length.
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $MinhashSigSql,
         |$BandsSql,
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM cbands x JOIN cbands y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |),
         |sets AS (SELECT DISTINCT doc_id, sh FROM sh),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
         |vp AS (
         |  SELECT p.d1, p.d2
         |  FROM pairs p
         |  JOIN (SELECT p2.d1, p2.d2, count(*) AS co
         |        FROM pairs p2
         |        JOIN sets a ON a.doc_id = p2.d1
         |        JOIN sets b ON b.doc_id = p2.d2 AND b.sh = a.sh
         |        GROUP BY p2.d1, p2.d2) co ON co.d1 = p.d1 AND co.d2 = p.d2
         |  JOIN sz sa ON sa.doc_id = p.d1
         |  JOIN sz sb ON sb.doc_id = p.d2
         |  WHERE CAST(co.co AS DOUBLE) / (sa.sz + sb.sz - co.co) >= 0.5
         |),
         |edges AS (SELECT d1 AS a, d2 AS b FROM vp
         |          UNION ALL SELECT d2 AS a, d1 AS b FROM vp),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach AS (
         |  SELECT v, v AS l FROM verts
         |  UNION
         |  SELECT e.b AS v, r.l FROM reach r JOIN edges e ON e.a = r.v
         |),
         |comp AS (SELECT v, min(l) AS comp_id FROM reach GROUP BY v),
         |m AS (SELECT c.comp_id, c.v, d.n_chars
         |      FROM comp c JOIN documents d ON d.doc_id = c.v),
         |mc AS (SELECT comp_id, max(n_chars) AS mx FROM m GROUP BY comp_id)
         |SELECT m.comp_id, count(*) AS n_members,
         |  min(CASE WHEN m.n_chars = mc.mx THEN m.v END) AS keep_id,
         |  CAST(max(mc.mx) AS BIGINT) AS keep_chars
         |FROM m JOIN mc ON mc.comp_id = m.comp_id
         |GROUP BY m.comp_id ORDER BY m.comp_id""".stripMargin,

    "q_dedup_simhash" -> {
      val sums = (0 until 16).map(j =>
        s"sum(CASE WHEN CAST(floor(a / ${1L << j}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(",\n    ")
      val bits = (0 until 16).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH $ToksSql,
         |a AS (SELECT doc_id, ${hex2longSql("md5(word)", 1)} AS a FROM toks),
         |sums AS (
         |  SELECT doc_id,
         |    $sums
         |  FROM a GROUP BY doc_id
         |)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
         |FROM sums ORDER BY doc_id""".stripMargin
    },

    "q_dedup_simhash_pairs" -> {
      val sums = (0 until 32).map(j =>
        s"sum(CASE WHEN CAST(floor(a / ${1L << j}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(",\n    ")
      val bits = (0 until 32).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      val bandRows = (0 until SimBands).map(b =>
        s"SELECT doc_id, $b AS band, CAST(floor(sim / ${1L << (SimBandBits * b)}) AS BIGINT) % ${1 << SimBandBits} AS v FROM sig")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $ToksSql,
         |a AS (SELECT doc_id, ${hex2longSql("md5(word)", 1)} AS a FROM toks),
         |sums AS (SELECT doc_id,
         |    $sums
         |  FROM a GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS sim FROM sums),
         |bands AS (
         |  $bandRows
         |),
         |small AS (SELECT band, v FROM bands GROUP BY band, v
         |          HAVING count(*) <= $BandBucketCap),
         |capped AS (SELECT bands.* FROM bands JOIN small USING (band, v)),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM capped x JOIN capped y
         |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |)
         |SELECT d1, d2, CAST(bit_count(xor(s1.sim, s2.sim)) AS BIGINT) AS ham
         |FROM pairs
         |JOIN sig s1 ON pairs.d1 = s1.doc_id
         |JOIN sig s2 ON pairs.d2 = s2.doc_id
         |WHERE bit_count(xor(s1.sim, s2.sim)) <= $SimHamThr
         |ORDER BY d1, d2""".stripMargin
    },

    "q_span_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' ') AS ws
         |  FROM documents
         |),
         |tt AS (SELECT * FROM t WHERE len(ws) >= $SpanW),
         |spans AS (
         |  SELECT doc_id,
         |    md5(array_to_string(ws[i:i+${SpanW - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, ws,
         |               unnest(generate_series(1, len(ws)-${SpanW - 1})) AS i
         |        FROM tt)
         |),
         |dfq AS (SELECT h, count(*) AS dfreq
         |        FROM (SELECT DISTINCT doc_id, h FROM spans) GROUP BY h)
         |SELECT doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  round(CAST(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE), 4) AS dup_frac
         |FROM spans JOIN dfq USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_delta_dedup" ->
      s"""WITH ${deltaSideSql("b", s"$hashBucketSql < 90")},
         |${deltaSideSql("d", s"$hashBucketSql >= 90")},
         |small AS (SELECT band, v FROM bands_b GROUP BY band, v
         |          HAVING count(*) <= $BandBucketCap),
         |cand AS (
         |  SELECT DISTINCT dd.doc_id AS delta_id, bb.doc_id AS base_id
         |  FROM bands_d dd
         |  JOIN (SELECT bands_b.* FROM bands_b JOIN small USING (band, v)) bb
         |    ON dd.band = bb.band AND dd.v = bb.v
         |),
         |bsets AS (SELECT DISTINCT doc_id, sh FROM sh_b),
         |dsets AS (SELECT DISTINCT doc_id, sh FROM sh_d),
         |bsz AS (SELECT doc_id, count(*) AS szb FROM bsets GROUP BY doc_id),
         |dsz AS (SELECT doc_id, count(*) AS szd FROM dsets GROUP BY doc_id),
         |co AS (
         |  SELECT c.delta_id, c.base_id, count(*) AS co
         |  FROM cand c
         |  JOIN dsets a ON a.doc_id = c.delta_id
         |  JOIN bsets b2 ON b2.doc_id = c.base_id AND b2.sh = a.sh
         |  GROUP BY 1, 2
         |)
         |SELECT c.delta_id, c.base_id,
         |  round(CAST(coalesce(co.co, 0) AS DOUBLE)
         |        / (dsz.szd + bsz.szb - coalesce(co.co, 0)), 4) AS jac
         |FROM cand c
         |LEFT JOIN co ON co.delta_id = c.delta_id AND co.base_id = c.base_id
         |JOIN dsz ON dsz.doc_id = c.delta_id
         |JOIN bsz ON bsz.doc_id = c.base_id
         |WHERE CAST(coalesce(co.co, 0) AS DOUBLE)
         |      / (dsz.szd + bsz.szb - coalesce(co.co, 0)) >= $DeltaJacThr
         |ORDER BY c.delta_id, c.base_id""".stripMargin,

    "q_dedup_ngram" ->
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
         |tdf AS (SELECT source, sh, count(*) AS dfreq FROM tri GROUP BY source, sh),
         |trif AS (
         |  SELECT tri.doc_id, tri.source, tri.sh
         |  FROM tri JOIN tdf USING (source, sh) WHERE tdf.dfreq <= $NgramDfCap
         |),
         |sz AS (SELECT doc_id, count(*) AS sz FROM trif GROUP BY doc_id),
         |co AS (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS co
         |  FROM trif x JOIN trif y
         |    ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2
         |),
         |j AS (
         |  SELECT d1, d2, CAST(co AS DOUBLE) / (sa.sz + sb.sz - co) AS jac
         |  FROM co JOIN sz sa ON co.d1 = sa.doc_id JOIN sz sb ON co.d2 = sb.doc_id
         |)
         |SELECT d1, count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN jac >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_sim,
         |  max(round(jac, 4)) AS max_jac
         |FROM j GROUP BY d1 ORDER BY d1""".stripMargin,

    "q_dedup_agreement" ->
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
         |tdf AS (SELECT source, sh, count(*) AS dfreq FROM tri GROUP BY source, sh),
         |trif AS (
         |  SELECT tri.doc_id, tri.source, tri.sh
         |  FROM tri JOIN tdf USING (source, sh) WHERE tdf.dfreq <= $NgramDfCap
         |),
         |sz AS (SELECT doc_id, count(*) AS sz FROM trif GROUP BY doc_id),
         |lex AS (
         |  SELECT d1, d2 FROM (
         |    SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS cnt
         |    FROM trif x JOIN trif y
         |      ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
         |    GROUP BY 1, 2
         |  ) co JOIN sz sa ON co.d1 = sa.doc_id JOIN sz sb ON co.d2 = sb.doc_id
         |  WHERE CAST(cnt AS DOUBLE) / (sa.sz + sb.sz - cnt) >= 0.2
         |),
         |$QuantizedNormSql,
         |qv AS (SELECT e.vec_id, e.label, e.embedding, qn.nq
         |       FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |       WHERE qn.nq > 0),
         |p AS (
         |  SELECT a.vec_id AS d1, b.vec_id AS d2, a.embedding AS ea,
         |         b.embedding AS eb, a.nq AS na, b.nq AS nb
         |  FROM qv a JOIN qv b ON a.label = b.label AND a.vec_id < b.vec_id
         |),
         |dd AS (
         |  SELECT d1, d2, na, nb,
         |    CAST(sum(${quantSqlElem("ea[i]")} * ${quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(ea))) AS i FROM p)
         |  GROUP BY d1, d2, na, nb
         |),
         |sem AS (SELECT d1, d2 FROM dd WHERE $CosExpr >= 0.7),
         |b2 AS (SELECT count(*) AS n_both FROM lex JOIN sem USING (d1, d2))
         |SELECT (SELECT count(*) FROM lex) AS n_lex,
         |  (SELECT count(*) FROM sem) AS n_sem,
         |  n_both,
         |  round(CAST(n_both AS DOUBLE) /
         |    ((SELECT count(*) FROM lex) + (SELECT count(*) FROM sem) - n_both), 6)
         |    AS agreement
         |FROM b2""".stripMargin,

    "q_dedup_embcos" ->
      s"""WITH $QuantizedNormSql,
         |$lshBucketSql,
         |sel AS (SELECT e.vec_id, e.embedding, qn.nq, b.bucket
         |        FROM embeddings e
         |        JOIN qn ON e.vec_id = qn.vec_id
         |        JOIN buckets b ON e.vec_id = b.vec_id
         |        WHERE qn.nq > 0),
         |ok AS (SELECT bucket FROM sel
         |       GROUP BY bucket HAVING count(*) <= $BandBucketCap),
         |sb AS (SELECT sel.* FROM sel JOIN ok USING (bucket)),
         |p AS (
         |  SELECT x.vec_id AS d1, y.vec_id AS d2, x.nq AS na, y.nq AS nb,
         |         x.embedding AS ea, y.embedding AS eb
         |  FROM sb x JOIN sb y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |),
         |d AS (
         |  SELECT d1, d2, na, nb,
         |    CAST(sum(${quantSqlElem("ea[i]")} * ${quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(ea))) AS i FROM p)
         |  GROUP BY d1, d2, na, nb
         |),
         |c AS (SELECT d1, d2, $CosExpr AS cos FROM d)
         |SELECT d1, count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN cos >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_sim,
         |  max(round(cos, 4)) AS max_cos
         |FROM c GROUP BY d1 ORDER BY d1""".stripMargin,

    "q_ann_topk" ->
      s"""WITH $QuantizedNormSql,
         |qs AS (SELECT e.vec_id AS q_id, e.embedding AS eq, qn.nq AS na
         |       FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |       WHERE qn.nq > 0
         |       ORDER BY qn.nq DESC, e.vec_id LIMIT $AnnQueryK),
         |cand AS (SELECT e.vec_id AS cand_id, e.embedding AS ec, qn.nq AS nb
         |         FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |         WHERE qn.nq > 0),
         |p AS (SELECT q_id, cand_id, na, nb, eq, ec
         |      FROM qs JOIN cand ON q_id <> cand_id),
         |d AS (
         |  SELECT q_id, cand_id, na, nb,
         |    CAST(sum(${quantSqlElem("eq[i]")} * ${quantSqlElem("ec[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(eq))) AS i FROM p)
         |  GROUP BY q_id, cand_id, na, nb
         |),
         |c AS (SELECT q_id, cand_id, $CosExpr AS cos FROM d),
         |r AS (
         |  SELECT q_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
         |  FROM c
         |)
         |SELECT q_id, rank, cand_id, round(cos, 4) AS cos
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH $QuantizedNormSql,
         |$AnnQidsSql,
         |qs AS (SELECT e.vec_id AS q_id, e.label AS q_label,
         |              e.embedding AS eq, qn.nq AS na
         |       FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |       WHERE qn.nq > 0
         |         AND e.vec_id IN (SELECT vec_id FROM qids)),
         |cand AS (SELECT e.vec_id AS cand_id, e.label, e.embedding AS ec,
         |                qn.nq AS nb
         |         FROM embeddings e JOIN qn ON e.vec_id = qn.vec_id
         |         WHERE qn.nq > 0),
         |p AS (SELECT q_id, cand_id, na, nb, eq, ec
         |      FROM qs JOIN cand ON q_id <> cand_id AND q_label <> label),
         |d AS (
         |  SELECT q_id, cand_id, na, nb,
         |    CAST(sum(${quantSqlElem("eq[i]")} * ${quantSqlElem("ec[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(eq))) AS i FROM p)
         |  GROUP BY q_id, cand_id, na, nb
         |),
         |c AS (SELECT q_id, cand_id, $CosExpr AS cos FROM d),
         |r AS (
         |  SELECT q_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
         |  FROM c
         |)
         |SELECT q_id, rank, cand_id, round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_inverted_index" ->
      s"""WITH $ToksSql,
         |tf AS (SELECT word, doc_id, count(*) AS tf FROM toks
         |       GROUP BY word, doc_id),
         |d AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         |h AS (
         |  SELECT word, doc_id, tf,
         |    row_number() OVER (PARTITION BY word ORDER BY tf DESC, doc_id) AS rn
         |  FROM tf
         |),
         |p AS (
         |  SELECT word,
         |    string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
         |               ',' ORDER BY tf DESC, doc_id) AS postings
         |  FROM h WHERE rn <= 5 GROUP BY word
         |)
         |SELECT d.word, d.df, p.postings FROM d JOIN p USING (word)
         |WHERE d.df >= $InvIdxMinDf ORDER BY word""".stripMargin,

    "q_tfidf" ->
      s"""WITH $ToksSql,
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
         |SELECT doc_id, word, tf, df,
         |  round(tf * round(ln((n_docs + 1.0) / (df + 1.0)), 8), 4) AS tfidf
         |FROM tf JOIN dfreq USING (word) CROSS JOIN n
         |ORDER BY doc_id, word""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH $QuantizedNormSql,
         |$AnnQidsSql,
         |pe AS (
         |  SELECT vec_id, label, i AS pos, ${quantSqlElem("embedding[i]")} AS qv
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
         |    CAST(sum((pe.qv * c.n - c.s) * (pe.qv * c.n - c.s)) AS BIGINT) AS dist_num,
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
         |p AS (
         |  SELECT b.q_id, s.vec_id AS cand_id, eq.embedding AS eqv,
         |         s.embedding AS ecv, eqn.nq AS na, s.nq AS nb
         |  FROM best b
         |  JOIN embeddings eq ON eq.vec_id = b.q_id
         |  JOIN qn eqn ON eqn.vec_id = b.q_id
         |  JOIN sel s ON s.label = b.label AND s.vec_id <> b.q_id
         |),
         |d AS (
         |  SELECT q_id, cand_id, na, nb,
         |    CAST(sum(${quantSqlElem("eqv[i]")} * ${quantSqlElem("ecv[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(eqv))) AS i FROM p)
         |  GROUP BY q_id, cand_id, na, nb
         |),
         |c AS (SELECT q_id, cand_id, $CosExpr AS cos FROM d),
         |r AS (
         |  SELECT q_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
         |  FROM c
         |)
         |SELECT q_id, rank, cand_id, round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_ann_pq" ->
      s"""WITH comp AS (
         |  SELECT vec_id, label,
         |    CAST((i-1) // $PqD AS BIGINT) AS m, (i-1) % $PqD AS d, q AS qv
         |  FROM (SELECT vec_id, label, i, ${quantSqlElem("embedding[i]")} AS q
         |        FROM (SELECT vec_id, label, embedding,
         |                     unnest(generate_series(1, len(embedding))) AS i
         |              FROM embeddings))
         |),
         |nz AS (SELECT vec_id FROM comp GROUP BY vec_id HAVING sum(qv*qv) > 0),
         |qids AS (SELECT vec_id FROM comp GROUP BY vec_id
         |         HAVING sum(qv*qv) > 0
         |         ORDER BY CAST(sum(qv*qv) AS BIGINT) DESC, vec_id
         |         LIMIT $AnnQueryK),
         |compz AS (SELECT comp.* FROM comp JOIN nz USING (vec_id)),
         |cb AS (
         |  SELECT label AS clabel, m, d, CAST(sum(qv) AS BIGINT) AS s,
         |         count(*) AS n
         |  FROM compz GROUP BY 1, 2, 3
         |),
         |a1 AS (
         |  SELECT c.vec_id, c.m, cb.clabel,
         |    CAST(sum((c.qv * cb.n - cb.s) * (c.qv * cb.n - cb.s)) AS BIGINT) AS dn,
         |    max(cb.n) AS cn
         |  FROM compz c JOIN cb ON c.m = cb.m AND c.d = cb.d
         |  GROUP BY 1, 2, 3
         |),
         |assign AS (
         |  SELECT vec_id AS cand_id, m, clabel AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY CAST(dn AS DOUBLE) / (cn * cn), clabel) AS rn FROM a1)
         |  WHERE rn = 1
         |),
         |a2 AS (
         |  SELECT c.vec_id AS q_id, c.m, cb.clabel AS code,
         |    CAST(sum(c.qv * cb.s) AS BIGINT) AS dotnum, max(cb.n) AS n
         |  FROM compz c JOIN cb ON c.m = cb.m AND c.d = cb.d
         |  WHERE c.vec_id IN (SELECT vec_id FROM qids)
         |  GROUP BY 1, 2, 3
         |),
         |adc AS (
         |  SELECT q_id, m, code,
         |    CAST(round(CAST(dotnum AS DOUBLE) / n, 6) AS DECIMAL(24,6)) AS term
         |  FROM a2
         |),
         |sc AS (
         |  SELECT q_id, cand_id, sum(term) AS adc_exact
         |  FROM assign JOIN adc USING (m, code)
         |  WHERE cand_id <> q_id
         |  GROUP BY 1, 2
         |),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adc_exact DESC, cand_id) AS rank
         |  FROM sc
         |)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, cand_id,
         |  round(CAST(adc_exact AS DOUBLE), 4) AS adc
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH $QuantizedNormSql,
         |$AnnQidsSql,
         |$lshBucketSql,
         |sel AS (SELECT e.vec_id, e.embedding, qn.nq, b.bucket
         |        FROM embeddings e
         |        JOIN qn ON e.vec_id = qn.vec_id
         |        JOIN buckets b ON e.vec_id = b.vec_id
         |        WHERE qn.nq > 0),
         |p AS (
         |  SELECT q.vec_id AS q_id, q.bucket, s.vec_id AS cand_id,
         |         q.embedding AS eqv, s.embedding AS ecv,
         |         q.nq AS na, s.nq AS nb
         |  FROM sel q JOIN sel s
         |    ON q.bucket = s.bucket AND s.vec_id <> q.vec_id
         |  WHERE q.vec_id IN (SELECT vec_id FROM qids)
         |),
         |d AS (
         |  SELECT q_id, bucket, cand_id, na, nb,
         |    CAST(sum(${quantSqlElem("eqv[i]")} * ${quantSqlElem("ecv[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(eqv))) AS i FROM p)
         |  GROUP BY q_id, bucket, cand_id, na, nb
         |),
         |c AS (SELECT q_id, bucket, cand_id, $CosExpr AS cos FROM d),
         |r AS (
         |  SELECT q_id, bucket, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
         |  FROM c
         |)
         |SELECT q_id, bucket, rank, cand_id, round(cos, 4) AS cos
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Recomputes the planted-image features from the construction rule
    // (dims = 8 + doc_id % 25/17, pixel = (x·31 + y·17 + doc_id·13) % 256)
    // — the Spark side went text→PNG→decode through the real codec.
    "q_phash_dedup" ->
      s"""WITH g AS (
         |  SELECT doc_id, CAST(8 + doc_id % 25 AS INT) AS w,
         |         CAST(8 + doc_id % 17 AS INT) AS h
         |  FROM documents
         |),
         |samp AS (
         |  SELECT doc_id, i,
         |    ((((i % 8) * w // 8) * 31 + ((i // 8) * h // 8) * 17
         |      + doc_id * 13) % 256) AS px
         |  FROM g, unnest(generate_series(0, 63)) AS t(i)
         |),
         |m AS (SELECT doc_id, CAST(sum(px) // 64 AS BIGINT) AS mean
         |      FROM samp GROUP BY doc_id),
         |hs AS (
         |  SELECT samp.doc_id,
         |    CAST(sum(CASE WHEN px <= mean THEN 0
         |      WHEN i = 63 THEN -9223372036854775808
         |      ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END)
         |      AS BIGINT) AS ahash
         |  FROM samp JOIN m USING (doc_id) GROUP BY samp.doc_id
         |),
         |bands AS (
         |  SELECT doc_id, ahash, b,
         |    (ahash >> CAST(8 * b AS INT)) & 255 AS bv
         |  FROM hs, unnest(generate_series(0, 7)) AS t(b)
         |),
         |keep AS (SELECT b, bv FROM bands GROUP BY b, bv
         |         HAVING count(*) <= $BandBucketCap),
         |bk AS (SELECT bands.* FROM bands JOIN keep USING (b, bv)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
         |    x.ahash AS h1, y.ahash AS h2
         |  FROM bk x JOIN bk y USING (b, bv) WHERE x.doc_id < y.doc_id
         |)
         |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS ham
         |FROM cand WHERE bit_count(xor(h1, h2)) <= 7
         |ORDER BY d1, d2""".stripMargin,

    "q_multimodal_decode" ->
      """WITH xs AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS INT) AS width,
        |    CAST(8 + doc_id % 17 AS INT) AS height,
        |    unnest(generate_series(0, 8 + doc_id % 25 - 1)) AS x
        |  FROM documents
        |),
        |px AS (
        |  SELECT doc_id, width, height, x,
        |    unnest(generate_series(0, height - 1)) AS y
        |  FROM xs
        |)
        |SELECT doc_id, width, height,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum((x*31 + y*17 + doc_id*13) % 256) AS BIGINT) AS px_sum,
        |  CAST(min((x*31 + y*17 + doc_id*13) % 256) AS INT) AS px_min,
        |  CAST(max((x*31 + y*17 + doc_id*13) % 256) AS INT) AS px_max
        |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,

    // Sampled positions recomputed from the rule: out(x,y) = in(2x,2y),
    // output dims ceil(w/2) × ceil(h/2).
    "q_multimodal_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS INT) AS w,
        |    CAST(8 + doc_id % 17 AS INT) AS h
        |  FROM documents
        |),
        |xs AS (
        |  SELECT doc_id, w, h,
        |    CAST((w + 1) // 2 AS INT) AS rw, CAST((h + 1) // 2 AS INT) AS rh,
        |    unnest(generate_series(0, (w + 1) // 2 - 1)) AS x
        |  FROM dims
        |),
        |px AS (
        |  SELECT doc_id, rw, rh, x, unnest(generate_series(0, rh - 1)) AS y
        |  FROM xs
        |)
        |SELECT doc_id, rw, rh,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum((x*2*31 + y*2*17 + doc_id*13) % 256) AS BIGINT) AS px_sum,
        |  CAST(min((x*2*31 + y*2*17 + doc_id*13) % 256) AS INT) AS px_min,
        |  CAST(max((x*2*31 + y*2*17 + doc_id*13) % 256) AS INT) AS px_max
        |FROM px GROUP BY doc_id, rw, rh ORDER BY doc_id""".stripMargin,

    // Every 2nd frame of the 4..8-frame clip, pixel rule replayed per
    // sampled index.
    "q_multimodal_frames" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS INT) AS w,
        |    CAST(8 + doc_id % 17 AS INT) AS h,
        |    CAST(4 + doc_id % 5 AS INT) AS frames
        |  FROM documents
        |),
        |fr AS (SELECT doc_id, w, h,
        |         unnest(generate_series(0, frames - 1, 2)) AS f
        |       FROM base),
        |xs AS (SELECT doc_id, w, h, f,
        |         unnest(generate_series(0, w - 1)) AS x
        |       FROM fr),
        |px AS (SELECT doc_id, f, x,
        |         unnest(generate_series(0, h - 1)) AS y
        |       FROM xs)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum((x*31 + y*17 + doc_id*13 + f*7) % 256) AS BIGINT) AS f_sum
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame""".stripMargin,

    // The inflate round-trip must recover the text's UTF-8 bytes exactly:
    // length and md5 both computed from the SOURCE here, from the
    // recovered bytes on the Spark side.
    "q_multimodal_inflate" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replays the PCM construction rule (samples are non-negative doc_id
    // and index, so plain % matches floorMod)
    "q_multimodal_audio" ->
      """WITH n AS (
        |  SELECT doc_id, 400 + (doc_id % 5) * 80 AS n FROM documents
        |),
        |s AS (
        |  SELECT doc_id, ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
        |  FROM n, unnest(generate_series(0, n - 1)) AS t(i)
        |)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  count(*) AS n_samples,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(v)) AS BIGINT) AS max_abs
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_pipeline_prep" -> {
      val scores = Stops.map { case (lang, words) =>
        s"CAST(sum(CASE WHEN word IN ${inList(words)} THEN 1 ELSE 0 END) AS BIGINT) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH $ToksSql,
         |sc AS (
         |  SELECT doc_id, count(*) AS n_tok,
         |    $scores
         |  FROM toks GROUP BY doc_id
         |),
         |scp AS (SELECT doc_id, n_tok, $PredCase AS pred FROM sc),
         |$MinhashSigSql,
         |$BandsSql,
         |$NearDupsSql
         |SELECT count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(d.doc_id) AS min_id, max(d.doc_id) AS max_id
         |FROM documents d
         |JOIN scp ON d.doc_id = scp.doc_id
         |WHERE scp.n_tok >= 20 AND scp.pred = 'en'
         |  AND d.doc_id NOT IN (SELECT doc_id FROM dropids)""".stripMargin
    },

    "q_pipeline_assemble" -> {
      val wVals = MixWeights.map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      s"""WITH $ToksSql,
         |ntok AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
         |$MinhashSigSql,
         |$BandsSql,
         |$NearDupsSql,
         |kept AS (
         |  SELECT d.doc_id, d.lang, ntok.n_tok
         |  FROM documents d JOIN ntok ON d.doc_id = ntok.doc_id
         |  WHERE ntok.n_tok >= 20
         |    AND d.doc_id NOT IN (SELECT doc_id FROM dropids)
         |),
         |w(lang, w) AS (VALUES $wVals),
         |counts AS (SELECT lang, count(*) AS n FROM kept GROUP BY lang),
         |u AS (SELECT min(n // w) AS u FROM counts JOIN w USING (lang)),
         |mr AS (SELECT kept.*,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |       FROM kept),
         |mixed AS (
         |  SELECT mr.doc_id, mr.n_tok FROM mr JOIN w USING (lang) CROSS JOIN u
         |  WHERE mr.rk <= w.w * u.u
         |),
         |shx AS (
         |  SELECT doc_id, n_tok, ($hashBucketSql) % 8 AS shard,
         |    md5('ord' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM mixed
         |),
         |pos AS (
         |  SELECT doc_id, n_tok, shard,
         |    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
         |  FROM shx
         |),
         |packed AS (
         |  SELECT shard, doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM pos
         |)
         |SELECT shard, CAST(floor((cum - n_tok) / $PackBudget.0) AS BIGINT) AS bin,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM packed GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin
    },

    "q_lang_id" -> {
      val scores = Stops.map { case (lang, words) =>
        s"CAST(sum(CASE WHEN word IN ${inList(words)} THEN 1 ELSE 0 END) AS BIGINT) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH $ToksSql,
         |sc AS (
         |  SELECT doc_id,
         |    $scores
         |  FROM toks GROUP BY doc_id
         |)
         |SELECT doc_id, s_en, s_fr, s_de, s_es,
         |  $PredCase AS pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q_lang_ngram" -> {
      val scores = Bigrams.map { case (lang, pat) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS s_$lang"
      }.mkString(",\n    ")
      s"""WITH sc AS (
         |  SELECT doc_id,
         |    $scores
         |  FROM documents
         |)
         |SELECT doc_id, s_en, s_fr, s_de, s_es, $PredCase AS pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q_quality" -> {
      val en = inList(Stops.head._2)
      s"""WITH $ToksSql,
         |st AS (
         |  SELECT doc_id, count(*) AS n_tok,
         |    CAST(sum(length(word)) AS BIGINT) AS sum_len,
         |    CAST(sum(CASE WHEN word IN $en THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         |  FROM toks GROUP BY doc_id
         |),
         |m AS (
         |  SELECT d.doc_id, st.n_tok,
         |    round(CAST(sum_len AS DOUBLE) / n_tok, 4) AS avg_len,
         |    round(CAST(n_stop AS DOUBLE) / n_tok, 4) AS stop_ratio,
         |    round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
         |          / greatest(length(text), 1), 4) AS digit_ratio
         |  FROM documents d JOIN st ON d.doc_id = st.doc_id
         |)
         |SELECT doc_id, n_tok, avg_len, stop_ratio, digit_ratio,
         |  round(least(CAST(n_tok AS DOUBLE)/100, 1.0)*0.5
         |        + (CASE WHEN avg_len >= 3 AND avg_len <= 8 THEN 0.3 ELSE 0.0 END)
         |        + least(stop_ratio*5, 1.0)*0.2, 4) AS quality
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_ws,
         |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe,
         |  n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_budget_select" ->
      s"""WITH ${Reference.ToksSql},
         |per AS (
         |  SELECT doc_id, count(*) AS w, count(DISTINCT word) AS u
         |  FROM toks GROUP BY doc_id
         |),
         |b AS (
         |  SELECT (1000 * u) // w AS bucket, count(*) AS nd,
         |    CAST(sum(n_chars) AS BIGINT) AS cost
         |  FROM per JOIN documents USING (doc_id) GROUP BY 1
         |),
         |c AS (
         |  SELECT bucket, nd, cost,
         |    sum(cost) OVER (ORDER BY bucket DESC) AS cum
         |  FROM b
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(coalesce(sum(nd), 0) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(cost), 0) AS BIGINT) AS total_cost,
         |  CAST(min(bucket) AS BIGINT) AS cutoff_bucket,
         |  CAST(50000 - coalesce(sum(cost), 0) AS BIGINT) AS budget_left
         |FROM c WHERE cum <= 50000""".stripMargin,

    "q_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> len(x) > 0)) AS BIGINT) AS words,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |        x -> trim(x) <> '')) AS BIGINT)) AS sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syls
        |  FROM documents
        |),
        |f AS (
        |  SELECT source, words, syls,
        |    CAST(round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
        |      - 84.6 * (CAST(syls AS DOUBLE) / words), 4)
        |      AS DECIMAL(18,4)) AS flesch
        |  FROM d WHERE words > 0
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS total_words,
        |  CAST(sum(syls) AS BIGINT) AS total_syls,
        |  round(CAST(sum(flesch) AS DOUBLE) / count(*), 6) AS avg_flesch
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(
         |    regexp_split_to_array(trim(regexp_replace(text, '$DelimSql', ' ', 'g')), ' '))), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_winnow" ->
      s"""WITH $WinnowSelSql,
         |a AS (
         |  SELECT doc_id, CAST(max(ng) AS BIGINT) AS n_grams,
         |    list_sort(list_distinct(list(wm))) AS fps
         |  FROM f GROUP BY doc_id
         |)
         |SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fp,
         |  md5(array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ',')) AS fp_md5
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_winnow_pairs" ->
      s"""WITH $WinnowSelSql,
         |fp AS (SELECT DISTINCT doc_id, wm FROM f),
         |nfp AS (SELECT doc_id, count(*) AS nf FROM fp GROUP BY doc_id),
         |rare AS (SELECT wm FROM fp GROUP BY wm
         |         HAVING count(*) BETWEEN 2 AND $WinnowDfCap),
         |p AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
         |  FROM fp x JOIN rare USING (wm) JOIN fp y USING (wm)
         |  WHERE x.doc_id < y.doc_id GROUP BY 1, 2
         |)
         |SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared,
         |  round(n_shared / least(xa.nf, yb.nf), 4) AS overlap
         |FROM p JOIN nfp xa ON p.a = xa.doc_id JOIN nfp yb ON p.b = yb.doc_id
         |WHERE n_shared >= least(xa.nf, yb.nf) * $WinnowOverlap
         |ORDER BY a, b""".stripMargin,

    "q_kmeans" ->
      s"""WITH $KmeansCtes
         |SELECT af.cid, count(*) AS n, min(af.id) AS min_vec, max(af.id) AS max_vec,
         |       CAST(CAST(sum(af.d2) AS DECIMAL(38,0)) AS VARCHAR) AS inertia,
         |       any_value(cm.c_md5) AS c_md5
         |FROM af JOIN cm USING (cid)
         |GROUP BY af.cid ORDER BY af.cid""".stripMargin,

    // a = af.d2 (the assignment minimum), b = min distance to any OTHER
    // centroid — both from the same df (all point×centroid distances)
    // the kmeans chain already exposes
    "q_silhouette" ->
      s"""WITH $KmeansCtes,
         |s2 AS (
         |  SELECT af.id, af.cid, af.d2 AS a2, min(df.d2) AS b2
         |  FROM af JOIN df ON df.id = af.id AND df.cid <> af.cid
         |  GROUP BY af.id, af.cid, af.d2
         |),
         |sil AS (
         |  SELECT cid,
         |    round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
         |      / sqrt(CAST(b2 AS DOUBLE)), 6) AS sc
         |  FROM s2
         |)
         |SELECT cid, count(*) AS n,
         |  round(${dsumSql("sc", 6)} / count(*), 6) AS mean_sil
         |FROM sil GROUP BY cid ORDER BY cid""".stripMargin,

    // the kmeans chain's final assignment (af) is the blocking key; the
    // pair scan mirrors q_dedup_embcos' exact-integer dot spelling
    "q_semdedup" ->
      s"""WITH $KmeansCtes,
         |$QuantizedNormSql,
         |qa AS (
         |  SELECT e.vec_id AS id, e.embedding AS emb, qn.nq, af.cid
         |  FROM embeddings e
         |  JOIN qn ON qn.vec_id = e.vec_id AND qn.nq > 0
         |  JOIN af ON af.id = e.vec_id
         |),
         |p AS (
         |  SELECT x.id AS xid, y.id, x.nq AS na, y.nq AS nb,
         |         x.emb AS ea, y.emb AS eb
         |  FROM qa x JOIN qa y ON x.cid = y.cid AND x.id < y.id
         |),
         |dd AS (
         |  SELECT xid, id, na, nb,
         |    CAST(sum(${quantSqlElem("ea[i]")} * ${quantSqlElem("eb[i]")}) AS BIGINT) AS dot
         |  FROM (SELECT p.*, unnest(generate_series(1, len(ea))) AS i FROM p)
         |  GROUP BY xid, id, na, nb
         |),
         |dropped AS (
         |  SELECT DISTINCT id FROM dd WHERE $CosExpr >= $SemTau
         |)
         |SELECT qa.cid, count(*) AS n,
         |  CAST(sum(CASE WHEN dropped.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  min(CASE WHEN dropped.id IS NULL THEN qa.id END) AS min_kept,
         |  max(CASE WHEN dropped.id IS NULL THEN qa.id END) AS max_kept
         |FROM qa LEFT JOIN dropped ON dropped.id = qa.id
         |GROUP BY qa.cid ORDER BY qa.cid""".stripMargin,

    "q_sample_diverse" ->
      s"""WITH $KmeansCtes,
         |rk AS (
         |  SELECT cid, id,
         |         row_number() OVER (PARTITION BY cid
         |           ORDER BY md5('div:' || CAST(id AS VARCHAR)), id) AS rk
         |  FROM af
         |),
         |kept AS (SELECT cid, id FROM rk WHERE rk <= $DiverseQuota)
         |SELECT cid, count(*) AS n_kept, min(id) AS min_kept, max(id) AS max_kept,
         |       CAST(sum(id) AS BIGINT) AS sum_kept
         |FROM kept GROUP BY cid ORDER BY cid""".stripMargin,

    "q_mix_sources" -> {
      val wVals = MixWeights.map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars,
         |         md5('mix:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents
         |),
         |w(lang, w) AS (VALUES $wVals),
         |counts AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
         |u AS (SELECT min(n // w) AS u FROM counts JOIN w USING (lang)),
         |r AS (SELECT d.*,
         |        row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rk
         |      FROM d),
         |kept AS (
         |  SELECT r.* FROM r JOIN w USING (lang) CROSS JOIN u
         |  WHERE r.rk <= w.w * u.u
         |)
         |SELECT counts.lang, counts.n,
         |       count(*) AS n_kept,
         |       CAST(sum(kept.n_chars) AS BIGINT) AS kept_chars,
         |       min(kept.doc_id) AS first_kept
         |FROM kept JOIN counts USING (lang)
         |GROUP BY counts.lang, counts.n ORDER BY counts.lang""".stripMargin
    },

    "q_sql_winnow" ->
      s"""WITH $WinnowSelSql
         |SELECT doc_id, CAST(count(DISTINCT wm) AS BIGINT) AS n_fp
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_stream_window_sink" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS ws,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the transformWithState final state must equal the batch GROUP BY —
    // the oracle never sees a stream
    "q_stream_dedup_sink" ->
      """SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY key""".stripMargin,

    "q_stream_sink_roundtrip" ->
s"""WITH $ToksSql
         |SELECT word, CAST(count(*) AS BIGINT) AS n
         |FROM toks GROUP BY word ORDER BY word""".stripMargin,

    "q_vocab_oov" ->
      s"""WITH $ToksSql,
         |vocab AS (
         |  SELECT word FROM toks GROUP BY word
         |  ORDER BY count(*) DESC, word LIMIT $VocabSize
         |),
         |per AS (
         |  SELECT doc_id, count(*) AS n_toks,
         |    sum(CASE WHEN word IN (SELECT word FROM vocab) THEN 0 ELSE 1 END) AS n_oov
         |  FROM toks GROUP BY doc_id
         |)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(n_oov AS BIGINT) AS n_oov,
         |  round(n_oov / n_toks, 4) AS oov_rate
         |FROM per ORDER BY doc_id""".stripMargin,

    "q_sketch_cms" ->
      s"""WITH $ToksSql,
         |wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
         |r AS (
         |  SELECT word, n, j,
         |    ${hex2longSql("md5(CAST(j AS VARCHAR) || ':' || word)", 1)} % $CmsWidth AS cell
         |  FROM wc CROSS JOIN (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j)
         |),
         |cells AS (
         |  SELECT j, cell, CAST(sum(n) AS BIGINT) AS cn FROM r GROUP BY j, cell
         |)
         |SELECT word, CAST(max(n) AS BIGINT) AS n_true, min(cn) AS n_est
         |FROM r JOIN cells USING (j, cell)
         |GROUP BY word ORDER BY word""".stripMargin,

    "q_sketch_cms_grouped" ->
      s"""WITH $ToksSql,
         |tw AS (
         |  SELECT d.source, t.word FROM toks t
         |  JOIN documents d ON t.doc_id = d.doc_id
         |),
         |wc AS (SELECT source, word, count(*) AS n FROM tw GROUP BY 1, 2),
         |r AS (
         |  SELECT source, word, n, j,
         |    ${hex2longSql("md5(CAST(j AS VARCHAR) || ':' || word)", 1)} % $CmsWidth AS cell
         |  FROM wc CROSS JOIN (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j)
         |),
         |cells AS (
         |  SELECT source, j, cell, CAST(sum(n) AS BIGINT) AS cn
         |  FROM r GROUP BY 1, 2, 3
         |)
         |SELECT source, word, CAST(max(n) AS BIGINT) AS n_true, min(cn) AS n_est
         |FROM r JOIN cells USING (source, j, cell)
         |GROUP BY source, word ORDER BY source, word""".stripMargin,

    "q_heavy_hitters" ->
      s"""WITH $ToksSql,
         |wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
         |r AS (
         |  SELECT word, n, j,
         |    ${hex2longSql("md5(CAST(j AS VARCHAR) || ':' || word)", 1)} % $CmsWidth AS cell
         |  FROM wc CROSS JOIN (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j)
         |),
         |cells AS (
         |  SELECT j, cell, CAST(sum(n) AS BIGINT) AS cn FROM r GROUP BY j, cell
         |),
         |est AS (
         |  SELECT word, CAST(max(n) AS BIGINT) AS n_true, min(cn) AS n_est
         |  FROM r JOIN cells USING (j, cell) GROUP BY word
         |),
         |tot AS (SELECT count(*) // 64 AS thr FROM toks)
         |SELECT word, n_est, n_true,
         |  CAST(CASE WHEN n_true >= thr THEN 1 ELSE 0 END AS BIGINT) AS confirmed
         |FROM est CROSS JOIN tot
         |WHERE n_est >= thr ORDER BY word""".stripMargin,

    "q_sketch_hll" ->
      s"""WITH h AS (
         |  SELECT ${hexLongSql("md5(CAST(l_orderkey AS VARCHAR))", 1, 15)} AS h
         |  FROM lineitem
         |),
         |br AS (
         |  SELECT h % $HllM AS bucket, h // $HllM AS rest FROM h
         |),
         |mx AS (
         |  SELECT bucket,
         |    max(CASE WHEN rest = 0 THEN 55 ELSE 55 - length(bin(rest)) END) AS mrho
         |  FROM br GROUP BY bucket
         |),
         |regs AS (
         |  SELECT b.bucket, CAST(coalesce(mx.mrho, 0) AS BIGINT) AS reg
         |  FROM (SELECT unnest(generate_series(0, ${HllM - 1})) AS bucket) b
         |  LEFT JOIN mx ON b.bucket = mx.bucket
         |),
         |sk AS (
         |  SELECT max(R) AS R,
         |    CAST(sum(1::BIGINT << CAST(R - reg AS INT)) AS BIGINT) AS S,
         |    md5(string_agg(CAST(reg AS VARCHAR), ',' ORDER BY bucket)) AS reg_md5
         |  FROM (SELECT bucket, reg, max(reg) OVER () AS R FROM regs)
         |)
         |SELECT
         |  (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS n_true,
         |  CAST($HllM AS BIGINT) AS m,
         |  round(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * pow(2, R) / CAST(S AS DOUBLE), 2) AS est,
         |  reg_md5
         |FROM sk""".stripMargin,

    "q_shingle_gen" ->
      s"""WITH sh AS (
         |  SELECT doc_id, substr(text, i, $K) AS sh
         |  FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, length(text) - ${K - 1}, $Stride)) AS i
         |        FROM documents WHERE length(text) >= $K)
         |)
         |SELECT doc_id, count(*) AS n_sh,
         |  CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct,
         |  min(sh) AS min_sh, max(sh) AS max_sh
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_sketch_hll_union" -> {
      def side(tag: String, t: String) =
        s"""h_$tag AS (
           |  SELECT ${hexLongSql("md5(CAST(user_id AS VARCHAR))", 1, 15)} AS h
           |  FROM events WHERE event_type = '$t'
           |),
           |br_$tag AS (SELECT h % $HllM AS bucket, h // $HllM AS rest FROM h_$tag),
           |mx_$tag AS (
           |  SELECT bucket,
           |    max(CASE WHEN rest = 0 THEN 55 ELSE 55 - length(bin(rest)) END) AS mrho
           |  FROM br_$tag GROUP BY bucket
           |),
           |reg_$tag AS (
           |  SELECT b.bucket, CAST(coalesce(mx_$tag.mrho, 0) AS BIGINT) AS reg
           |  FROM (SELECT unnest(generate_series(0, ${HllM - 1})) AS bucket) b
           |  LEFT JOIN mx_$tag ON b.bucket = mx_$tag.bucket
           |),
           |sk_$tag AS (
           |  SELECT max(R) AS R,
           |    CAST(sum(1::BIGINT << CAST(R - reg AS INT)) AS BIGINT) AS S
           |  FROM (SELECT reg, max(reg) OVER () AS R FROM reg_$tag)
           |)""".stripMargin
      def est(tag: String) =
        s"(SELECT round(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * pow(2, R) / CAST(S AS DOUBLE), 2) FROM sk_$tag)"
      s"""WITH ${side("a", "view")},
         |${side("b", "purchase")},
         |reg_m AS (
         |  SELECT a.bucket, greatest(a.reg, b.reg) AS reg
         |  FROM reg_a a JOIN reg_b b ON a.bucket = b.bucket
         |),
         |sk_m AS (
         |  SELECT max(R) AS R,
         |    CAST(sum(1::BIGINT << CAST(R - reg AS INT)) AS BIGINT) AS S
         |  FROM (SELECT reg, max(reg) OVER () AS R FROM reg_m)
         |)
         |SELECT
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         |   WHERE event_type = 'view') AS n_a,
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         |   WHERE event_type = 'purchase') AS n_b,
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
         |   WHERE event_type IN ('view', 'purchase')) AS n_union_true,
         |  ${est("a")} AS est_a,
         |  ${est("b")} AS est_b,
         |  ${est("m")} AS est_union,
         |  round(${est("a")} + ${est("b")} - ${est("m")}, 2) AS est_inter""".stripMargin
    },

    "q_dq_checks" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS viol_null_text,
        |  CAST(sum(CASE WHEN lang NOT IN ('en','fr','de','es','zh') THEN 1 ELSE 0 END) AS BIGINT) AS viol_bad_lang,
        |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS viol_n_chars_mismatch,
        |  CAST(sum(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS viol_negative_id,
        |  CAST(sum(CASE WHEN n_chars > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS viol_oversize
        |FROM documents""".stripMargin,

    "q_sketch_bloom" ->
      s"""WITH members AS (SELECT c_custkey AS key FROM customer),
         |bits AS (
         |  SELECT DISTINCT
         |    ${hex2longSql("md5(CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR))", 1)} % $BloomM AS pos
         |  FROM members CROSS JOIN (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j)
         |),
         |probes AS (SELECT key + 1000000 AS pkey FROM members),
         |pp AS (
         |  SELECT pkey,
         |    ${hex2longSql("md5(CAST(j AS VARCHAR) || ':' || CAST(pkey AS VARCHAR))", 1)} % $BloomM AS pos
         |  FROM probes CROSS JOIN (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j)
         |),
         |fp AS (
         |  SELECT pkey FROM pp JOIN bits USING (pos)
         |  GROUP BY pkey HAVING count(*) = $BloomK
         |)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
         |  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits,
         |  (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_fp,
         |  round((SELECT count(*) FROM fp) / (SELECT count(*) FROM probes), 6) AS fp_rate,
         |  (SELECT md5(string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos)) FROM bits) AS bits_md5""".stripMargin,

    "q_sketch_hll_grouped" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    ${hexLongSql("md5(CAST(user_id AS VARCHAR))", 1, 15)} AS h
         |  FROM events
         |),
         |br AS (
         |  SELECT event_type, h % $HllM AS bucket, h // $HllM AS rest FROM h
         |),
         |mx AS (
         |  SELECT event_type, bucket,
         |    max(CASE WHEN rest = 0 THEN 55 ELSE 55 - length(bin(rest)) END) AS mrho
         |  FROM br GROUP BY event_type, bucket
         |),
         |regs AS (
         |  SELECT t.event_type, b.bucket,
         |    CAST(coalesce(mx.mrho, 0) AS BIGINT) AS reg
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${HllM - 1})) AS bucket) b
         |  LEFT JOIN mx ON t.event_type = mx.event_type AND b.bucket = mx.bucket
         |),
         |sk AS (
         |  SELECT event_type, max(R) AS R,
         |    CAST(sum(1::BIGINT << CAST(R - reg AS INT)) AS BIGINT) AS S
         |  FROM (SELECT event_type, reg, max(reg) OVER (PARTITION BY event_type) AS R
         |        FROM regs)
         |  GROUP BY event_type
         |),
         |truth AS (
         |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
         |  FROM events GROUP BY event_type
         |)
         |SELECT truth.event_type, n_true,
         |  round(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * pow(2, R) / CAST(S AS DOUBLE), 2) AS est
         |FROM truth JOIN sk ON truth.event_type = sk.event_type
         |ORDER BY 1""".stripMargin,

    "q_span_corrupt" ->
      s"""WITH pos AS (
         |  SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS p
         |  FROM (SELECT doc_id, source,
         |          unnest(generate_series(1, len(str_split(text, ' ')))) AS i
         |        FROM documents)
         |),
         |st AS (
         |  SELECT doc_id, source, p,
         |    CAST(${hex2longSql("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR))", 1)} % 10 = 0
         |      AS INT) AS st
         |  FROM pos
         |),
         |m AS (
         |  SELECT doc_id, source, p, st,
         |    max(st) OVER (PARTITION BY doc_id ORDER BY p
         |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m
         |  FROM st
         |),
         |r AS (
         |  SELECT source, m,
         |    CASE WHEN m = 1 AND COALESCE(
         |        lag(m) OVER (PARTITION BY doc_id ORDER BY p), 0) = 0
         |      THEN 1 ELSE 0 END AS run_start
         |  FROM m
         |)
         |SELECT source, count(*) AS n_tokens,
         |  CAST(sum(m) AS BIGINT) AS n_masked,
         |  CAST(sum(run_start) AS BIGINT) AS n_spans,
         |  round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mask_ratio
         |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    "q_sketch_hll_window" ->
      s"""WITH ev AS (
         |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |    user_id
         |  FROM events
         |),
         |h AS (
         |  SELECT day,
         |    ${hexLongSql("md5(CAST(user_id AS VARCHAR))", 1, 15)} AS h
         |  FROM ev
         |),
         |br AS (SELECT day, h % $HllM AS bucket, h // $HllM AS rest FROM h),
         |mx AS (
         |  SELECT day, bucket,
         |    max(CASE WHEN rest = 0 THEN 55 ELSE 55 - length(bin(rest)) END)
         |      AS mrho
         |  FROM br GROUP BY day, bucket
         |),
         |regs AS (
         |  SELECT t.day, b.bucket, CAST(coalesce(mx.mrho, 0) AS BIGINT) AS reg
         |  FROM (SELECT DISTINCT day FROM ev) t
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${HllM - 1})) AS bucket) b
         |  LEFT JOIN mx ON t.day = mx.day AND b.bucket = mx.bucket
         |),
         |roll AS (
         |  SELECT day, bucket,
         |    max(reg) OVER (PARTITION BY bucket ORDER BY day
         |                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS reg
         |  FROM regs
         |),
         |sk AS (
         |  SELECT day, max(R) AS R,
         |    CAST(sum(1::BIGINT << CAST(R - reg AS INT)) AS BIGINT) AS S
         |  FROM (SELECT day, reg, max(reg) OVER (PARTITION BY day) AS R
         |        FROM roll)
         |  GROUP BY day
         |),
         |du AS (SELECT DISTINCT day, user_id FROM ev),
         |fan AS (
         |  SELECT rday, user_id FROM (
         |    SELECT unnest(generate_series(day, day + 6)) AS rday, user_id
         |    FROM du)
         |  WHERE rday IN (SELECT day FROM ev)
         |),
         |truth AS (
         |  SELECT rday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
         |  FROM fan GROUP BY 1
         |)
         |SELECT truth.day, n_true,
         |  round(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * pow(2, R)
         |        / CAST(S AS DOUBLE), 2) AS est
         |FROM truth JOIN sk ON truth.day = sk.day
         |ORDER BY 1""".stripMargin,

    "q_repetition" ->
      s"""WITH $ToksSql,
         |wc AS (SELECT doc_id, word, count(*) AS n FROM toks GROUP BY doc_id, word)
         |SELECT doc_id,
         |  CAST(sum(n) AS BIGINT) AS n_tok,
         |  count(*) AS n_distinct,
         |  CAST(max(n) AS BIGINT) AS top_n,
         |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4) AS dup_frac,
         |  round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4) AS top_frac
         |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tok
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    CASE WHEN n_tok <= 32 THEN CAST(1 AS BIGINT)
        |         ELSE 1 + CAST(floor((n_tok - 32 + 23) / 24.0) AS BIGINT) END AS n_chunks
        |  FROM t
        |),
        |x AS (SELECT doc_id, n_tok, unnest(generate_series(1, n_chunks)) AS chunk_id FROM c)
        |SELECT doc_id, n_tok, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(1 + (chunk_id - 1) * 24 AS BIGINT) AS chunk_start,
        |  CAST(least(n_tok - (1 + (chunk_id - 1) * 24) + 1, 32) AS BIGINT) AS chunk_len
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,

    "q_dedup_paragraph" ->
      """WITH arr AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\. ') AS a FROM documents
        |),
        |xs AS (
        |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr
        |),
        |p AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i, trim(a[i]) AS para
        |  FROM xs WHERE length(trim(a[i])) > 0
        |),
        |r AS (
        |  SELECT doc_id, para,
        |    row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
        |  FROM p
        |)
        |SELECT doc_id,
        |  count(*) AS n_paras,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rn = 1 THEN length(para) ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_clean_paragraph" ->
      """WITH arr AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\. ') AS a FROM documents
        |),
        |xs AS (
        |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM arr
        |),
        |p AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i, trim(a[i]) AS para
        |  FROM xs WHERE length(trim(a[i])) > 0
        |),
        |r AS (
        |  SELECT doc_id, i, para,
        |    row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
        |  FROM p
        |)
        |SELECT doc_id,
        |  count(*) AS n_kept,
        |  md5(string_agg(para, '. ' ORDER BY i)) AS clean_md5
        |FROM r WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_corr" ->
      s"""WITH v AS (
         |  SELECT label,
         |    ${quantSqlElem("embedding[1]")} AS x,
         |    ${quantSqlElem("embedding[2]")} AS y
         |  FROM embeddings
         |),
         |a AS (
         |  SELECT label, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x*y) AS BIGINT) AS sxy,
         |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
         |  FROM v GROUP BY label
         |)
         |SELECT label, n,
         |  round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
         |   sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) *
         |        (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)), 6) AS corr
         |FROM a ORDER BY label""".stripMargin,

    "q_array_hof" ->
      s"""WITH qv AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> ${quantSqlElem("x")}) AS q
         |  FROM embeddings
         |)
         |SELECT vec_id,
         |  CAST(len(list_filter(q, x -> x > 0)) AS BIGINT) AS n_pos,
         |  len(list_filter(q, x -> x >= 900)) > 0 AS has_big,
         |  CAST(list_aggregate(list_transform(q, x -> abs(x)), 'sum') AS BIGINT) AS l1,
         |  CAST(list_max(q) AS BIGINT) AS qmax,
         |  CAST(list_min(q) AS BIGINT) AS qmin
         |FROM qv ORDER BY vec_id""".stripMargin,

    "q_lm_score" ->
      s"""WITH $LmScoreCtes
         |SELECT doc_id, n_bigrams, nll FROM scores ORDER BY doc_id""".stripMargin,

    "q_filter_perplexity" ->
      // NOT quantile_cont: its lo + f·(hi−lo) spelling differs from the
      // engine's (1−f)·lo + f·hi by an ulp, which flips round(…,4) at an
      // exact .00005 boundary (observed on this corpus). The oracle
      // replays the selection formula verbatim in double arithmetic —
      // bit-identical IEEE on both engines.
      s"""WITH $LmScoreCtes,
         |ranked AS (SELECT nll, row_number() OVER (ORDER BY nll) AS rk FROM scores),
         |tp AS (
         |  SELECT CAST(floor(r) AS BIGINT) + 1 AS lo,
         |         least(CAST(floor(r) AS BIGINT) + 2, n) AS hi,
         |         r - floor(r) AS f
         |  FROM (SELECT CAST(0.75 AS DOUBLE) * (count(*) - 1) AS r,
         |               count(*) AS n FROM scores)
         |),
         |thr AS (
         |  SELECT CASE WHEN t.f = 0 THEN lo.nll
         |              ELSE (CAST(1.0 AS DOUBLE) - t.f) * lo.nll + t.f * hi.nll
         |         END AS thr
         |  FROM tp t JOIN ranked lo ON lo.rk = t.lo JOIN ranked hi ON hi.rk = t.hi
         |)
         |SELECT count(*) AS n_kept,
         |       CAST(sum(n_bigrams) AS BIGINT) AS kept_bigrams,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM scores CROSS JOIN thr WHERE nll <= thr.thr + 1e-9""".stripMargin,

    "q_token_budget" ->
      s"""WITH ${Reference.ToksSql},
         |counts AS (
         |  SELECT source, count(*) AS c
         |  FROM toks JOIN documents USING (doc_id) GROUP BY 1
         |),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS ctot FROM counts),
         |q AS (
         |  SELECT source, c,
         |    (1000000 * c) // ctot AS base,
         |    (1000000 * c) % ctot AS rem
         |  FROM counts CROSS JOIN tot
         |),
         |x AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS extra FROM q)
         |SELECT source, CAST(c AS BIGINT) AS tokens,
         |  CAST(base + CASE WHEN row_number()
         |      OVER (ORDER BY rem DESC, source) <= extra
         |    THEN 1 ELSE 0 END AS BIGINT) AS quota
         |FROM q CROSS JOIN x
         |ORDER BY source""".stripMargin,

    "q_lm_kn" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, str_split(text, ' ') AS a FROM documents
         |),
         |bg AS (
         |  SELECT doc_id, source,
         |    a[CAST(i AS INT)] AS v, a[CAST(i AS INT) + 1] AS w
         |  FROM (SELECT doc_id, source, a,
         |          unnest(generate_series(1, len(a) - 1)) AS i
         |        FROM t WHERE len(a) >= 2)
         |),
         |train AS (SELECT * FROM bg WHERE $hashBucketSql < 80),
         |test AS (SELECT * FROM bg WHERE $hashBucketSql >= 80),
         |cvw AS (SELECT v, w, count(*) AS c FROM train GROUP BY 1, 2),
         |cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv, count(*) AS n1f
         |       FROM cvw GROUP BY 1),
         |nb1 AS (SELECT w, count(*) AS n1b FROM cvw GROUP BY 1),
         |tot AS (SELECT (SELECT count(*) FROM cvw) AS nb,
         |  (SELECT count(DISTINCT tk) FROM
         |     (SELECT v AS tk FROM train UNION ALL SELECT w FROM train)) AS vv),
         |j AS (
         |  SELECT te.source, te.doc_id,
         |    COALESCE(cvw.c, 0) AS c, COALESCE(cv.cv, 0) AS cv,
         |    COALESCE(cv.n1f, 0) AS n1f, COALESCE(nb1.n1b, 0) AS n1b, nb, vv
         |  FROM test te
         |  LEFT JOIN cvw ON te.v = cvw.v AND te.w = cvw.w
         |  LEFT JOIN cv ON te.v = cv.v
         |  LEFT JOIN nb1 ON te.w = nb1.w
         |  CROSS JOIN tot
         |),
         |sc AS (
         |  SELECT source, doc_id,
         |    round(ln(CAST(CASE WHEN cv > 0 AND c > 0
         |                       THEN (4*c - 3)*nb + 3*n1f*n1b
         |                       WHEN cv > 0 THEN 3*n1f*n1b + 1
         |                       ELSE n1b + 1 END AS DOUBLE)), 8)
         |    - round(ln(CAST(CASE WHEN cv > 0 THEN 4*cv*nb
         |                         ELSE nb + vv END AS DOUBLE)), 8) AS lp
         |  FROM j
         |)
         |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  count(*) AS n_bigrams,
         |  round(-CAST(sum(CAST(lp AS DECIMAL(18,8))) AS DOUBLE)
         |        / count(*), 6) AS avg_nll
         |FROM sc GROUP BY 1 ORDER BY source""".stripMargin,

    "q_contamination" ->
      s"""WITH s8 AS (
         |  SELECT DISTINCT doc_id, substr(text, i, $K) AS sh
         |  FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, length(text) - ${K - 1}, $Stride)) AS i
         |        FROM documents WHERE length(text) >= $K)
         |),
         |bench AS (SELECT DISTINCT sh FROM s8 WHERE doc_id % 97 = 0)
         |SELECT s8.doc_id, count(*) AS n_sh,
         |  CAST(sum(CASE WHEN bench.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN bench.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 4) AS frac
         |FROM s8 LEFT JOIN bench ON s8.sh = bench.sh
         |WHERE s8.doc_id % 97 <> 0
         |GROUP BY s8.doc_id ORDER BY s8.doc_id""".stripMargin,

    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(split(text, '')) AS c
        |  FROM documents WHERE length(text) > 0
        |),
        |cnt AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
        |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total
        |        FROM cnt GROUP BY doc_id),
        |t AS (
        |  SELECT cnt.doc_id,
        |    CAST((CAST(cnt AS DOUBLE)/total)
        |         * round(ln(CAST(cnt AS DOUBLE)/total), 8)
        |         AS DECIMAL(28,10)) AS term
        |  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
        |)
        |SELECT doc_id, round(-CAST(sum(term) AS DOUBLE), 4) AS entropy,
        |  count(*) AS n_classes
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_len_histogram" ->
      """SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
        |  count(*) AS n, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE $hashBucketSql < 10 ORDER BY doc_id""".stripMargin,

    "q_sample_per_key" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    md5('smp-' || CAST(doc_id AS VARCHAR)) AS r
        |  FROM documents
        |),
        |k AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang ORDER BY r) AS rn
        |      FROM r)
        |SELECT lang, doc_id FROM k WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    "q_sample_pps" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars,
         |    ${hex2longSql("md5(CAST(doc_id AS VARCHAR))", 1)} AS bucket
         |  FROM documents
         |),
         |w AS (SELECT CAST(sum(n_chars) AS BIGINT) AS W FROM documents)
         |SELECT doc_id, n_chars,
         |  round(least(CAST(1 AS DOUBLE), ($PpsK * n_chars) / W), 6) AS p
         |FROM t, w
         |WHERE bucket * W < $PpsK * n_chars * 4294967296
         |ORDER BY doc_id""".stripMargin,

    "q_centroid" ->
      s"""SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS pos,
         |  count(*) AS n, CAST(sum(q) AS BIGINT) AS sq,
         |  round(CAST(sum(q) AS DOUBLE) / count(*), 4) AS c
         |FROM (
         |  SELECT label, i, ${quantSqlElem("embedding[i]")} AS q
         |  FROM (SELECT label, embedding,
         |          unnest(generate_series(1, len(embedding))) AS i
         |        FROM embeddings)
         |)
         |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,

    "q_split_train" ->
      s"""WITH b AS (SELECT doc_id, n_chars, $hashBucketSql AS bucket
         |           FROM documents),
         |s AS (SELECT doc_id, n_chars,
         |        CASE WHEN bucket < 80 THEN 'train'
         |             WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |      FROM b)
         |SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_scrub_pii" ->
      s"""WITH a AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com or https://ex.com/u/' || CAST(doc_id AS VARCHAR)
         |      || ' ref ' || CAST(doc_id*1000000 + 424242 AS VARCHAR) AS aug
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '$UrlRe')) AS BIGINT) AS n_url,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$UrlRe', '<URL>', 'g'),
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$DigitsRe', '<NUM>', 'g') AS clean
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tok
         |  FROM documents
         |),
         |c AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM d
         |),
         |b AS (SELECT lang, doc_id, n_tok,
         |        CAST(floor((cum - n_tok) / $PackBudget.0) AS BIGINT) AS bin
         |      FROM c)
         |SELECT lang, bin, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q_bm25" ->
      s"""WITH $ToksSql,
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
         |       WHERE word IN ${inList(BmTerms)} GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
         |          FROM dl),
         |c AS (
         |  SELECT tf.doc_id, $BmContribExpr AS contrib
         |  FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id)
         |  CROSS JOIN stats
         |)
         |SELECT doc_id, count(*) AS n_terms,
         |  ${dsumSql("contrib", 6)} AS score
         |FROM c GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q_bin_equidepth" ->
      s"""WITH $ToksSql,
         |dl AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
         |r AS (SELECT n_tok,
         |        row_number() OVER (ORDER BY n_tok, doc_id) AS rk,
         |        count(*) OVER () AS n
         |      FROM dl)
         |SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS bin,
         |  count(*) AS n_docs, min(n_tok) AS lo, max(n_tok) AS hi,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok
         |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_bpe_merges" ->
      s"""WITH $ToksSql,
         |wc0 AS (
         |  SELECT word, count(*) AS cnt,
         |    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
         |  FROM toks GROUP BY word
         |),
         |p1 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc0),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t1 AS (SELECT l, r, w FROM p1 ORDER BY w DESC, l, r LIMIT 1),
         |wc1 AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM wc0 CROSS JOIN t1
         |),
         |p2 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc1),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t2 AS (SELECT l, r, w FROM p2 ORDER BY w DESC, l, r LIMIT 1),
         |wc2 AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM wc1 CROSS JOIN t2
         |),
         |p3 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc2),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t3 AS (SELECT l, r, w FROM p3 ORDER BY w DESC, l, r LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS step, l, r, w FROM t1
         |UNION ALL SELECT CAST(2 AS BIGINT), l, r, w FROM t2
         |UNION ALL SELECT CAST(3 AS BIGINT), l, r, w FROM t3
         |ORDER BY step""".stripMargin,

    "q_bpe_apply" ->
      s"""WITH $ToksSql,
         |wc0 AS (
         |  SELECT word, count(*) AS cnt,
         |    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
         |  FROM toks GROUP BY word
         |),
         |p1 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc0),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t1 AS (SELECT l, r, w FROM p1 ORDER BY w DESC, l, r LIMIT 1),
         |wc1 AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM wc0 CROSS JOIN t1
         |),
         |p2 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc1),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t2 AS (SELECT l, r, w FROM p2 ORDER BY w DESC, l, r LIMIT 1),
         |wc2 AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM wc1 CROSS JOIN t2
         |),
         |p3 AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS w
         |  FROM (SELECT cnt, string_split(trim(seq), ' ') AS syms FROM wc2),
         |       unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  WHERE len(syms) >= 2 GROUP BY 1, 2
         |),
         |t3 AS (SELECT l, r, w FROM p3 ORDER BY w DESC, l, r LIMIT 1),
         |wc3 AS (
         |  SELECT word, cnt,
         |    replace(seq, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS seq
         |  FROM wc2 CROSS JOIN t3
         |)
         |SELECT word, cnt,
         |  CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_sym
         |FROM wc3 ORDER BY word""".stripMargin,

    "q_stream_join_sink" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events
        |)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id AS user_id, round(p.value, 2) AS purchase_value
        |FROM e c JOIN e p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.us >= c.us AND p.us <= c.us + 1800000000
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_shuffle_shards" ->
      s"""WITH d AS (
         |  SELECT doc_id, ($hashBucketSql) % 8 AS shard,
         |    md5('ord' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents
         |)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    AS BIGINT) AS pos
         |FROM d ORDER BY shard, pos""".stripMargin,

    "q_sketch_quantile" -> {
      val sels = HistPs.map { case (lbl, num, den) =>
        s"min(CASE WHEN cum >= ($num*n + ${den - 1}) // $den THEN bin END) AS b_$lbl"
      }.mkString(",\n    ")
      val joins = HistPs.map { case (lbl, _, _) =>
        s"JOIN d d_$lbl ON d_$lbl.event_type = s.event_type AND d_$lbl.bin = s.b_$lbl"
      }.mkString("\n")
      val ests = HistPs.map { case (lbl, num, den) =>
        histEstExpr(s"d_$lbl.bin", s"d_$lbl.cnt",
          s"($num*s.n + ${den - 1}) // $den", s"d_$lbl.cumb") + s" AS $lbl"
      }.mkString(",\n  ")
      s"""WITH v AS (
         |  SELECT event_type,
         |    CAST(floor(value*100 + 0.5) AS BIGINT) // $HistBinW AS bin
         |  FROM events
         |),
         |b AS (SELECT event_type, bin, count(*) AS cnt FROM v GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, bin, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM b
         |),
         |d AS (SELECT *, cum - cnt AS cumb FROM c),
         |sel AS (
         |  SELECT event_type, max(n) AS n,
         |    $sels
         |  FROM d GROUP BY event_type
         |)
         |SELECT s.event_type, s.n,
         |  $ests
         |FROM sel s
         |$joins
         |ORDER BY s.event_type""".stripMargin
    },

    "q_prefix_join" ->
      s"""WITH reps AS (
         |  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
         |),
         |sh AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), $K) AS sh
         |  FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, length(text) - ${K - 1}, $Stride)) AS i
         |        FROM reps WHERE length(text) >= $K)
         |),
         |dfq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |pref AS (
         |  SELECT doc_id, sh FROM (
         |    SELECT s.doc_id, s.sh, z.sz,
         |      row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS rn
         |    FROM sh s JOIN dfq d USING (sh) JOIN sz z USING (doc_id)
         |  ) WHERE rn <= sz - ($PrefixTNum*sz + $PrefixTNum) // $PrefixTDen + 1
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM pref a JOIN pref b USING (sh) WHERE a.doc_id < b.doc_id
         |),
         |i AS (
         |  SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.d1
         |  JOIN sh y ON y.doc_id = c.d2 AND y.sh = x.sh
         |  GROUP BY c.d1, c.d2
         |)
         |SELECT i.d1, i.d2, i.inter, z1.sz AS sz1, z2.sz AS sz2,
         |  round(CAST(i.inter AS DOUBLE) / CAST(z1.sz + z2.sz - i.inter AS DOUBLE), 4) AS jac
         |FROM i
         |JOIN sz z1 ON z1.doc_id = i.d1
         |JOIN sz z2 ON z2.doc_id = i.d2
         |WHERE ${PrefixTDen + PrefixTNum}*i.inter >= $PrefixTNum*(z1.sz + z2.sz)
         |ORDER BY i.d1, i.d2""".stripMargin,

    "q_ngram_topk" ->
      s"""WITH $BigramCountsSql,
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rn
         |  FROM c
         |)
         |SELECT w1, w2, cnt FROM r WHERE rn <= $NgramK
         |ORDER BY w1, w2""".stripMargin,

    "q_sketch_bloom_grouped" -> {
      def posOf(c: String) =
        s"${hex2longSql(s"md5(CAST(j AS VARCHAR) || ':' || CAST($c AS VARCHAR))", 1)} % $BloomM"
      s"""WITH members AS (
         |  SELECT DISTINCT event_type, user_id AS key FROM events
         |),
         |bits AS (
         |  SELECT DISTINCT event_type, ${posOf("key")} AS pos
         |  FROM members
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j)
         |),
         |probes AS (
         |  SELECT event_type, key + 1000000 AS pkey FROM members
         |),
         |pp AS (
         |  SELECT event_type, pkey, ${posOf("pkey")} AS pos
         |  FROM probes
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${BloomK - 1})) AS j)
         |),
         |fp AS (
         |  SELECT event_type, count(*) AS n_fp FROM (
         |    SELECT pp.event_type, pp.pkey
         |    FROM pp JOIN bits b ON pp.event_type = b.event_type AND pp.pos = b.pos
         |    GROUP BY pp.event_type, pp.pkey HAVING count(*) = $BloomK
         |  ) GROUP BY event_type
         |)
         |SELECT m.event_type, m.n_members, b.n_bits,
         |  CAST(coalesce(f.n_fp, 0) AS BIGINT) AS n_fp,
         |  round(CAST(coalesce(f.n_fp, 0) AS DOUBLE) / m.n_members, 6) AS fp_rate
         |FROM (SELECT event_type, count(*) AS n_members FROM members GROUP BY 1) m
         |JOIN (SELECT event_type, count(*) AS n_bits FROM bits GROUP BY 1) b
         |  ON m.event_type = b.event_type
         |LEFT JOIN fp f ON m.event_type = f.event_type
         |ORDER BY m.event_type""".stripMargin
    },

    "q_feature_hash" ->
      s"""WITH $ToksSql
         |SELECT doc_id,
         |  ${hex2longSql("md5(word)", 1)} % $FeatHashDim AS bucket,
         |  count(*) AS cnt
         |FROM toks GROUP BY 1, 2
         |ORDER BY doc_id, bucket""".stripMargin,

    "q_random_projection" -> {
      val sums = (0 until LshPlanes).map { p =>
        val arr = LshW(p).mkString("[", ", ", "]")
        s"CAST(sum(q * ($arr)[i]) AS BIGINT) AS d$p"
      }.mkString(",\n  ")
      s"""SELECT vec_id,
         |  $sums
         |FROM (SELECT vec_id, i, ${quantSqlElem("embedding[i]")} AS q
         |      FROM (SELECT vec_id, embedding,
         |                   unnest(generate_series(1, len(embedding))) AS i
         |            FROM embeddings))
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    "q_pmi" ->
      s"""WITH $BigramCountsSql,
         |lm AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM c GROUP BY 1),
         |rm AS (SELECT w2, CAST(sum(cnt) AS BIGINT) AS c2 FROM c GROUP BY 1),
         |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS nb FROM c)
         |SELECT c.w1, c.w2, c.cnt,
         |  round(ln(CAST(nb AS DOUBLE) * CAST(cnt AS DOUBLE) / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi
         |FROM c
         |JOIN lm ON c.w1 = lm.w1
         |JOIN rm ON c.w2 = rm.w2
         |CROSS JOIN nn
         |WHERE c.cnt >= $PmiMinCount
         |ORDER BY c.w1, c.w2""".stripMargin
  )
}
