package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-parity tokenization.
  *
  * Semantics derived from the reference engine (remy-tang/SLR207-mapreduce):
  *  - Delimiter class: `WorkerSender.java:216`
  *    (`line.split("[!.:;_,'@?()/° \n\t]+")`). This is the distributed path's
  *    regex (`+`-collapsed, empty-filtered) — canonicalized over the
  *    sequential oracle's (`WordCounter.java:28`) which keeps interior empty
  *    tokens; see SURVEY.md §1 fine print 2.
  *  - Keep-rule: a token survives iff its `encode()` image is non-empty
  *    (`WorkerSender.java:221`, encode at `:129-148`), i.e. its lowercased
  *    form contains ≥1 char in the inclusive range backtick..'z' (the
  *    reference's off-by-one admits backtick).
  *  - Counting is case-sensitive while shuffle routing is not
  *    (`WorkerSender.java:135,230`). Under Spark, routing is an execution
  *    detail of `Exchange hashpartitioning`, so only the case-sensitive
  *    counting semantics are preserved.
  *
  * Scale notes: tokenize is a narrow map (no shuffle); wordCount compiles to
  * scan → generate → partial HashAggregate → single Exchange on `word` →
  * final HashAggregate, all inside whole-stage codegen. Map-side partial
  * aggregation is a strict improvement over the reference's per-occurrence
  * network send (`ListenerReducer.java:123-139`) with identical results.
  */
object Tokenize {
  /** `WorkerSender.java:216` delimiter class (Java & RE2 compatible). */
  val Delim = """[!.:;_,'@?()/° \n\t]+"""

  /** Keep a token iff lower(token) has a char in backtick..'z'. */
  val KeepRegex = "[`-z]"

  def keep(word: Column): Column = lower(word).rlike(KeepRegex)

  /** One output row per kept token; original spelling preserved. */
  def tokenize(df: DataFrame, textCol: String, out: String = "word"): DataFrame =
    df.withColumn(out, explode(split(col(textCol), Delim))).where(keep(col(out)))

  /** Whitespace-normalized, order-preserving token array (for shingling). */
  def tokenArray(text: Column): Column =
    split(trim(regexp_replace(text, Delim, " ")), " ")

  /** Bag-of-words identity: md5 of the sorted distinct token set — robust
    * to word order, catches shuffled duplicates. Single definition shared
    * by the batch catalog (q_fingerprint) and the streaming dedup
    * (StreamOps.dedupByFingerprint), which promise the SAME identity. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokenArray(text)))))

  /** Global word count: (word, cnt), single shuffle, partial agg map-side. */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    tokenize(df.select(col(textCol)), textCol)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** The reference's literal output shape: top-K PER REDUCER
    * (`WorkerSender.java:26,286-296` — each worker sorts and prints its own
    * top-20; the global merge was left as dead code). Reducer identity uses
    * the reference's own routing — `BigInteger(encode(word)) mod N`
    * (`WorkerSender.java:223-224`) — so the result is deterministic and
    * independent of physical partitioning (AQE may coalesce partitions;
    * `spark_partition_id` would NOT be a faithful reducer id). Keysets per
    * reducer are disjoint, counts are exact; only the top-K *selection* is
    * local. Returns (reducer, word, cnt). The flagship uses the global
    * top-K. */
  def topKPerReducer(df: DataFrame, textCol: String, k: Int = 20,
                     numReducers: Int = 4): DataFrame = {
    import df.sparkSession.implicits._
    val wc = wordCount(df, textCol)
      .withColumn("reducer",
        graft.functions.EncodeWord.routeUdf(col("word"), lit(numReducers)))
    // bounded-memory groupwise top-K (O(k) state per reducer) — a window
    // row_number formulation would fully sort each reducer's keyset
    val topk = new graft.functions.TopKWords(k)
    wc.select(col("reducer"), col("word"), col("cnt"))
      .as[(Int, String, Long)]
      .groupByKey(_._1)
      .agg(topk.toColumn)
      .flatMap { case (reducer, items) =>
        items.map(w => (reducer, w.word, w.cnt))
      }
      .toDF("reducer", "word", "cnt")
  }
}
