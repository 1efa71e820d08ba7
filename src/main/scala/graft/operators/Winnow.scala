package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every character k-gram, slide a w-window over
  * the hash sequence, and select each window's MINIMUM hash. The distinct
  * selected values are the document fingerprint — expected density 2/(w+1)
  * of full shingling, with the guarantee that any substring shared by two
  * documents of length ≥ w+k-1 contributes at least one common selected
  * value (the shared windows see identical hash multisets, so their minima
  * agree).
  *
  * Spark shape: one narrow per-position explode, then ONE doc_id shuffle
  * shared by both window functions (running min over the w-frame and the
  * per-doc gram count) — per-doc state never leaves its partition, so the
  * operator scales with corpus size, not document count. The k-gram hash is
  * the first 8 md5 hex chars as a BIGINT, computable identically in DuckDB
  * (see [[graft.queries.hex2longSql]]) so oracles can replay the rule.
  */
object Winnow {

  /** Per-position window minima: one row per FULL w-window (gram position
    * i ≤ ng-w+1) with columns (idCol, i, wm, ng) — wm = the window's
    * selected fingerprint, ng = the doc's total k-gram count (closed-form
    * from the text length, so the only window function is the w-frame
    * min). Documents with no full window yield no rows. Callers
    * aggregate: the distinct (idCol, wm) pairs are the fingerprint set.
    *
    * (A fully-narrow higher-order-function variant — gram-hash array +
    * slice/array_min per window, zero shuffles — was measured 2-4× SLOWER
    * than this shape at sf0.1: nested lambdas evaluate interpreted,
    * outside whole-stage codegen, and the per-window slice allocations
    * dominate. The codegen'd explode + one narrow-key window won.) */
  def selected(df: DataFrame, idCol: String, textCol: String,
               k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w must be positive")
    val frame = Window.partitionBy(idCol).orderBy("i").rowsBetween(0, w - 1)
    df.where(length(col(textCol)) >= k + w - 1)
      .select(col(idCol),
        (length(col(textCol)) - (k - 1)).cast("long").as("ng"),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("i"),
        col(textCol).as("__winnow_t"))
      .select(col(idCol), col("ng"), col("i"),
        expr(s"CAST(conv(substring(md5(substring(__winnow_t, i, $k)), 1, 8), 16, 10) AS BIGINT)")
          .as("h"))
      .withColumn("wm", min(col("h")).over(frame))
      .where(col("i") <= col("ng") - (w - 1)) // full windows only
      .select(col(idCol), col("i"), col("wm"), col("ng"))
  }
}
