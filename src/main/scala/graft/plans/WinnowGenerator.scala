package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as a native Catalyst Generator: for each document, hash every character
  * k-gram (first 8 md5 hex chars of the gram's UTF-8 bytes, as a BIGINT —
  * the exact rule `conv(substring(md5(substring(t,i,k)),1,8),16,10)` spells
  * in SQL), slide a w-window over the hash sequence, and emit one row per
  * FULL window: (i = 1-based window start gram, wm = the window's minimum
  * hash, ng = the doc's total k-gram count).
  *
  * This replaces the round-3 shape (per-position explode feeding
  * `Window.partitionBy(doc_id)`), whose w-frame min inserted a hash
  * Exchange carrying ~40 bytes × every character position — a shuffle
  * several times the corpus size at 100 TB for a purely per-document
  * computation. Here the whole selection runs inside one GenerateExec:
  * zero shuffle, one pass, O(ng) per document via a monotonic-deque
  * sliding minimum. Downstream consumers aggregate by doc — and because
  * the first thing they do is a partial (map-side) distinct/collect_set,
  * the only Exchange in the pipeline now carries the ~2/(w+1)-density
  * fingerprint sets, not the gram stream.
  *
  * Position arithmetic is by CODEPOINT (matching both Spark's `substring`
  * SQL semantics and the DuckDB oracle), so non-BMP text cannot diverge
  * and surrogate pairs are never split. Documents with no full window
  * (fewer than w+k-1 codepoints) emit no rows. CodegenFallback: Generate
  * nodes sit at whole-stage-codegen boundaries anyway (same trade as
  * [[ShingleGenerator]]), so the fallback costs one virtual call per
  * input row while the md5 work dominates.
  *
  * Registered in SQL as `winnow_fingerprints(text, k, w)` via
  * [[GraftExtensions]] (k, w must be INT literals).
  */
case class WinnowGenerator(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow_fingerprints: k=$k w=$w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got ${child.dataType.catalogString}")

  override def elementSchema: StructType = StructType(
    StructField("i", IntegerType, nullable = false) ::
    StructField("wm", LongType, nullable = false) ::
    StructField("ng", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val s = t.asInstanceOf[UTF8String].toString
    // codepoint start offsets: off(j) = UTF-16 index of the j-th codepoint,
    // off(ncp) = s.length — identity on ASCII, surrogate-safe beyond it
    val off = {
      val b = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
      var ci = 0
      while (ci < s.length) { b += ci; ci += Character.charCount(s.codePointAt(ci)) }
      b += s.length
      b
    }
    val ncp = off.length - 1
    val ng = ncp - (k - 1) // k-gram count
    if (ng < w) return Nil // no full w-window
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](ng)
    var g = 0
    while (g < ng) {
      val d = md.digest(
        s.substring(off(g), off(g + k)).getBytes(StandardCharsets.UTF_8))
      // first 4 bytes big-endian, unsigned — the value of the first 8 md5
      // hex chars, identical to the DuckDB replay (queries.hex2longSql)
      hs(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }
    // monotonic-deque sliding minimum: dq holds gram indices with
    // increasing hash values; the head is the current window's min
    val rows = new Array[InternalRow](ng - w + 1)
    val dq = new Array[Int](ng)
    var head = 0
    var tail = 0
    val ngL = ng.toLong
    var p = 0
    while (p < ng) {
      while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
      dq(tail) = p; tail += 1
      if (dq(head) <= p - w) head += 1
      if (p >= w - 1) // window covering grams [p-w+1, p]; i is 1-based
        rows(p - w + 1) = InternalRow(p - w + 2, hs(dq(head)), ngL)
      p += 1
    }
    rows
  }

  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
