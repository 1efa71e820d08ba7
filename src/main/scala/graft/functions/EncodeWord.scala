package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The reference's positional-alphabetic word encoding
  * (`WorkerSender.java:129-148`): lowercase the word; for each char c with
  * code = c + 1 - 'a' in [0, 26] (backtick..'z' — the off-by-one at `:138`
  * admits backtick as 00), append the zero-padded 2-digit code; all other
  * chars are skipped. The reference routes shuffle traffic with
  * `BigInteger(encode(w)) mod N` (`WorkerSender.java:223-224`); in Spark,
  * routing is subsumed by Exchange hash partitioning, so this survives only
  * as a scalar function (its emptiness IS the tokenizer keep-rule).
  */
object EncodeWord {
  def encode(w: String): String = {
    if (w == null) return null
    // Locale.ROOT: a tr-TR default locale would map "I" → dotless ı (code
    // 209, skipped), making a KEPT token encode to "" and route() throw.
    val lw = w.toLowerCase(java.util.Locale.ROOT)
    val sb = new StringBuilder(lw.length * 2)
    var i = 0
    while (i < lw.length) {
      val code = lw.charAt(i) + 1 - 'a'
      if (code >= 0 && code <= 26) {
        if (code < 10) sb.append('0')
        sb.append(code.toString)
      }
      i += 1
    }
    sb.toString
  }

  val encodeUdf: UserDefinedFunction = udf(encode _)

  /** The reference's reducer routing: `BigInteger(encode(w)) mod n`
    * (`WorkerSender.java:223-224`). Only defined for kept tokens (encode
    * non-empty). */
  def route(w: String, n: Int): Int =
    new java.math.BigInteger(encode(w))
      .mod(java.math.BigInteger.valueOf(n)).intValue()

  val routeUdf: UserDefinedFunction = udf(route _)
}
