package graft.functions

/** String-distance kernels behind the native expressions `jaro_winkler`
  * and `damerau_lev` — static methods so generated code can call them
  * directly (same linkage trick as [[BoundedLev]]).
  *
  * Both are pinned BIT-EXACT to DuckDB's `jaro_winkler_similarity` /
  * `damerau_levenshtein` (the correctness oracle's native functions) —
  * verified by a 75k-random-pair fuzz during development and re-pinned by
  * StringDistSpec's oracle-literal vectors. The DuckDB-compatible choices
  * that differ from textbook presentations:
  *
  *  - Jaro match window is `max(0, max(|a|,|b|)/2 - 1)` — the clamp makes
  *    single-char equal pairs similarity 1 instead of 0.
  *  - The transposition count is `mismatches / 2` in INTEGER division
  *    (many references keep the half: `t = 1.5` for 3 crossed chars; the
  *    oracle floors it).
  *  - Either input empty → 0.0 (textbook Jaro gives 1.0 for two empties).
  *  - Winkler prefix boost (≤ 4 chars, weight 0.1) applies only when the
  *    Jaro similarity exceeds 0.7, with the exact evaluation order
  *    `sim + l * 0.1 * (1 - sim)` (binary-identical association).
  *  - Damerau-Levenshtein is the FULL (unrestricted) variant with the
  *    alphabet-indexed DP — `dl("ca","abc") = 2`, where the more common
  *    optimal-string-alignment restriction answers 3.
  *
  * Semantics are over UTF-16 code units; the library's oracle-checked
  * callers feed `[A-Za-z]+` tokens where code units = code points.
  */
object StringDistances {

  /** DuckDB-compatible Jaro-Winkler similarity in [0, 1]. O(|a|·w) time,
    * O(|a|+|b|) space; no allocation beyond the two match-flag arrays. */
  def jaroWinkler(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val md = math.max(math.max(la, lb) / 2 - 1, 0)
    val amatch = new Array[Boolean](la)
    val bmatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb, i + md + 1)
      var j = math.max(0, i - md)
      var open = true
      while (j < hi && open) {
        if (!bmatch(j) && a.charAt(i) == b.charAt(j)) {
          amatch(i) = true; bmatch(j) = true; m += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var crossed = 0
    i = 0
    while (i < la) {
      if (amatch(i)) {
        while (!bmatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) crossed += 1
        k += 1
      }
      i += 1
    }
    val t = crossed / 2 // integer floor — the oracle's convention
    val sim = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3
    if (sim > 0.7) {
      val lim = math.min(4, math.min(la, lb))
      var l = 0
      while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
      sim + l * 0.1 * (1 - sim)
    } else sim
  }

  /** Full (unrestricted) Damerau-Levenshtein distance: insert, delete,
    * substitute, and transpose of two ADJACENT chars each cost 1, with
    * edits allowed between the transposed pair (the alphabet-indexed DP).
    * O(|a|·|b|) time, O(|a|·|b|) space. */
  def damerauLev(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val j1 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
