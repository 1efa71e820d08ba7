package graft.functions

/** Banded edit distance: exact levenshtein when ≤ k, else k+1 (callers
  * only ever threshold at k, so values above it need no precision).
  *
  * The full DP is O(n·m); inside a candidates→verify fuzzy join the
  * verify is the hot loop, and a band of width 2k+1 around the diagonal
  * is sufficient for any distance ≤ k — O((2k+1)·n) time, O(m) space,
  * plus a free length-difference early exit. Distances are over UTF-16
  * code units like Spark's built-in levenshtein on the BMP; the fuzzy
  * catalog query restricts to printable ASCII where all engines agree.
  */
object BoundedLev {

  private final val Inf = Int.MaxValue >> 1

  def within(a: String, b: String, k: Int): Int = {
    // the function builder rejects negative literals at analysis; keep the
    // runtime guard so a direct caller can't read "0" as "within bound"
    require(k >= 0, s"lev_within bound must be non-negative, got $k")
    val n = a.length
    val m = b.length
    if (Math.abs(n - m) > k) return k + 1
    if (n == 0) return m
    if (m == 0) return n
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(cur, Inf)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else Inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = Math.max(1, i - k)
      val hi = Math.min(m, i + k)
      cur(lo - 1) = if (lo == 1) i else Inf
      var best = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = Inf
      // every band cell already exceeds k → the final distance must too
      if (best > k) return k + 1
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, Inf)
      i += 1
    }
    val d = prev(m)
    if (d > k) k + 1 else d
  }
}
