package graft

import graft.operators.Winnow
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks of the winnowing operator against an in-memory mirror,
  * plus the paper's match guarantee (any shared substring of length
  * ≥ w+k-1 yields a shared fingerprint) on adversarially planted inputs —
  * properties the single-corpus DuckDB oracle can't exercise. */
class WinnowSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Plain-Scala mirror of Winnow.selected's hash + selection rule. */
  private def mirrorFps(text: String): Set[Long] = {
    if (text.length < K) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to text.length - K).map { i =>
      val hex = md.digest(text.substring(i, i + K).getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    if (hs.length < W) Set.empty
    else hs.sliding(W).map(_.min).toSet
  }

  private def sparkFps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] =
    Winnow.selected(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .select("doc_id", "wm").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }

  test("Winnow.selected matches the in-memory mirror on random strings") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefg "
    val docs = (1L to 40L).map { id =>
      val len = rnd.nextInt(60) // includes < k and < k+w-1 lengths
      id -> Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    }
    val got = sparkFps(docs)
    val want = docs.map { case (id, t) => id -> mirrorFps(t) }
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("match guarantee: shared substring of length ≥ w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcdefghij"
    for (trial <- 1 to 10) {
      val shared = Seq.fill(W + K - 1)(alpha(rnd.nextInt(alpha.length))).mkString
      def noise(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
      val d1 = noise(rnd.nextInt(30)) + shared + noise(rnd.nextInt(30))
      val d2 = noise(rnd.nextInt(30)) + shared + noise(rnd.nextInt(30))
      val fps = sparkFps(Seq(1L -> d1, 2L -> d2))
      assert(fps(1L).intersect(fps(2L)).nonEmpty,
        s"trial $trial: no shared fingerprint for d1=$d1 d2=$d2")
    }
  }

  test("codepoint positions: non-BMP text never splits surrogate pairs") {
    // a codepoint-aware mirror (the plain-String mirror above would slide
    // over UTF-16 units and split the emoji's surrogate pair)
    def cpMirror(text: String): Set[Long] = {
      val cps = text.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      if (cps.length < K) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to cps.length - K).map { i =>
        val hex = md.digest(cps.slice(i, i + K).mkString.getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16)
      }
      if (hs.length < W) Set.empty else hs.sliding(W).map(_.min).toSet
    }
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq(
      1L -> (s"ab${emoji}cdef${emoji}ghijklm$emoji" * 2),
      2L -> s"plain ascii text with no surrogates at all")
    val got = sparkFps(docs)
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == cpMirror(t), s"doc $id") }
  }

  test("density: far fewer fingerprints than grams, never more than windows") {
    val rnd = new scala.util.Random(5)
    val text = Seq.fill(2000)("abcdefghijklmnop"(rnd.nextInt(16))).mkString
    val fps = mirrorFps(text)
    val windows = text.length - K + 1 - (W - 1)
    assert(fps.size <= windows)
    // expected density 2/(w+1) = 0.4; allow generous slack both ways
    assert(fps.size.toDouble / windows > 0.2 && fps.size.toDouble / windows < 0.6)
  }
}
