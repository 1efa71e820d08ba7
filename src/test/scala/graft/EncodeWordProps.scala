package graft

import graft.functions.EncodeWord
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure reference functions (no Spark needed). */
object EncodeWordProps extends Properties("EncodeWord") {

  private val wordGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaChar,
    2 -> Gen.numChar,
    1 -> Gen.oneOf('`', 'é', '°', '!', '.', ' ', '\t'),
    1 -> Gen.asciiPrintableChar
  )).map(_.mkString)

  property("output is digits only, even length") = forAll(wordGen) { w =>
    val e = EncodeWord.encode(w)
    e.forall(_.isDigit) && e.length % 2 == 0
  }

  property("every pair is a code in [0, 26]") = forAll(wordGen) { w =>
    EncodeWord.encode(w).grouped(2).forall { p =>
      val c = p.toInt; c >= 0 && c <= 26
    }
  }

  property("case-insensitive (routing lowercases)") = forAll(wordGen) { w =>
    EncodeWord.encode(w) == EncodeWord.encode(w.toUpperCase)
  }

  property("concatenation distributes") = forAll(wordGen, wordGen) { (a, b) =>
    EncodeWord.encode(a + b) == EncodeWord.encode(a) + EncodeWord.encode(b)
  }

  property("route lands in [0, n) and only depends on encode") =
    forAll(wordGen.suchThat(w => EncodeWord.encode(w).nonEmpty),
      Gen.choose(1, 16)) { (w, n) =>
      val r = EncodeWord.route(w, n)
      r >= 0 && r < n &&
        r == new java.math.BigInteger(EncodeWord.encode(w))
          .mod(java.math.BigInteger.valueOf(n)).intValue()
    }

  property("keep-rule: encode empty iff no char in [`-z] after lowercasing") =
    forAll(wordGen) { w =>
      val hasKeepable = w.toLowerCase.exists(c => c >= '`' && c <= 'z')
      EncodeWord.encode(w).nonEmpty == hasKeepable
    }
}
