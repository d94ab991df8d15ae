package graft

import graft.functions.Udfs
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests for the pure scalar kernels (raw ScalaCheck
  * driven from ScalaTest — the scalatestplus bridge isn't in the
  * offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  test("base32 round-trips arbitrary bytes") {
    check("base32") {
      Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
        val arr = bs.toArray
        Udfs.base32Decode(Udfs.base32Encode(arr)).sameElements(arr)
      }
    }
  }

  test("levenshtein is a metric: identity, symmetry, triangle") {
    check("levenshtein") {
      Prop.forAll(asciiText, asciiText, asciiText) { (a, b, c) =>
        Udfs.levenshtein(a, a) == 0 &&
          Udfs.levenshtein(a, b) == Udfs.levenshtein(b, a) &&
          Udfs.levenshtein(a, c) <= Udfs.levenshtein(a, b) + Udfs.levenshtein(b, c)
      }
    }
  }

  test("mask-number output never leaks digits outside # positions") {
    check("mask") {
      Prop.forAll(Gen.listOfN(9, Gen.numChar).map(_.mkString)) { d =>
        !Udfs.maskNumber(d, "xxx-xx-####").take(6).exists(_.isDigit)
      }
    }
  }

  test("normalizeText is idempotent and whitespace-collapsing") {
    check("normalize") {
      Prop.forAll(asciiText) { s =>
        val once = Udfs.normalizeText(s)
        Udfs.normalizeText(once) == once && !once.contains("  ")
      }
    }
  }

  test("minhash signatures: deterministic, fixed length") {
    check("minhash") {
      Prop.forAll(asciiText.suchThat(_.length >= 10)) { s =>
        val a = Udfs.minhashSig(s, 32, 5, 42L)
        val b = Udfs.minhashSig(s, 32, 5, 42L)
        a.sameElements(b) && a.length == 32
      }
    }
  }

  test("porter stemmer reaches a fixpoint") {
    check("porter") {
      Prop.forAll(Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
        .suchThat(_.length >= 3)) { w =>
        val s2 = Udfs.porterStem(Udfs.porterStem(w))
        Udfs.porterStem(s2) == s2
      }
    }
  }

  test("simhash of similar token sets differs in few bits") {
    check("simhash") {
      Prop.forAll(Gen.listOfN(20, Gen.identifier).suchThat(_.nonEmpty)) { toks =>
        val h = java.lang.Long.bitCount(
          Udfs.simhashSig(toks.mkString(" ")) ^
            Udfs.simhashSig((toks :+ "extra").mkString(" ")))
        h <= 32
      }
    }
  }
}
