package graft

import graft.etl.LoadJob
import graft.functions.Fingerprints
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property tests for the pure kernels (SURVEY.md §5: property tests for
  * the quality-gate predicates and hash families). Raw ScalaCheck runner
  * (no scalatestplus bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val emailRe = LoadJob.emailRegex.r

  test("email regex accepts well-formed addresses") {
    val local = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val domain = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check(forAll(local, domain, domain) { (l, d, tld) =>
      emailRe.matches(s"$l@$d.$tld")
    })
  }

  test("email regex rejects strings without @ or without a dotted domain") {
    check(forAll(Gen.alphaNumStr) { s =>
      !emailRe.matches(s) && !emailRe.matches(s + "@nodot")
    })
  }

  test("rolling fingerprint is deterministic and range-bounded") {
    check(forAll(Gen.asciiPrintableStr) { s =>
      val a = Fingerprints.minRollingHash(UTF8String.fromString(s), 8)
      val b = Fingerprints.minRollingHash(UTF8String.fromString(s), 8)
      a == b && a >= 0L && a < Fingerprints.Mod
    })
  }

  test("fingerprint min over a window superset can only decrease") {
    check(forAll(Gen.asciiPrintableStr.suchThat(_.length >= 8)) { s =>
      val one = Fingerprints.minRollingHash(UTF8String.fromString(s), 8)
      val two = Fingerprints.minRollingHash(UTF8String.fromString(s + s), 8)
      two <= one
    })
  }

  test("double-hash minhash family stays in [0, P32) for any h1,h2") {
    val h32 = Gen.chooseNum(0L, (1L << 32) - 1)
    check(forAll(h32, h32, Gen.chooseNum(0, 15)) { (h1, h2, k) =>
      val v = (h1 + k * h2) % graft.ext.Dedup.P32
      v >= 0L && v < graft.ext.Dedup.P32
    })
  }
}
