package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized algebraic invariants of the pure sketch kernels — these
  * hold for ALL inputs, complementing the fixture pins and the SQL-form
  * bit-identity tests (SketchKernelSpec). The kernels are plain JVM
  * functions, so no Spark session is involved. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', 'é', 'ß', '中')))
      .map(_.mkString)

  private val vec: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 100.0)).map(_.toArray)

  private def arr(v: Array[Double]) = new GenericArrayData(v)
  private def toks(ts: Seq[String]) =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  test("charShingles ≡ naive code-point sliding-distinct, any text") {
    def naive(s: String, n: Int): List[String] = {
      val cps = s.codePoints.toArray
      if (cps.length < n) Nil
      else (0 to cps.length - n).map(i => new String(cps, i, n)).distinct.toList
    }
    check(Prop.forAll(text) { s =>
      val got = SketchImpl.charShingles(UTF8String.fromString(s), 3)
      (0 until got.numElements()).map(got.getUTF8String(_).toString).toList ==
        naive(s, 3)
    })
  }

  test("cosineSim: symmetric, self ≈ 1, exact under power-of-two scaling") {
    check(Prop.forAll(vec, vec) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      val ab = SketchImpl.cosineSim(arr(x), arr(y))
      val ba = SketchImpl.cosineSim(arr(y), arr(x))
      val scaled = SketchImpl.cosineSim(arr(x), arr(y.map(_ * 2.0)))
      // zero-norm sides yield 0 by contract (never NaN) — bit-compare
      java.lang.Double.doubleToLongBits(ab) ==
        java.lang.Double.doubleToLongBits(ba) &&
        java.lang.Double.doubleToLongBits(ab) ==
          java.lang.Double.doubleToLongBits(scaled) &&
        !ab.isNaN && math.abs(ab) <= 1.0 + 1e-9
    })
    check(Prop.forAll(vec) { a =>
      val c = SketchImpl.cosineSim(arr(a), arr(a))
      if (a.forall(_ == 0.0)) c == 0.0 // zero vector: 0 by contract
      else math.abs(c - 1.0) <= 1e-9
    })
  }

  test("dotProduct: exactly symmetric") {
    check(Prop.forAll(vec, vec) { (a, b) =>
      SketchImpl.dotProduct(arr(a), arr(b)) ==
        SketchImpl.dotProduct(arr(b), arr(a))
    })
  }

  test("minhashSig: order-invariant; union takes the element-wise min") {
    val tokens = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(tokens, tokens) { (a, b) =>
      val k = 16
      def sig(ts: Seq[String]): Seq[Long] = {
        val s = SketchImpl.minhashSig(toks(ts), k)
        (0 until k).map(s.getLong)
      }
      sig(a) == sig(scala.util.Random.shuffle(a)) &&
        sig(a ++ b) == sig(a).zip(sig(b)).map(p => math.min(p._1, p._2))
    })
  }

  test("simhash64: permutation-invariant") {
    val tokens = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(tokens) { ts =>
      SketchImpl.simhash64(toks(ts)) ==
        SketchImpl.simhash64(toks(scala.util.Random.shuffle(ts)))
    })
  }

  test("rolling hash: h(a ++ b) = h(a)·31^|bytes(b)| + h(b) (mod 2⁶⁴)") {
    check(Prop.forAll(text, text) { (a, b) =>
      val lenB = b.getBytes("UTF-8").length
      var p = 1L
      (0 until lenB).foreach(_ => p *= 31L) // mod 2^64 via Long overflow
      RollingHash.hash(a + b) == RollingHash.hash(a) * p + RollingHash.hash(b)
    })
  }
}
