package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the pure numeric/text kernels (SURVEY.md §5.2.3) —
  * no SparkSession needed, so these run in milliseconds and cover input
  * space the fixture-driven tests can't.
  */
object PropertyChecks extends Properties("graft") {

  private val cents2dp: Gen[List[Long]] =
    Gen.listOfN(200, Gen.chooseNum(-1000000L, 1000000L))

  // The Det.fixedSum model: summing scaled longs then dividing once is
  // EXACTLY the BigDecimal sum of the 2dp values.
  property("fixedSum model is exact for 2dp values") = forAll(cents2dp) { cents =>
    val doubles = cents.map(_ / 100.0)
    val exact = doubles.map(BigDecimal(_)).sum.toDouble
    val viaLongs = cents.sum / 100.0
    viaLongs == exact
  }

  private val emaInput = for {
    n <- Gen.chooseNum(1, 50)
    xs <- Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))
    a <- Gen.chooseNum(0.01, 1.0)
  } yield (xs, a)

  property("EMA reference: length-preserving and bounded by input range") =
    forAll(emaInput) { case (xs, alpha) =>
      val e = graft.operators.TechnicalIndicators.emaReference(xs, alpha)
      val (lo, hi) = (xs.min, xs.max)
      e.length == xs.length &&
        e.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9)
    }

  private val chunkInput = for {
    len <- Gen.chooseNum(1, 500)
    text <- Gen.stringOfN(len, Gen.alphaChar)
    chunk <- Gen.chooseNum(2, 60)
    overlap <- Gen.chooseNum(0, chunk - 1)
  } yield (text, chunk, overlap)

  // Pure model of TextOps.chunks: same start arithmetic.
  private def chunkModel(text: String, chunk: Int, overlap: Int): Seq[String] = {
    val stride = chunk - overlap
    (1 to math.max(text.length - overlap, 1) by stride)
      .map(s => text.substring(s - 1, math.min(s - 1 + chunk, text.length)))
  }

  property("chunk model: full coverage, stride spacing, bounded width") =
    forAll(chunkInput) { case (text, chunk, overlap) =>
      val cs = chunkModel(text, chunk, overlap)
      cs.nonEmpty &&
        cs.forall(_.length <= chunk) &&
        cs.head.startsWith(text.take(1)) &&
        cs.mkString.length >= text.length && // overlap => total >= len
        text.endsWith(cs.last) // last chunk reaches the end
    }

  property("rolling-hash modulus stays in [0, 2^31)") =
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { hs =>
      val M = 2147483647L; val B = 131L
      val fp = hs.foldLeft(0L)((acc, h) => (((acc * B + (((h % M) + M) % M)) % M) + M) % M)
      fp >= 0 && fp < M
    }
}
