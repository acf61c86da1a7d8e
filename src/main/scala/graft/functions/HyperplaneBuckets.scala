package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ALL hyperplane-LSH band buckets of an embedding in ONE expression —
  * the sketch stage of `Similarity.lshBucketedPairsAboveThreshold`.
  *
  * The Column formulation (one `DotProduct` node per band × plane, a
  * when/bitwiseOR fold per band) grows the expression tree as
  * numBands × planesPerBand × ~dim literal/call nodes: at 24 bands ×
  * 8 auto-planes × 64 dims the generated projection blows past janino's
  * method limits, whole-stage codegen falls back, and the sketch runs as
  * per-node tree interpretation — measured 132 s vs 47 s for the SMALLER
  * plane count on the same corpus (ScaleBench round 5). Here the planes
  * live as one flat primitive double[] reference and the whole sketch is
  * three tight loops; the plane count changes flop count, not plan shape.
  *
  * Bitwise-compatible with the Column formulation (spec-asserted):
  * - planes are drawn from the SAME seeded generator sequence
  *   (`Random(seed + band)`, gaussians in plane-major, dim-minor order)
  *   that `Similarity.hyperplanes` uses;
  * - each dot is the same in-order (double)v[i] * plane[i] fold as
  *   `DotProduct`;
  * - bit p of a band's bucket is set iff that dot is > 0, and a vector
  *   whose length differs from `dim` gets bucket 0 in every band (the
  *   Column form's null dot falls to the `otherwise(0)` branch).
  */
case class HyperplaneBuckets(child: Expression, numBands: Int,
                             planesPerBand: Int, dim: Int, seed: Long)
  extends UnaryExpression {

  require(numBands > 0 && planesPerBand > 0 && planesPerBand <= 63 && dim > 0)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_buckets"

  /** planes[(b * planesPerBand + p) * dim + d] — same draw order as
    * `Similarity.hyperplanes(planesPerBand, dim, seed + b)` per band. */
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](numBands * planesPerBand * dim)
    var i = 0
    var b = 0
    while (b < numBands) {
      val rnd = new scala.util.Random(seed + b)
      var p = 0
      while (p < planesPerBand) {
        var d = 0
        while (d < dim) { out(i) = rnd.nextGaussian(); i += 1; d += 1 }
        p += 1
      }
      b += 1
    }
    out
  }

  private def isFloat: Boolean = elemType.contains(FloatType)

  def bucketsOf(vec: ArrayData): Array[Long] = {
    val out = new Array[Long](numBands)
    if (vec.numElements() != dim) return out // length mismatch => bucket 0s
    val fl = isFloat
    var b = 0
    while (b < numBands) {
      var bucket = 0L
      var p = 0
      while (p < planesPerBand) {
        val off = (b * planesPerBand + p) * dim
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val v = if (fl) vec.getFloat(d).toDouble else vec.getDouble(d)
          dot += v * planes(off + d)
          d += 1
        }
        if (dot > 0) bucket |= 1L << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(bucketsOf(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call into the tight-loop kernel; the expression node is
    // a single reference however many planes there are
    val self = ctx.addReferenceObj("hyperplaneBuckets", this)
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$self.bucketsOf($vec));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def apply(vec: Column, numBands: Int, planesPerBand: Int, dim: Int,
            seed: Long): Column =
    columnOf(HyperplaneBuckets(expressionOf(vec), numBands, planesPerBand, dim, seed))
}
