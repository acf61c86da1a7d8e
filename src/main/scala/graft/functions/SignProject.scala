package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss SIGN projection of an embedding to `outDim`
  * dimensions in ONE codegen'd expression — the cheap coarse space of a
  * two-stage retrieval (project once, scan the small vectors, exact-rerank
  * the survivors). A ±1 matrix is a classic JL construction (Achlioptas):
  * inner products are preserved in expectation with the same concentration
  * as gaussian entries, and the projection is pure adds/subtracts.
  *
  * Why an expression and not a Column tree: outDim × dim element_at/±
  * nodes (1024 at 16×64) is the same janino-limit blowup that pushed the
  * hyperplane sketch out of whole-stage codegen (see
  * [[HyperplaneBuckets]]); here the whole projection is one tight loop
  * behind a single reference node.
  *
  * ORACLE-REPLICABLE by construction: entry (i, j) is
  * `sign((i*dim + j) * 2654435761 mod 97 mod 2)` — plain integer
  * arithmetic, not a JVM PRNG — so the SQL twin spells the same ±
  * pattern out as literal add/subtract terms in the same j order (in-order
  * double fold starting at 0.0 ⇒ bitwise-equal cross-engine).
  *
  * A vector whose length differs from `dim` projects to the zero vector
  * (cosine against it is null via the zero-norm guard), mirroring the
  * length-mismatch convention of [[HyperplaneBuckets]].
  */
case class SignProject(child: Expression, dim: Int, outDim: Int)
  extends UnaryExpression {

  require(dim > 0 && outDim > 0, s"dim/outDim must be positive, got $dim/$outDim")

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sign_project"

  private def isFloat: Boolean = elemType.contains(FloatType)

  def projectOf(vec: ArrayData): Array[Double] = {
    val out = new Array[Double](outDim)
    if (vec.numElements() != dim) return out
    val fl = isFloat
    var i = 0
    while (i < outDim) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val v = if (fl) vec.getFloat(j).toDouble else vec.getDouble(j)
        acc += (if (SignProject.signAt(i, j, dim) > 0) v else -v)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(projectOf(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signProject", this)
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$self.projectOf($vec));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignProject {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  /** The arithmetic ±1 rule — shared with the SQL-twin generator so both
    * engines spell the identical matrix. */
  def signAt(i: Int, j: Int, dim: Int): Int =
    if (((i.toLong * dim + j) * 2654435761L) % 97 % 2 == 0) 1 else -1

  def apply(vec: Column, dim: Int, outDim: Int): Column =
    columnOf(SignProject(expressionOf(vec), dim, outDim))
}
