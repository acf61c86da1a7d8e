package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** Embedding-vector math over `array<float>` columns (SURVEY.md §2.B
  * Q-ARR1 / Q-SIM1/2), built from codegen'd higher-order functions — no
  * UDFs, so the expressions stay inside whole-stage codegen and work on any
  * column without serialization to JVM objects.
  *
  * Accumulation is an in-order left fold in DOUBLE (floats widened exactly),
  * which is also what the DuckDB oracle computes — bitwise-identical results.
  */
object VectorOps {

  /** Sequential left-fold sum of an array<double> expression. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Codegen'd in-order dot product (graft.functions.DotProduct) — the
    * LSH-sketch inner loop (~100 evaluations per row under multi-band
    * bucketing). Bitwise-equal to [[dotHof]], the interpreted reference. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Reference HOF dot product (same fold order) for cross-checking the
    * custom expression; interpreted, allocates the product array. */
  def dotHof(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity — the fused single-pass codegen expression
    * (graft.functions.CosineSimilarity). Bitwise-identical to
    * [[cosineHof]]; kept as the default because it avoids the HOF's
    * intermediate product array and double traversal. */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Reference HOF formulation of cosine (same fold order); used by tests
    * to cross-check the custom expression and by non-float array inputs.
    * `nullif` guards the zero-norm case to null, mirroring the custom
    * expression — raw `Divide` would raise under ANSI mode where the
    * codegen'd form's Java division would yield NaN. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / nullif(norm2(a) * norm2(b), lit(0.0))

  /** L2 (Euclidean) distance — codegen'd (graft.functions.L2Distance);
    * the IVF-assignment inner loop (one eval per vector per centroid).
    * Bitwise-equal to [[l2Hof]]. */
  def l2(a: Column, b: Column): Column = L2Distance(a, b)

  /** Reference HOF L2 (same fold order) for cross-checking. */
  def l2Hof(a: Column, b: Column): Column =
    sqrt(fsum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    })))

  /** Symmetric int8 quantization of an embedding: q_i = round(x_i/s*127)
    * with per-vector scale s = max|x_i| — 4x smaller at rest (byte vs
    * float), the standard storage trade for 100 TB embedding corpora.
    * Cosine is SCALE-INVARIANT, so similarity search runs directly on the
    * int8 arrays (the per-vector scale cancels) — no dequantize pass; the
    * only loss is the rounding itself (property-tested small). */
  def quantizeInt8(vec: Column): Column = {
    val s = greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30))
    transform(vec, x => round(x.cast("double") / s * 127.0).cast("tinyint"))
  }

  /** Cosine over int8-quantized vectors: the fused codegen expression
    * (CosineSimilarity dispatches on element type — tinyint here), same
    * in-order double fold as the HOF form, zero-norm -> null. */
  def cosineInt8(a: Column, b: Column): Column = CosineSimilarity(a, b)
}
