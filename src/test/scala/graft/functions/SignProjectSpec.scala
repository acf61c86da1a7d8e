package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SignProjectSpec extends SparkSpec {
  import spark.implicits._

  private def projOf(v: Seq[Float], dim: Int = 4, outDim: Int = 3): Seq[Double] =
    Seq(Tuple1(v)).toDF("e")
      .select(SignProject(col("e"), dim, outDim).as("p"))
      .as[Seq[Double]].head()

  test("projection matches the hand fold over the arithmetic sign rule") {
    val v = Seq(1.5f, -2.0f, 0.25f, 8.0f)
    val got = projOf(v)
    val want = (0 until 3).map { i =>
      var acc = 0.0
      (0 until 4).foreach { j =>
        val x = v(j).toDouble
        acc += (if (SignProject.signAt(i, j, 4) > 0) x else -x)
      }
      acc
    }
    assert(got === want)
  }

  test("sign rule is a pure function and both-signs populated at 16x64") {
    val signs = for (i <- 0 until 16; j <- 0 until 64)
      yield SignProject.signAt(i, j, 64)
    assert(signs.contains(1) && signs.contains(-1))
    // roughly balanced — a degenerate all-one-sign matrix would make the
    // projection a scaled sum, not a JL embedding
    val pos = signs.count(_ > 0)
    assert(pos > signs.size / 4 && pos < 3 * signs.size / 4)
  }

  test("length mismatch projects to the zero vector (cosine guard nulls it)") {
    val got = projOf(Seq(1f, 2f), dim = 4, outDim = 3)
    assert(got === Seq(0.0, 0.0, 0.0))
    val sim = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f, 4f))).toDF("a", "b")
      .select(VectorOps.cosineHof(
        SignProject(col("a"), 4, 3), SignProject(col("b"), 4, 3)).as("s"))
      .collect().head
    assert(sim.isNullAt(0), "zero-norm projected vector must null the cosine")
  }

  test("null input stays null; expression is codegen-compatible") {
    val df = Seq(Tuple1(Option.empty[Seq[Float]])).toDF("e")
      .select(SignProject(col("e"), 4, 3).as("p"))
    assert(df.collect().head.isNullAt(0))
    // a Range-derived input can't constant-fold into a LocalTableScan, so
    // the projection really runs through the generated code path
    val df2 = spark.range(8).select(
      array((1 to 4).map(j => (col("id") + j).cast("float")): _*).as("e"))
      .select(SignProject(col("e"), 4, 3).as("p"))
    val plan = df2.queryExecution.executedPlan.toString
    // the `*(1)` prefix is the whole-stage-codegen marker in the compact
    // plan string — the projection must sit INSIDE a codegen stage
    assert(plan.contains("*(1) Project [sign_project"),
      s"must stay in codegen:\n$plan")
    assert(df2.count() === 8L)
  }
}
