package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def writeGens(): Seq[(Long, String)] = {
    val root = Files.createTempDirectory("graft_schema_spec").toString
    Seq((1L, 10), (2L, 20)).toDF("k", "v")
      .select(col("k"), col("v").cast("int").as("v"), lit("x").as("tag"))
      .write.parquet(s"$root/g1")
    Seq((3L, 30L)).toDF("k", "v")
      .select(col("k"), col("v").cast("long").as("v"), lit("y").as("label"))
      .write.parquet(s"$root/g2")
    Seq((4L, "oops")).toDF("k", "v") // v type-conflicts: int/bigint -> string
      .select(col("k"), col("v"), lit("z").as("label"))
      .write.parquet(s"$root/g3")
    Seq((1L, s"$root/g1"), (2L, s"$root/g2"), (3L, s"$root/g3"))
  }

  test("driftReport: widening, conflict, rename candidate, presence windows") {
    val gens = writeGens()
    val rep = SchemaEvolution.driftReport(
        SchemaEvolution.generationSchemas(spark, gens))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = rep("v")
    assert(v.getString(4) === "int->bigint->string") // type_history
    assert(v.getBoolean(5) === true)   // widened (int->bigint)
    assert(v.getBoolean(7) === true)   // conflict (bigint->string)
    assert(v.get(8) == null)           // reader_type quarantined
    val tag = rep("tag")
    assert(tag.getLong(2) === 1L && tag.getString(9) === "label",
      "tag vanished at gen 1; label (same type) appeared at gen 2")
    val k = rep("k")
    assert(k.getLong(1) === 1L && k.getLong(2) === 3L && k.getLong(3) === 3L)
    assert(k.getString(8) === "bigint" && k.get(9) == null)
  }

  test("readReconciled: casts to reader types, nulls missing, quarantines conflicts") {
    val gens = writeGens()
    val rep = SchemaEvolution.driftReport(
      SchemaEvolution.generationSchemas(spark, gens))
    val (df, quarantined, reader) = SchemaEvolution.readReconciled(spark, gens, rep)
    assert(quarantined === Seq("v"), "the conflicted column is quarantined")
    assert(reader.map(_._1) === Seq("k", "label", "tag"))
    assert(df.columns.toSeq === Seq("__gen", "k", "label", "tag"))
    val rows = df.orderBy("k").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
    assert(rows.toSeq === Seq(
      (1L, None, Some("x")), (2L, None, Some("x")),
      (3L, Some("y"), None), (4L, Some("z"), None)))
    // every generation contributes, under one unified schema
    assert(df.select("__gen").distinct().count() === 3)
  }

  test("a narrowing (bigint -> int) is flagged narrowed, not conflict") {
    val inv = Seq((1L, "c", "bigint"), (2L, "c", "int"))
      .toDF("gen", "col_name", "data_type")
    val r = SchemaEvolution.driftReport(inv).collect().head
    assert(r.getBoolean(6) === true && r.getBoolean(7) === false)
    assert(r.getString(8) === "bigint", "reader keeps the widest type seen")
  }
}
