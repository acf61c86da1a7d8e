package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Schema-evolution / drift audit (round 11 — VERDICT r10 #6): a crawl
  * lake is parquet written across months by drifting producers — columns
  * appear, disappear, get renamed, and change type between GENERATIONS
  * (ingest batches/directories). A reader that mergeSchema's blindly
  * either fails the scan on a type conflict or silently nulls what it
  * can't cast. This operator makes the drift a REPORT and the
  * reconciliation a POLICY:
  *
  *  - [[generationSchemas]]: the (gen, col_name, data_type) inventory
  *    read from parquet FOOTERS only (schema metadata — never a data
  *    scan; at 100 TB this touches kilobytes per generation).
  *  - [[driftReport]]: per column — first/last generation seen, presence
  *    count, the type CHANGE-POINT history ("int->bigint->double"),
  *    whether every change was a WIDENING (int<bigint<double — the safe
  *    lattice Spark's own schema merge uses), a NARROWING (down-lattice,
  *    lossy but castable), or a CONFLICT (cross-kind, e.g.
  *    string->bigint — no safe cast exists), the RECONCILED READER TYPE
  *    (the widest type seen; null when conflicted), and the
  *    renamed-candidate link (a column that vanished at generation g
  *    whose type matches a column that first appeared at g+1).
  *  - [[readReconciled]]: union all generations under the reconciled
  *    reader schema — present columns cast to the reader type, missing
  *    columns null, type-CONFLICTED columns QUARANTINED (dropped from
  *    the scan and returned by name) instead of failing the read.
  *
  * All report logic is relational over the inventory (one tiny keyed
  * window + aggregations), so the DuckDB oracle replays it exactly. */
object SchemaEvolution {

  /** Widening lattice rank; null for types outside the numeric chain
    * (two differing unranked-or-mixed types are a conflict). */
  private def rankOf(t: Column): Column =
    when(t === "int", lit(1)).when(t === "bigint", lit(2))
      .when(t === "double", lit(3))

  /** The same lattice for driver/state-side code (the streaming drift
    * twin classifies change points with it — one definition, two
    * execution shapes). */
  private[graft] def typeRank(t: String): Option[Int] = t match {
    case "int" => Some(1)
    case "bigint" => Some(2)
    case "double" => Some(3)
    case _ => None
  }

  /** Read each generation directory's parquet schema (footers only).
    * Returns (gen, col_name, data_type) with Spark simpleString names
    * (int/bigint/double/string/...). */
  def generationSchemas(spark: SparkSession,
                        gens: Seq[(Long, String)]): DataFrame =
    generationSchemasFromFiles(spark, gens.map { case (g, d) => (g, Seq(d)) })

  /** [[generationSchemas]] over explicit per-generation FILE lists — the
    * form an [[AcidTable]] manifest yields, where one commit's files share
    * a schema but live under a uuid directory, not a numbered one. */
  def generationSchemasFromFiles(spark: SparkSession,
                                 gens: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    require(gens.nonEmpty, "at least one generation")
    gens.flatMap { case (g, paths) =>
      spark.read.parquet(paths: _*).schema.fields
        .map(f => (g, f.name, f.dataType.simpleString))
    }.toDF("gen", "col_name", "data_type")
  }

  /** Drift report over a (gen, col_name, data_type) inventory — see the
    * object doc for the emitted columns. */
  def driftReport(inventory: DataFrame): DataFrame = {
    val w = Window.partitionBy("col_name").orderBy("gen")
    // change points: the first observation plus every type change
    val cp = inventory
      .withColumn("__prev", lag(col("data_type"), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col("data_type"))
      .withColumn("__r", rankOf(col("data_type")))
      .withColumn("__rp", rankOf(col("__prev")))
      .withColumn("__wide", col("__prev").isNotNull &&
        col("__r").isNotNull && col("__rp").isNotNull && col("__r") > col("__rp"))
      .withColumn("__narrow", col("__prev").isNotNull &&
        col("__r").isNotNull && col("__rp").isNotNull && col("__r") < col("__rp"))
      .withColumn("__conflict", col("__prev").isNotNull &&
        (col("__r").isNull || col("__rp").isNull))
    // widest type: a non-conflict column's change-point types are either a
    // single (possibly unranked) type or all on the numeric chain — so the
    // reader type is "by max rank, else the (unique) type". The same CASE
    // shape replays textually in the oracle.
    val perCol = cp.groupBy("col_name").agg(
      array_join(transform(sort_array(collect_list(struct(col("gen"),
        col("data_type")))), s => s.getField("data_type")), "->")
        .as("type_history"),
      max(col("__wide")).as("widened"),
      max(col("__narrow")).as("narrowed"),
      max(col("__conflict")).as("conflict"),
      max(col("__r")).as("__maxr"),
      max(col("data_type")).as("__anytype"))
      .withColumn("__widest",
        when(col("__maxr").isNull, col("__anytype"))
          .when(col("__maxr") === 3, lit("double"))
          .when(col("__maxr") === 2, lit("bigint"))
          .otherwise(lit("int")))
    val presence = inventory.groupBy("col_name").agg(
      min("gen").as("first_gen"), max("gen").as("last_gen"),
      count(lit(1)).as("n_gens"))
    val maxGen = inventory.agg(max("gen")).head().getLong(0)
    // renamed candidate: A vanished at g, B first appeared at g+1 with the
    // type A last had (deterministic pick: lowest candidate name)
    val lastType = inventory
      .withColumn("__rn", row_number().over(
        Window.partitionBy("col_name").orderBy(col("gen").desc)))
      .where(col("__rn") === 1)
      .select(col("col_name"), col("gen").as("__lg"), col("data_type").as("__lt"))
    val firstType = inventory
      .withColumn("__rn", row_number().over(
        Window.partitionBy("col_name").orderBy(col("gen").asc)))
      .where(col("__rn") === 1)
      .select(col("col_name").as("__cand"), col("gen").as("__fg"),
        col("data_type").as("__ft"))
    val renames = lastType.where(col("__lg") < maxGen)
      .join(firstType.where(col("__fg") > 1),
        col("__fg") === col("__lg") + 1 && col("__lt") === col("__ft"))
      .groupBy("col_name").agg(min(col("__cand")).as("renamed_to"))
    presence
      .join(perCol, Seq("col_name"))
      .join(renames, Seq("col_name"), "left_outer")
      .select(col("col_name"), col("first_gen"), col("last_gen"), col("n_gens"),
        col("type_history"), col("widened"), col("narrowed"), col("conflict"),
        when(!col("conflict"), col("__widest")).as("reader_type"),
        col("renamed_to"))
  }

  /** Union all generations under the reconciled reader schema: present
    * columns cast to the reader type, missing columns null, CONFLICTED
    * columns quarantined. Adds `__gen`. Returns (data, quarantined column
    * names, reader schema as (col_name, reader_type) pairs). */
  def readReconciled(spark: SparkSession, gens: Seq[(Long, String)],
                     report: DataFrame):
      (DataFrame, Seq[String], Seq[(String, String)]) =
    readReconciledFiles(spark, gens.map { case (g, d) => (g, Seq(d)) }, report)

  /** [[readReconciled]] over explicit per-generation file lists (the
    * [[AcidTable]] manifest form). */
  def readReconciledFiles(spark: SparkSession, gens: Seq[(Long, Seq[String])],
                          report: DataFrame):
      (DataFrame, Seq[String], Seq[(String, String)]) = {
    val rows = report.select("col_name", "conflict", "reader_type").collect()
    val quarantined = rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq.sorted
    val reader = rows.filterNot(_.getBoolean(1))
      .map(r => r.getString(0) -> r.getString(2)).sortBy(_._1).toSeq
    val unioned = gens.map { case (g, paths) =>
      val df = spark.read.parquet(paths: _*)
      val present = df.schema.fieldNames.toSet
      df.select(lit(g).as("__gen") +: reader.map { case (n, t) =>
        (if (present(n)) col(n) else lit(null)).cast(t).as(n)
      }: _*)
    }.reduce(_.unionByName(_))
    (unioned, quarantined, reader)
  }
}
