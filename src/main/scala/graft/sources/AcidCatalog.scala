package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.AcidTable

/** SQL-surface catalog for graft-acid tables (round 14 — VERDICT r13
  * #6): register once —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.acid", "graft.sources.AcidCatalog")
  * spark.conf.set("spark.sql.catalog.acid.root", "/tables/base")
  * }}}
  *
  * — and every AcidTable directory under the base becomes a named SQL
  * table: `SELECT ... FROM acid.t`, time travel as `VERSION AS OF n` /
  * `TIMESTAMP AS OF ts` (the first things an analyst types at a
  * lakehouse — Spark parses both natively once the catalog implements
  * the time-travel loadTable overloads), `INSERT INTO acid.t ...`
  * appends THROUGH the DSv2 write path's rebase commit, and
  * `acid.t.history` reads the commit log as a metadata table (version /
  * action / n_files / ts — the DESCRIBE HISTORY surface, resolved like
  * Delta's `table.history`). Nested namespaces map to subdirectories
  * (`acid.ns.t` → `<base>/ns/t`).
  *
  * DDL is out of scope by design: tables are CREATED by the engine API
  * (a zero-file manifest has no schema source, so an empty CREATE TABLE
  * would be unreadable); create/alter/drop/rename fail fast with the
  * pointer. O(manifest) everywhere — resolution stats one directory,
  * never lists data files. */
class AcidCatalog extends TableCatalog {

  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = options.get("root")
    require(base != null && base.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.root = <base dir>")
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootOf(segs: Seq[String]): String =
    (base +: segs).mkString("/")

  private def isTable(root: String): Boolean = {
    val m = new Path(s"$root/_manifests")
    fs(m).exists(m)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path(rootOf(namespace.toSeq))
    val f = fs(dir)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(rootOf(namespace.toSeq :+ n)))
      .sorted
      .map(Identifier.of(namespace, _))
  }

  private def tableFor(root: String, extra: Map[String, String]): Table = {
    val opts = new util.HashMap[String, String]()
    opts.put("root", root)
    extra.foreach { case (k, v) => opts.put(k, v) }
    val cis = new CaseInsensitiveStringMap(opts)
    new AcidSourceTable(AcidSource.tableSchema(spark, root), cis)
  }

  override def loadTable(ident: Identifier): Table = {
    val segs = ident.namespace().toSeq :+ ident.name()
    val root = rootOf(segs)
    if (isTable(root)) tableFor(root, Map.empty)
    // `acid.t.history` / `acid.t.detail`: the commit log and the
    // physical summary of table `t` as metadata tables
    else if (ident.name() == "history" && segs.length >= 2 &&
        isTable(rootOf(segs.dropRight(1))))
      new AcidHistoryTable(rootOf(segs.dropRight(1)))
    else if (ident.name() == "detail" && segs.length >= 2 &&
        isTable(rootOf(segs.dropRight(1))))
      new AcidDetailTable(rootOf(segs.dropRight(1)))
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException(ident)
  }

  /** `VERSION AS OF v` — Spark hands the version literal through. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident.namespace().toSeq :+ ident.name())
    if (!isTable(root))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    tableFor(root, Map("asOfVersion" -> version))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROS since epoch; resolve to
    * the latest version committed at-or-before it (the readAsOfTimestamp
    * contract) and pin that version. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootOf(ident.namespace().toSeq :+ ident.name())
    if (!isTable(root))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val tsMillis = Math.floorDiv(timestampMicros, 1000L)
    val vs = AcidTable.versions(spark, root)
      .filter(v => AcidTable.commitTimestamp(spark, root, v) <= tsMillis)
    require(vs.nonEmpty,
      s"$root has no version committed at or before $tsMillis")
    tableFor(root, Map("asOfVersion" -> vs.last.toString))
  }

  private def ddlUnsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-acid catalog does not support $what — tables are created " +
        "and retired through the engine API (AcidTable.commitOverwrite / " +
        "vacuum); a zero-file CREATE TABLE would have no schema source")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    ddlUnsupported("CREATE TABLE")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    ddlUnsupported("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    ddlUnsupported("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    ddlUnsupported("RENAME TABLE")
}

/** `acid.t.history` — the commit log as a read-only metadata table:
  * (version, action, n_files, ts_millis), one row per published
  * version, O(manifest) to serve (the DESCRIBE HISTORY surface). */
class AcidHistoryTable(root: String) extends Table with SupportsRead {
  private val tableSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("ts_millis", LongType, nullable = false)))

  override def name(): String = s"graft-acid history $root"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val spark = SparkSession.active
          val rows = AcidTable.history(spark, root).map { case (v, a, n) =>
            (v, a, n, AcidTable.commitTimestamp(spark, root, v))
          }
          Array(AcidHistoryPartition(rows))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val rows = p.asInstanceOf[AcidHistoryPartition].rows
              new PartitionReader[InternalRow] {
                private var i = -1
                override def next(): Boolean = { i += 1; i < rows.length }
                override def get(): InternalRow = {
                  val (v, a, n, ts) = rows(i)
                  new GenericInternalRow(Array[Any](v,
                    UTF8String.fromString(a), n, ts))
                }
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

case class AcidHistoryPartition(rows: Seq[(Long, String, Int, Long)])
  extends InputPartition

/** `acid.t.detail` — DESCRIBE DETAIL as a one-row metadata table (the
  * [[graft.operators.AcidTable.detail]] gauges through SQL). The row is
  * folded on the DRIVER at plan time — O(manifest), sizes from the
  * manifest's `sz:` segments where recorded. */
class AcidDetailTable(root: String) extends Table with SupportsRead {
  private val tableSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("last_action", StringType, nullable = false),
    StructField("n_versions", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_masked_files", LongType, nullable = false),
    StructField("n_masks", LongType, nullable = false),
    StructField("data_bytes", LongType, nullable = false),
    StructField("mask_bytes", LongType, nullable = false),
    StructField("last_checkpoint", LongType, nullable = false)))

  override def name(): String = s"graft-acid detail $root"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val r = AcidTable.detail(SparkSession.active, root).head()
          Array(AcidDetailPartition((r.getLong(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getLong(7), r.getLong(8))))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val t = p.asInstanceOf[AcidDetailPartition].row
              new PartitionReader[InternalRow] {
                private var served = false
                override def next(): Boolean = {
                  val n = !served; served = true; n
                }
                override def get(): InternalRow = new GenericInternalRow(
                  Array[Any](t._1, UTF8String.fromString(t._2), t._3,
                    t._4, t._5, t._6, t._7, t._8, t._9))
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

case class AcidDetailPartition(
    row: (Long, String, Long, Long, Long, Long, Long, Long, Long))
  extends InputPartition
