package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import graft.operators.AcidTable

/** The graft-acid table's DataSourceV2 WRITE path (round 14 — VERDICT
  * r13 #2): `df.write.format("graft-acid").mode("append"|"overwrite")`
  * lands a manifest version through [[AcidTable.commitRebase]], and
  * `df.writeStream.format("graft-acid")` is an exactly-once streaming
  * sink — each epoch's commit carries the idempotency token
  * `stream-<queryId>-<epochId>`, so a replayed micro-batch no-ops on the
  * already-landed version (the [[AcidTable.commitAppendOnce]] contract,
  * now reachable without hand-rolling foreachBatch).
  *
  * Write protocol (the manifest trick end-to-end): each TASK writes one
  * immutable parquet file under `root/data/<writeId>/` — unreferenced,
  * so concurrent readers cannot see it — and sends its root-relative
  * path back as the commit message; the DRIVER's job commit collects the
  * paths, reads footer stats for `statsCols` (kilobytes per file), and
  * publishes ONE manifest through the optimistic-rebase gate. A failed
  * or speculative task's file simply stays unreferenced-invisible
  * (aborts also delete it, but correctness never depends on that —
  * exactly the property object stores need). Appends rebase onto any
  * concurrent head; overwrite is last-writer-wins, the replace-the-table
  * contract.
  *
  * The task-side writer encodes InternalRows straight into parquet
  * through parquet-hadoop's Group API against the SAME primitive-column
  * surface the read path decodes (long/int/double/float/boolean/string/
  * binary + DATE/micros-TIMESTAMP) — no Spark parquet sink underneath,
  * so the path works from any DSv2-speaking engine. Executors open
  * files with a fresh Hadoop Configuration (the read path's documented
  * local/HDFS contract; an object-store deployment threads the
  * serialized conf through, a plumbing change).
  *
  * Bootstrap contract: the DSv2 surface appends to / overwrites an
  * EXISTING table (schema inference needs a committed version — create
  * the table with [[AcidTable.commitOverwrite]] / commitAppend first).
  * Rows-written accounting: zero-row task files are dropped at commit,
  * EXCEPT when an overwrite would otherwise publish an empty manifest —
  * one schema-bearing empty file is kept (a zero-file version has no
  * schema source). */
object AcidWrite {

  /** Spark StructType → parquet MessageType, the write-side twin of
    * [[AcidSource.schemaOfParquet]] (all fields optional — Spark's own
    * parquet writer does the same for nullable columns). */
  def parquetSchemaOf(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val fb = f.dataType match {
        case LongType => Types.optional(INT64)
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case IntegerType => Types.optional(INT32)
        case DateType => Types.optional(INT32).as(
          LogicalTypeAnnotation.dateType())
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType => Types.optional(BINARY).as(
          LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(BINARY)
        case other => throw new IllegalArgumentException(
          s"graft-acid write supports primitive columns; '${f.name}' is " +
            s"$other")
      }
      b.addField(fb.named(f.name))
    }
    b.named("graft_acid")
  }

  private[sources] def statsColsOf(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : Seq[String] =
    Option(options.get("statsCols")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  private[sources] def deleteFiles(root: String, rels: Seq[String]): Unit = {
    val conf = new Configuration()
    rels.foreach { rel =>
      val p = new Path(s"$root/$rel")
      val fs = p.getFileSystem(conf)
      fs.delete(p, false)
      ()
    }
  }

  /** One schema-bearing EMPTY parquet file, written by the DRIVER
    * (ADVICE r14): an overwrite of an empty 0-partition DataFrame runs
    * NO tasks, so `keepOneIfAllEmpty` has no empty task file to keep —
    * without this, the published zero-file 'overwrite' manifest would
    * have no schema source and every read of the head would fail until
    * the next commit. */
  private[sources] def driverEmptyFile(root: String, dir: String,
                                       schema: StructType): AcidWriteMessage = {
    val w = new AcidDataWriter(root, s"$dir/part-driver-empty.parquet", schema)
    w.commit().asInstanceOf[AcidWriteMessage]
  }

  /** Shared job-commit step: drop zero-row files (deleting them), keep
    * one schema-bearing empty file when `keepOneIfAllEmpty`, and return
    * the manifest entries for what survives. */
  private[sources] def entriesOfMessages(
      spark: SparkSession, root: String,
      messages: Array[WriterCommitMessage], statsCols: Seq[String],
      keepOneIfAllEmpty: Boolean): Seq[AcidTable.Entry] = {
    val msgs = messages.collect { case m: AcidWriteMessage => m }.toSeq
      .sortBy(_.relPath)
    val (full, empty) = msgs.partition(_.rows > 0L)
    val kept =
      if (full.nonEmpty) full
      else if (keepOneIfAllEmpty && empty.nonEmpty) empty.take(1)
      else Seq.empty
    deleteFiles(root, msgs.diff(kept).map(_.relPath))
    AcidTable.entriesForFiles(spark, root, kept.map(_.relPath), statsCols)
  }
}

/** One task's committed file: root-relative path + row count. */
case class AcidWriteMessage(relPath: String, rows: Long)
  extends WriterCommitMessage

class AcidWriteBuilder(info: LogicalWriteInfo,
                       tableOptions: org.apache.spark.sql.util.CaseInsensitiveStringMap)
  extends WriteBuilder with SupportsTruncate {
  // the save() path carries root/statsCols in the WRITE options; a
  // catalog-resolved INSERT INTO carries only the TABLE's options
  private def merged = {
    val m = new java.util.HashMap[String, String](
      tableOptions.asCaseSensitiveMap())
    m.putAll(info.options().asCaseSensitiveMap())
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(m)
  }
  private val root = AcidSource.rootOf(merged)
  private val statsCols = AcidWrite.statsColsOf(merged)
  private var replaceAll = false
  override def truncate(): WriteBuilder = { replaceAll = true; this }
  override def build(): Write = {
    AcidWrite.parquetSchemaOf(info.schema()) // fail fast on exotic types
    // mergeSchema append (round 15): reconcile the drifted frame's
    // schema into the table's NOW — a conflict aborts before any task
    // writes; the widened union publishes as the commit's `#schema:`
    // header. Overwrites replace the schema wholesale (no union).
    val evolveTo: Option[StructType] =
      if (!merged.getBoolean("mergeSchema", false) || replaceAll) None
      else Some(AcidTable.widenUnion(root,
        AcidTable.currentSchema(org.apache.spark.sql.SparkSession.active,
          root), info.schema()))
    new Write {
      override def toBatch: BatchWrite =
        new AcidBatchWrite(root, info.schema(), statsCols, replaceAll,
          info.queryId(), evolveTo)
      override def toStreaming: StreamingWrite = {
        require(!replaceAll,
          "graft-acid streaming writes are append-only (complete/update " +
            "output modes would rewrite the table every epoch)")
        new AcidStreamingWrite(root, info.schema(), statsCols,
          info.queryId())
      }
    }
  }
}

class AcidBatchWrite(root: String, schema: StructType,
                     statsCols: Seq[String], replaceAll: Boolean,
                     writeId: String,
                     evolveTo: Option[StructType] = None) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AcidDataWriterFactory(root, s"data/dsv2-$writeId", schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    // a 0-partition overwrite ran no tasks at all — the driver writes
    // the one schema-bearing empty file keepOneIfAllEmpty would keep
    val withSchema: Array[WriterCommitMessage] =
      if (replaceAll && !messages.exists(_.isInstanceOf[AcidWriteMessage]))
        Array(AcidWrite.driverEmptyFile(root, s"data/dsv2-$writeId", schema))
      else messages
    val entries = AcidWrite.entriesOfMessages(spark, root, withSchema,
      statsCols, keepOneIfAllEmpty = replaceAll)
    if (replaceAll)
      AcidTable.commitRebase(spark, root, "overwrite", Nil, entries,
        replaceAll = true)
    else if (entries.nonEmpty)
      AcidTable.commitRebase(spark, root, "append", Nil, entries,
        schemaHeader = evolveTo)
    else if (evolveTo.isDefined)
      // an all-empty mergeSchema append still evolves the schema —
      // the caller declared the new shape, publish it data-free
      AcidTable.commitRebase(spark, root, "evolve", Nil, Nil,
        schemaHeader = evolveTo)
    () // an all-empty plain append publishes nothing
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AcidWrite.deleteFiles(root,
      messages.collect { case m: AcidWriteMessage => m.relPath }.toSeq)
}

/** Exactly-once streaming sink: the epoch id IS the idempotency token.
  * Structured Streaming replays an epoch whenever the driver dies
  * between the sink commit and the offset-log write — the replayed
  * commit finds `stream-<queryId>-<epochId>` already published and
  * no-ops, so at-least-once delivery converges to exactly-once table
  * state (queryId is stable across restarts; runId is not). */
class AcidStreamingWrite(root: String, schema: StructType,
                         statsCols: Seq[String], queryId: String)
  extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new AcidStreamingDataWriterFactory(root, s"data/dsv2-$queryId", schema)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val token = s"stream-$queryId-$epochId"
    AcidTable.tokenVersion(spark, root, token) match {
      case Some(_) => // replayed epoch: drop its re-written files, no-op
        AcidWrite.deleteFiles(root,
          messages.collect { case m: AcidWriteMessage => m.relPath }.toSeq)
      case None =>
        val entries = AcidWrite.entriesOfMessages(spark, root, messages,
          statsCols, keepOneIfAllEmpty = false)
        if (entries.nonEmpty)
          AcidTable.commitRebase(spark, root, "append", Nil, entries,
            token = Some(token))
        () // empty micro-batch: no version
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    AcidWrite.deleteFiles(root,
      messages.collect { case m: AcidWriteMessage => m.relPath }.toSeq)
}

class AcidDataWriterFactory(root: String, dir: String, schema: StructType,
                            alignTrailing: Boolean = false)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new AcidDataWriter(root, f"$dir/part-$partitionId%05d-$taskId.parquet",
      schema, alignTrailing)
}

class AcidStreamingDataWriterFactory(root: String, dir: String,
                                     schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new AcidDataWriter(root,
      f"$dir/e$epochId-part-$partitionId%05d-$taskId.parquet", schema)
}

/** One task → one parquet file, encoded through the Group API. The
  * (partitionId, taskId) file name is attempt-unique, so speculative or
  * retried attempts write DIFFERENT files and only the committed
  * message's path ever reaches a manifest.
  *
  * `alignTrailing` (round 14, row-level rewrites only): Spark's
  * group-based DELETE/UPDATE/MERGE plans prepend a `__row_operation`
  * metadata column to the replacement rows and — when the operation
  * declares no metadata attributes — hands them to the writer
  * UNPROJECTED (ReplaceDataExec only applies its row projection on the
  * metadata-writing task). The table columns are the TRAILING fields,
  * so the writer reads each row at `numFields - schema.length` offset;
  * the strict append/overwrite paths keep the exact-arity contract. */
class AcidDataWriter(root: String, relPath: String, schema: StructType,
                     alignTrailing: Boolean = false)
  extends DataWriter[InternalRow] {

  private val msg = AcidWrite.parquetSchemaOf(schema)
  private val groups = new SimpleGroupFactory(msg)
  private val writer = ExampleParquetWriter.builder(
      new Path(s"$root/$relPath"))
    .withConf(new Configuration())
    .withType(msg)
    .withWriteMode(ParquetFileWriter.Mode.CREATE)
    .build()
  private var rows = 0L
  private var open = true

  override def write(r: InternalRow): Unit = {
    val off =
      if (!alignTrailing) 0
      else {
        val o = r.numFields - schema.length
        require(o >= 0, s"row has ${r.numFields} fields for a " +
          s"${schema.length}-column table")
        o
      }
    val g = groups.newGroup()
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val j = i + off
      if (!r.isNullAt(j)) f.dataType match {
        case LongType | TimestampType => g.add(f.name, r.getLong(j))
        case IntegerType | DateType => g.add(f.name, r.getInt(j))
        case DoubleType => g.add(f.name, r.getDouble(j))
        case FloatType => g.add(f.name, r.getFloat(j))
        case BooleanType => g.add(f.name, r.getBoolean(j))
        case StringType => g.add(f.name,
          Binary.fromReusedByteArray(r.getUTF8String(j).getBytes))
        case BinaryType => g.add(f.name,
          Binary.fromConstantByteArray(r.getBinary(j)))
        case other => throw new IllegalArgumentException(
          s"graft-acid: unsupported write type $other for '${f.name}'")
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (open) { writer.close(); open = false }
    AcidWriteMessage(relPath, rows)
  }

  override def abort(): Unit = {
    if (open) { writer.close(); open = false }
    val p = new Path(s"$root/$relPath")
    p.getFileSystem(new Configuration()).delete(p, false)
    ()
  }

  override def close(): Unit =
    if (open) { writer.close(); open = false }
}
