package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.AcidTable

/** Incremental consumption OUT of the manifest-versioned ACID table
  * (round 12 cont.) — the source-side twin of [[StreamingAcid]]'s sink:
  * downstream jobs tail the table version by version instead of
  * re-scanning it, the pattern every lakehouse's streaming source
  * implements (Delta/Iceberg incremental reads) and the inverse of the
  * reference's re-download-everything daily run
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:38-39`).
  *
  * The INCREMENT of version N is the set of data files N references that
  * N−1 did not — for an `append` commit exactly the appended rows, read
  * without touching any carried file (O(new data) per version, never
  * O(table)). Non-append commits (overwrite / compact / merge / delete)
  * rewrite files, so their added-files rows are NOT a logical row delta;
  * [[tail]] fails fast on them by default and only with
  * `allowNonAppend = true` delivers the rewritten files verbatim
  * (Delta's `ignoreChanges` semantics: correct for idempotent-by-key
  * consumers, may redeliver carried-along neighbours — the caller opted
  * in). The logical delta of a rewrite is [[AcidTable.changesBetween]].
  *
  * Exactly-once delivery across restarts comes from a marker-file
  * checkpoint: after the caller's `process` returns for version N, a
  * `v<N>.done` marker is created EXCLUSIVELY (the same no-overwrite gate
  * as manifest publish). Crash between process and marker ⇒ the version
  * replays (at-least-once at the callback); a consumer that lands its
  * effect through an idempotent write ([[AcidTable.commitAppendOnce]],
  * `IndexStore`-style per-batch layouts) converges to exactly-once — the
  * identical contract Structured Streaming's foreachBatch gives, rebuilt
  * on table versions instead of source offsets. */
object AcidTail {

  /** Root-relative data files version `v` references that `v−1` (or
    * nothing, for the first version) does not. */
  def addedFiles(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val cur = AcidTable.entriesOf(spark, root, v).map(_.path)
    val prevVs = AcidTable.versions(spark, root).filter(_ < v)
    val prev =
      if (prevVs.isEmpty) Set.empty[String]
      else AcidTable.entriesOf(spark, root, prevVs.max).map(_.path).toSet
    cur.filterNot(prev)
  }

  /** The increment of version `v` as a DataFrame — `None` when the commit
    * added no files (a pure retention commit). Schema comes from the
    * version's own files. */
  def readAdded(spark: SparkSession, root: String, v: Long): Option[DataFrame] = {
    val added = addedFiles(spark, root, v)
    if (added.isEmpty) None
    else Some(spark.read.parquet(added.map(p => s"$root/$p"): _*))
  }

  private def markerPath(checkpointDir: String, v: Long): Path =
    new Path(s"$checkpointDir/v$v.done")

  /** Versions whose markers exist under `checkpointDir`. */
  def processedVersions(spark: SparkSession, root: String,
                        checkpointDir: String): Set[Long] = {
    val dir = new Path(checkpointDir)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".done") =>
        n.stripPrefix("v").stripSuffix(".done").toLong
    }.toSet
  }

  /** Deliver every unprocessed version's increment to `process`, in
    * version order, advancing the marker checkpoint after each. Returns
    * the versions processed THIS call (a replay of a fully-processed
    * table returns empty and reads no data). A concurrent tailer racing
    * to the same marker loses the create and skips the version — each
    * increment is delivered at most once per checkpoint directory. */
  def tail(spark: SparkSession, root: String, checkpointDir: String,
           allowNonAppend: Boolean = false)(
      process: (DataFrame, Long) => Unit): Seq[Long] = {
    val f = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(checkpointDir))
    val done = processedVersions(spark, root, checkpointDir)
    val pending = AcidTable.versions(spark, root).filterNot(done)
    pending.flatMap { v =>
      val action = AcidTable.actionOf(spark, root, v)
      if (action != "append" && !allowNonAppend)
        throw new IllegalStateException(
          s"AcidTail: version $v of $root is a '$action' commit — its " +
            "added files are a REWRITE, not a row delta. Consume it via " +
            "AcidTable.changesBetween, or pass allowNonAppend=true to " +
            "receive the rewritten files verbatim (idempotent-by-key " +
            "consumers only)")
      readAdded(spark, root, v).foreach(df => process(df, v))
      // marker AFTER the callback: crash in between replays the version
      advanceMarker(spark, checkpointDir, v)
    }
  }

  /** Create version `v`'s marker exclusively (the manifest-publish rename
    * gate). Some(v) if THIS caller won it; None if a concurrent tailer
    * already had. */
  private def advanceMarker(spark: SparkSession, checkpointDir: String,
                            v: Long): Option[Long] = {
    val f = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$checkpointDir/.v$v-${java.util.UUID.randomUUID()}.tmp")
    scala.util.Using.resource(f.create(tmp, true)) { o =>
      o.write(s"$v\n".getBytes(StandardCharsets.UTF_8))
    }
    val fc = FileContext.getFileContext(
      f.makeQualified(markerPath(checkpointDir, v)).toUri,
      spark.sparkContext.hadoopConfiguration)
    try { fc.rename(tmp, markerPath(checkpointDir, v), Options.Rename.NONE); Some(v) }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false); None // concurrent tailer won the marker
    }
  }

  /** CDC tail (round 12 cont.): deliver each unprocessed version's
    * LOGICAL ROW DELTA — [[AcidTable.changesBetween]] against the
    * version's predecessor, correct for EVERY commit action because a
    * rewrite's carried-identical rows cancel in the feed (where [[tail]]
    * must fail fast on non-append commits, this is the consumer that
    * handles them). The first version feeds its whole snapshot as
    * 'added' rows (old_ columns null — the same shape a prior empty
    * version would produce). Same marker checkpoint and replay contract
    * as [[tail]]; `keys` must be unique per snapshot. */
  def tailChanges(spark: SparkSession, root: String, checkpointDir: String,
                  keys: Seq[String], tracked: Seq[String])(
      process: (DataFrame, Long) => Unit): Seq[Long] = {
    import org.apache.spark.sql.functions._
    val f = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(checkpointDir))
    val done = processedVersions(spark, root, checkpointDir)
    val all = AcidTable.versions(spark, root)
    all.filterNot(done).flatMap { v =>
      val feed = all.filter(_ < v).lastOption match {
        case Some(prev) =>
          AcidTable.changesBetween(spark, root, prev, v, keys, tracked)._1
        case None =>
          val snap = AcidTable.readAsOf(spark, root, v)
          snap.select(
            keys.map(col) ++
              tracked.map(c => lit(null).cast(snap.schema(c).dataType)
                .as(s"old_$c")) ++
              tracked.map(c => col(c).as(s"new_$c")) :+
              lit("added").as("change_type"): _*)
      }
      process(feed, v)
      advanceMarker(spark, checkpointDir, v)
    }
  }
}
