package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.AcidTable

/** Incremental consumption OUT of the manifest-versioned ACID table
  * (round 12 cont.) — the source-side twin of [[StreamingAcid]]'s sink:
  * downstream jobs tail the table version by version instead of
  * re-scanning it, the pattern every lakehouse's streaming source
  * implements (Delta/Iceberg incremental reads) and the inverse of the
  * reference's re-download-everything daily run
  * (`data_collection/dags/stock_data_airflow_local_aws_s3.py:38-39`).
  * Round 13 adds the same contract as a REAL Structured Streaming source
  * ([[graft.sources.AcidSource]], `spark.readStream.format("graft-acid")`)
  * — this driver-loop form stays for callers that want the increment as
  * a batch DataFrame with full relational surface.
  *
  * The INCREMENT of version N is the set of data files N references that
  * N−1 does not — for an `append` commit exactly the appended rows, read
  * without touching any carried file (O(new data) per version, never
  * O(table)). Non-append commits (overwrite / compact / merge / delete)
  * rewrite files, so their added-files rows are NOT a logical row delta;
  * [[tail]] fails fast on them by default and only with
  * `allowNonAppend = true` delivers the rewritten files verbatim
  * (Delta's `ignoreChanges` semantics: correct for idempotent-by-key
  * consumers, may redeliver carried-along neighbours — the caller opted
  * in). The logical delta of a rewrite is [[AcidTable.changesBetween]].
  *
  * Delivery contract, precisely (ADVICE r12): the callback is
  * AT-LEAST-ONCE — `process` runs BEFORE the version's marker is
  * claimed, so a crash in between replays the version, and two tailers
  * racing the same checkpoint directory can BOTH invoke the callback for
  * a version (exactly one of them then wins the marker). What is
  * at-most-once per checkpoint directory is the RETURNED/checkpointed
  * version list. A consumer that lands its effect through an idempotent
  * write ([[AcidTable.commitAppendOnce]], `IndexStore`-style per-batch
  * layouts) therefore converges to exactly-once — the identical contract
  * Structured Streaming's foreachBatch gives, rebuilt on table versions
  * instead of source offsets.
  *
  * [[tail]] and [[tailChanges]] keep SEPARATE marker namespaces
  * (`v<N>.done` vs `v<N>.cdc.done`) in a checkpoint directory: the two
  * modes deliver different payloads for the same version, so one mode's
  * progress must never silently satisfy the other's (ADVICE r12). */
object AcidTail {

  /** Root-relative data files version `v` references that `v−1` does
    * not. Fails fast when `v`'s predecessor manifests were RETIRED by
    * [[AcidTable.vacuum]] (no manifest older than `v` survives and `v`
    * is not the genuine first version): treating a post-vacuum snapshot
    * as an increment would silently redeliver every already-processed
    * row — the consumer must restart from a fresh checkpoint instead
    * (Delta/Iceberg sources fail the same way). */
  def addedFiles(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val cur = AcidTable.entriesOf(spark, root, v).map(_.path)
    val prevVs = AcidTable.versions(spark, root).filter(_ < v)
    if (prevVs.isEmpty && v != 1L)
      throw new IllegalStateException(
        s"AcidTail: version ${v - 1} of $root (the predecessor of $v) was " +
          "retired by vacuum — the increment of v" + v + " can no longer " +
          "be computed, and delivering its snapshot would redeliver every " +
          "already-processed row. Restart this consumer from a fresh " +
          "checkpoint (full snapshot + subsequent increments)")
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

  // the two tailing modes deliver different payloads for the same
  // version — their markers must never satisfy each other
  private val IncMarker = "done"
  private val CdcMarker = "cdc.done"

  private def markerPath(checkpointDir: String, v: Long, kind: String): Path =
    new Path(s"$checkpointDir/v$v.$kind")

  private def markedVersions(spark: SparkSession, checkpointDir: String,
                             kind: String): Set[Long] = {
    val re = (raw"v(\d+)\." + java.util.regex.Pattern.quote(kind) + "$").r
    val dir = new Path(checkpointDir)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case re(d) => d.toLong
    }.toSet
  }

  /** Versions whose [[tail]] (file-increment) markers exist under
    * `checkpointDir`. */
  def processedVersions(spark: SparkSession, root: String,
                        checkpointDir: String): Set[Long] =
    markedVersions(spark, checkpointDir, IncMarker)

  /** Versions whose [[tailChanges]] (CDC) markers exist under
    * `checkpointDir`. */
  def processedChangeVersions(spark: SparkSession, root: String,
                              checkpointDir: String): Set[Long] =
    markedVersions(spark, checkpointDir, CdcMarker)

  /** Deliver every unprocessed version's increment to `process`, in
    * version order, claiming the marker checkpoint after each. Returns
    * the versions CHECKPOINTED by this call (a replay of a
    * fully-processed table returns empty and reads no data). The
    * callback itself is at-least-once — see the object doc for the exact
    * contract (crash replay; two racing tailers may both process a
    * version, exactly one checkpoints it). */
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
      if (action == "evolve") { // schema-only commit: no row delta —
        advanceMarker(spark, checkpointDir, v, IncMarker) // just advance
      } else {
      if (action != "append" && !allowNonAppend)
        throw new IllegalStateException(
          s"AcidTail: version $v of $root is a '$action' commit — its " +
            "added files are a REWRITE, not a row delta. Consume it via " +
            "AcidTable.changesBetween, or pass allowNonAppend=true to " +
            "receive the rewritten files verbatim (idempotent-by-key " +
            "consumers only)")
      readAdded(spark, root, v).foreach(df => process(df, v))
      // marker AFTER the callback: crash in between replays the version
      advanceMarker(spark, checkpointDir, v, IncMarker)
      }
    }
  }

  /** Create version `v`'s marker exclusively (the manifest-publish rename
    * gate). Some(v) if THIS caller won it; None if a concurrent tailer
    * already had. */
  private def advanceMarker(spark: SparkSession, checkpointDir: String,
                            v: Long, kind: String): Option[Long] = {
    val f = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$checkpointDir/.v$v-${java.util.UUID.randomUUID()}.tmp")
    scala.util.Using.resource(f.create(tmp, true)) { o =>
      o.write(s"$v\n".getBytes(StandardCharsets.UTF_8))
    }
    if (graft.util.AtomicPublish(f, spark.sparkContext.hadoopConfiguration,
        tmp, markerPath(checkpointDir, v, kind))) Some(v)
    else None // concurrent tailer won the marker
  }

  /** CDC tail (round 12 cont.): deliver each unprocessed version's
    * LOGICAL ROW DELTA — [[AcidTable.changesBetween]] against the
    * version's predecessor, correct for EVERY commit action because a
    * rewrite's carried-identical rows cancel in the feed (where [[tail]]
    * must fail fast on non-append commits, this is the consumer that
    * handles them). Version 1 — the genuine first version — feeds its
    * whole snapshot as 'added' rows (old_ columns null, the shape a
    * prior empty version would produce); a LATER version with no
    * surviving predecessor means vacuum retired it, and the tail fails
    * fast instead of silently replaying the snapshot (ADVICE r12). Same
    * marker-checkpoint shape and at-least-once-at-the-callback contract
    * as [[tail]] (object doc), in its own `v<N>.cdc.done` namespace;
    * `keys` must be unique per snapshot. */
  def tailChanges(spark: SparkSession, root: String, checkpointDir: String,
                  keys: Seq[String], tracked: Seq[String])(
      process: (DataFrame, Long) => Unit): Seq[Long] = {
    import org.apache.spark.sql.functions._
    val f = new Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(checkpointDir))
    val done = processedChangeVersions(spark, root, checkpointDir)
    val all = AcidTable.versions(spark, root)
    all.filterNot(done).flatMap { v =>
      val feed = all.filter(_ < v).lastOption match {
        case Some(prev) =>
          AcidTable.changesBetween(spark, root, prev, v, keys, tracked)._1
        case None if v == 1L =>
          val snap = AcidTable.readAsOf(spark, root, v)
          snap.select(
            keys.map(col) ++
              tracked.map(c => lit(null).cast(snap.schema(c).dataType)
                .as(s"old_$c")) ++
              tracked.map(c => col(c).as(s"new_$c")) :+
              lit("added").as("change_type"): _*)
        case None =>
          throw new IllegalStateException(
            s"AcidTail: version ${v - 1} of $root (the predecessor of $v) " +
              "was retired by vacuum — the change feed of v" + v + " can " +
              "no longer be computed. Restart this consumer from a fresh " +
              "checkpoint")
      }
      process(feed, v)
      advanceMarker(spark, checkpointDir, v, CdcMarker)
    }
  }
}
