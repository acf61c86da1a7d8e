package graft.operators

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import scala.util.Using
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-versioned parquet table: snapshot isolation + time travel
  * (round 11 — the lakehouse seam the reference's overwrite-in-place S3
  * layout papers over, `data_collection/dags/stock_data_airflow_local_
  * aws_s3.py:67-92`: its daily run rewrites `stock_data/{symbol}.csv`, so
  * a reader racing the writer sees a torn table and yesterday's state is
  * gone the moment today's lands).
  *
  * The fix is the standard manifest trick (Iceberg/Delta's core idea,
  * rebuilt here from first principles because neither ships offline):
  * data files are IMMUTABLE and INVISIBLE until a numbered manifest
  * references them, so
  *
  *  - a COMMIT is: (1) write new parquet files under `root/data/<uuid>/`
  *    — unreferenced, so concurrent readers cannot see them — then
  *    (2) publish `root/_manifests/v<N+1>.manifest`, a text file listing
  *    every live data file (relative paths). The manifest body is written
  *    to a `.tmp` name first and RENAMED into place without overwrite
  *    (round 12): the manifest is never visible half-written, and two
  *    writers racing to the same version → exactly one rename wins, the
  *    loser fails fast with [[Conflict]] and must re-read + retry
  *    (optimistic concurrency — documented limit: on a filesystem without
  *    atomic no-overwrite rename, e.g. bare S3 without a conditional-put
  *    layer, the exclusion window narrows to the PUT race; run against
  *    HDFS/S3+strong-consistency-layer for the hard guarantee);
  *  - a READ resolves ONE manifest (latest, or `asOf(version)`) and plans
  *    from its file list — O(manifest) planning, NO directory listing (at
  *    100 TB an object-store LIST over millions of files is the slowest
  *    and least consistent operation a reader can issue), and perfect
  *    snapshot isolation: a reader holding version N's file list is
  *    untouched by any number of later commits, because no commit ever
  *    mutates or deletes a referenced file;
  *  - TIME TRAVEL is free: old manifests keep referencing old files until
  *    [[vacuum]] explicitly retires them.
  *
  * Round 12 adds the three file-granularity pieces a 100 TB table needs:
  *
  *  - FILE STATS + DATA SKIPPING: each manifest line may carry per-file
  *    column min/max (`path|col:min:max,...`, read from the committed
  *    parquet FOOTERS — kilobytes per commit, never a data scan);
  *    [[readWhere]] drops files whose ranges exclude the predicate BEFORE
  *    planning and reports (files scanned, files total) as facts. Combined
  *    with [[Layout.zorderBy]] the skipping bites on several clustered
  *    columns at once. A file without stats for a predicate column is
  *    never pruned (safety over savings).
  *  - COPY-ON-WRITE [[mergeCow]] / [[deleteCow]]: locate the files whose
  *    key range can contain a touched key (via the same stats), rewrite
  *    ONLY those, and publish untouched-by-reference ∪ rewritten as the
  *    next version — a 1k-row upsert into a 100 TB table rewrites the few
  *    files that hold those keys, not the table. Untouched manifest lines
  *    are carried verbatim (byte-identical paths AND stats).
  *  - SCHEMA-RECONCILED READS: [[readReconciled]] groups a version's files
  *    by originating commit, reads their schemas (footers only), and
  *    applies [[SchemaEvolution]]'s widening/quarantine policy instead of
  *    letting whichever footer wins silently resolve drifted appends.
  *
  * Append vs overwrite: `append` publishes prev-live ∪ new files;
  * `overwrite` publishes new files only (the old ones stay on disk for
  * time travel). Version diff composes [[SnapshotDiff.diff]] over two
  * resolved snapshots — the ship-the-delta machinery q_diff1/2 already
  * prove.
  */
object AcidTable {

  private val ManifestDir = "_manifests"
  private val DataDir = "data"
  private val Width = 8 // v%08d (parse accepts any digit count — see parseVersion)

  final case class Conflict(version: Long, root: String)
    extends RuntimeException(
      s"AcidTable commit conflict: version $version at $root was published " +
        "by a concurrent writer — re-read the table and retry the commit")

  /** One manifest data-file line: a root-relative path plus optional
    * per-column min/max stats (both inclusive, nulls excluded — a
    * column that is all-null in the file simply carries no stat).
    * Long stats render as `col:min:max`; STRING stats (round 12 cont. —
    * the reference clusters by SYMBOL, a string, `README.md:63`) render
    * as `col:s:<hex(min)>:<hex(max)>` — hex-encoded UTF-8 so a bound may
    * contain the manifest's own separators. A string bound longer than
    * [[MaxStrStatBytes]] drops the whole stat (no prune for that file —
    * safety over savings; the production alternative, Delta-style
    * truncate-and-round-up of the max bound, buys little on key-like
    * columns, which is what string clustering is for). */
  final case class FileStat(col: String, min: Long, max: Long)
  final case class StrStat(col: String, min: String, max: String)
  private val MaxStrStatBytes = 64
  private def hex(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map("%02x".format(_)).mkString
  private def unhex(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      StandardCharsets.UTF_8)
  /** Unsigned UTF-8 byte comparison — the parquet-footer and UTF8String
    * string order (== code-point order; UTF-16 code-unit order is not). */
  private def utf8Cmp(a: String, b: String): Int = {
    val (x, y) = (a.getBytes(StandardCharsets.UTF_8),
      b.getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  final case class Entry(path: String, stats: Seq[FileStat],
                         strStats: Seq[StrStat] = Nil) {
    def render: String = {
      val parts = stats.map(s => s"${s.col}:${s.min}:${s.max}") ++
        strStats.map(s => s"${s.col}:s:${hex(s.min)}:${hex(s.max)}")
      if (parts.isEmpty) path else path + "|" + parts.mkString(",")
    }
    def statFor(c: String): Option[FileStat] = stats.find(_.col == c)
    def strStatFor(c: String): Option[StrStat] = strStats.find(_.col == c)
  }
  private object Entry {
    def parse(line: String): Entry = line.split('|') match {
      case Array(p) => Entry(p, Nil)
      case Array(p, st) =>
        val parsed = st.split(',').toSeq.map { s =>
          s.split(':') match {
            case Array(c, mn, mx) => Left(FileStat(c, mn.toLong, mx.toLong))
            case Array(c, "s", mn, mx) => Right(StrStat(c, unhex(mn), unhex(mx)))
            case _ => throw new IllegalStateException(s"malformed stat: $s")
          }
        }
        Entry(p, parsed.collect { case Left(f) => f },
          parsed.collect { case Right(f) => f })
      case _ => throw new IllegalStateException(s"malformed manifest line: $line")
    }
  }

  /** Inclusive-range predicate for [[readWhere]]: keep rows with
    * `lower <= col <= upper`. Pruning drops a file only when its stats
    * PROVE no row can match — the returned scan is a superset; apply the
    * row filter on top. [[ColRange]] compares long stats; [[StrRange]]
    * compares string stats in UTF-8 BYTE order — the order the parquet
    * footer min/max were computed in AND the order Spark's UTF8String
    * row filter compares in, so the prune decision and the row predicate
    * can never disagree (Scala's String compare is UTF-16 code-unit
    * order, which diverges off the ASCII plane — never use it here). */
  sealed trait ScanRange { def col: String }
  final case class ColRange(col: String, lower: Long, upper: Long)
    extends ScanRange
  final case class StrRange(col: String, lower: String, upper: String)
    extends ScanRange

  final case class PrunedRead(df: DataFrame, filesScanned: Int, filesTotal: Int)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(s"$root/$ManifestDir/v${("%0" + Width + "d").format(v)}.manifest")

  // any digit count: a table past 10^8 versions publishes a 9-digit name
  // that must stay VISIBLE (zero-padding keeps lexical order only below
  // the width; numeric sort below doesn't care)
  private val VersionRe = raw"v(\d+)\.manifest".r
  private def parseVersion(name: String): Option[Long] =
    name match { case VersionRe(d) => Some(d.toLong); case _ => None }

  /** All published versions, ascending (empty for a table that has never
    * committed). One manifest-directory listing — the only LIST a reader
    * ever issues, over the (small) manifest set, never over data files.
    * In-flight `.tmp` bodies don't match the manifest name and are
    * invisible by construction. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(s"$root/$ManifestDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .flatMap(s => parseVersion(s.getPath.getName)).sorted
  }

  def currentVersion(spark: SparkSession, root: String): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"AcidTable at $root has no committed version")
    vs.last
  }

  private def manifestText(spark: SparkSession, root: String, v: Long): String = {
    val f = fs(spark, root)
    val p = manifestPath(root, v)
    require(f.exists(p), s"AcidTable at $root has no version $v")
    Using.resource(f.open(p)) { in =>
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
    }
  }

  private def readManifest(spark: SparkSession, root: String,
                           v: Long): (String, Seq[Entry]) = {
    val lines = manifestText(spark, root, v).linesIterator.toSeq
    val action = lines.headOption match {
      case Some(h) if h.startsWith("#action:") => h.stripPrefix("#action:")
      case _ => throw new IllegalStateException(
        s"manifest v$v at $root is malformed (missing #action header)")
    }
    // header lines beyond #action (e.g. #token:) are metadata, not files
    (action, lines.tail.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(Entry.parse))
  }

  /** The manifest entries (paths + stats) version `v` references — the
    * read-only view incremental consumers ([[graft.streaming.AcidTail]])
    * plan from. */
  def entriesOf(spark: SparkSession, root: String, v: Long): Seq[Entry] =
    readManifest(spark, root, v)._2

  /** The action ('overwrite' | 'append' | 'compact' | 'merge' | 'delete')
    * that published version `v`. */
  def actionOf(spark: SparkSession, root: String, v: Long): String =
    readManifest(spark, root, v)._1

  private def manifestToken(spark: SparkSession, root: String,
                            v: Long): Option[String] =
    manifestText(spark, root, v).linesIterator
      .find(_.startsWith("#token:")).map(_.stripPrefix("#token:"))

  /** The version a given idempotency token already published, if any. */
  def tokenVersion(spark: SparkSession, root: String,
                   token: String): Option[Long] =
    versions(spark, root).find(v => manifestToken(spark, root, v).contains(token))

  /** Write `df` as new immutable parquet files under `root/data/<uuid>/`
    * and return their root-relative paths. The files are unreferenced
    * (invisible to every reader) until a manifest publishes them. */
  private def writeDataFiles(df: DataFrame, root: String): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val dir = s"$DataDir/$commitId"
    df.write.parquet(s"$root/$dir")
    val f = fs(df.sparkSession, root)
    f.listStatus(new Path(s"$root/$dir")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") || n.startsWith("part-"))
      .filterNot(_.startsWith("_"))
      .sorted
      .map(n => s"$dir/$n")
  }

  /** Per-file min/max for `statsCols`, read from the parquet FOOTERS of
    * the just-committed files (row-group stats merged to file level).
    * The footer TYPE decides the stat kind: int32/int64 widen to a long
    * [[FileStat]]; a UTF-8 string column yields a [[StrStat]] (bounds
    * capped at [[MaxStrStatBytes]] UTF-8 bytes — longer drops the stat).
    * A column that is absent, of any other type, or all-null in any row
    * group yields no stat — the file then never prunes on it. Footer
    * reads are kilobytes per file; at cluster scale the same numbers come
    * back from the write tasks' commit messages — the driver-side loop
    * here is the local[*] equivalent. */
  private def footerStats(spark: SparkSession, root: String,
                          relPaths: Seq[String],
                          statsCols: Seq[String]): Seq[Entry] = {
    statsCols.foreach { c =>
      require(!c.exists("|,:".contains(_)),
        s"stats column name '$c' may not contain '|', ',' or ':'")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    relPaths.map { rel =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(s"$root/$rel"), conf)
      val stats = Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(in)) { rd =>
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        statsCols.flatMap { c =>
          val chunks = blocks.map(_.getColumns.asScala.find(_.getPath.toDotString == c))
          if (blocks.isEmpty || chunks.exists(_.isEmpty)) None
          else {
            val ss = chunks.map(_.get.getStatistics)
            if (ss.exists(s => s == null || !s.hasNonNullValue)) None
            else {
              val mins = ss.map(s => statValue(s.genericGetMin.asInstanceOf[AnyRef]))
              val maxs = ss.map(s => statValue(s.genericGetMax.asInstanceOf[AnyRef]))
              if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty)) None
              else (mins.map(_.get), maxs.map(_.get)) match {
                case (mn, mx) if mn.forall(_.isLeft) && mx.forall(_.isLeft) =>
                  // long stats only where the physical int IS the logical
                  // order: plain/signed ints, DATE (epoch days), TIMESTAMP
                  // (epoch micros). An int32-backed DECIMAL's footer
                  // carries UNSCALED values and unsigned ints reorder —
                  // pruning on either would silently compare wrong numbers
                  import org.apache.parquet.schema.LogicalTypeAnnotation._
                  val ann = chunks.head.get.getPrimitiveType.getLogicalTypeAnnotation
                  val longSafe = ann match {
                    case null => true
                    case i: IntLogicalTypeAnnotation => i.isSigned
                    case _: DateLogicalTypeAnnotation => true
                    case _: TimestampLogicalTypeAnnotation => true
                    case _ => false
                  }
                  if (longSafe)
                    Some(Left(FileStat(c,
                      mn.map(_.swap.toOption.get).min, mx.map(_.swap.toOption.get).max)))
                  else None
                case (mn, mx) if mn.forall(_.isRight) && mx.forall(_.isRight) =>
                  val isStr = chunks.head.get.getPrimitiveType
                    .getLogicalTypeAnnotation.isInstanceOf[
                      org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
                  // merge row-group bounds in UTF-8 BYTE order — the order
                  // the footer wrote them in; Scala's default String min/max
                  // is UTF-16 order and diverges off the ASCII plane
                  val byUtf8 = Ordering.fromLessThan[String](utf8Cmp(_, _) < 0)
                  val (lo, hi) = (mn.map(_.toOption.get).min(byUtf8),
                    mx.map(_.toOption.get).max(byUtf8))
                  if (isStr &&
                      lo.getBytes(StandardCharsets.UTF_8).length <= MaxStrStatBytes &&
                      hi.getBytes(StandardCharsets.UTF_8).length <= MaxStrStatBytes)
                    Some(Right(StrStat(c, lo, hi)))
                  else None // non-string binary, or bound too long: no stat
                case _ => None
              }
            }
          }
        }
      }
      Entry(rel, stats.collect { case Left(f) => f },
        stats.collect { case Right(f) => f })
    }
  }

  private def statValue(v: AnyRef): Option[Either[Long, String]] = v match {
    case l: java.lang.Long => Some(Left(l.longValue()))
    case i: java.lang.Integer => Some(Left(i.longValue()))
    case b: org.apache.parquet.io.api.Binary => Some(Right(b.toStringUsingUTF8))
    case _ => None
  }

  private def newEntries(df: DataFrame, root: String,
                         statsCols: Seq[String]): Seq[Entry] = {
    val paths = writeDataFiles(df, root)
    if (statsCols.isEmpty) paths.map(Entry(_, Nil))
    else footerStats(df.sparkSession, root, paths, statsCols)
  }

  /** Publish `files` (pre-rendered manifest lines) as version `v`.
    * Atomicity (round 12, torn-manifest fix): the body is fully written
    * to a same-directory `.tmp` name, then RENAMED to the manifest name
    * with no-overwrite semantics — a reader never observes a half-written
    * manifest, and of two writers racing to the same version exactly one
    * rename succeeds; the loser gets [[Conflict]]. Only the
    * already-exists outcome maps to Conflict — genuine IO failures
    * (permissions, disk full) propagate as themselves.
    * (Package-visible so the spec can drive the exact
    * two-writers-one-version race the version-list read normally hides.) */
  private[operators] def publish(spark: SparkSession, root: String, v: Long,
                                 action: String, files: Seq[String],
                                 token: Option[String] = None): Long = {
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/$ManifestDir"))
    val p = manifestPath(root, v)
    if (f.exists(p)) throw Conflict(v, root)
    val tmp = new Path(s"$root/$ManifestDir/" +
      s".v$v-${java.util.UUID.randomUUID()}.tmp")
    Using.resource(f.create(tmp, /*overwrite=*/ true)) { o =>
      val tokenLine = token.map(t => s"#token:$t\n").getOrElse("")
      val tsLine = s"#ts:${System.currentTimeMillis()}\n"
      o.write((s"#action:$action\n" + tsLine + tokenLine +
          files.mkString("", "\n", "\n"))
        .getBytes(StandardCharsets.UTF_8))
    }
    val fc = FileContext.getFileContext(f.makeQualified(p).toUri,
      spark.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, p, Options.Rename.NONE) // fails if p exists
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false); throw Conflict(v, root)
      case e: Throwable => f.delete(tmp, false); throw e
    }
    v
  }

  private def publishEntries(spark: SparkSession, root: String, v: Long,
                             action: String, entries: Seq[Entry],
                             token: Option[String] = None): Long =
    publish(spark, root, v, action, entries.map(_.render), token)

  /** Commit wall-clock time of version `v` (epoch millis). */
  def commitTimestamp(spark: SparkSession, root: String, v: Long): Long =
    manifestText(spark, root, v).linesIterator
      .find(_.startsWith("#ts:")).map(_.stripPrefix("#ts:").toLong)
      .getOrElse(throw new IllegalStateException(
        s"manifest v$v at $root carries no #ts header"))

  /** Time travel by WALL CLOCK: the table as of `tsMillis` — the latest
    * version whose commit time is at-or-before it (the form users
    * actually ask for; version numbers are the implementation detail).
    * Commit times are strictly usable because versions are published
    * serially through the rename gate — version order and commit-time
    * order agree on one table. */
  def readAsOfTimestamp(spark: SparkSession, root: String,
                        tsMillis: Long): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"AcidTable at $root has no committed version")
    val at = vs.filter(v => commitTimestamp(spark, root, v) <= tsMillis)
    require(at.nonEmpty,
      s"AcidTable at $root has no version committed at or before $tsMillis")
    readAsOf(spark, root, at.last)
  }

  /** Commit `df` as the table's complete new state. Returns the published
    * version. Prior versions stay readable via [[readAsOf]]. Pass
    * `statsCols` to record per-file min/max for those (long) columns in
    * the manifest — the fuel for [[readWhere]]'s data skipping. */
  def commitOverwrite(df: DataFrame, root: String,
                      statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val next = versions(spark, root).lastOption.getOrElse(0L) + 1
    publishEntries(spark, root, next, "overwrite",
      newEntries(df, root, statsCols))
  }

  /** Commit `df` as rows ADDED to the current state (file-level append —
    * keyed upsert is [[mergeCow]]). Returns the published version. Base
    * manifest lines are carried verbatim (paths AND stats). */
  def commitAppend(df: DataFrame, root: String,
                   statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val prev = versions(spark, root).lastOption
    val base = prev.map(readManifest(spark, root, _)._2).getOrElse(Seq.empty)
    publishEntries(spark, root, prev.getOrElse(0L) + 1, "append",
      base ++ newEntries(df, root, statsCols))
  }

  /** The table as of `version` — planned from that manifest's file list
    * alone; later commits never disturb it. */
  def readAsOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    val (_, entries) = readManifest(spark, root, version)
    require(entries.nonEmpty, s"version $version of $root lists no data files")
    spark.read.parquet(entries.map(e => s"$root/${e.path}"): _*)
  }

  /** The latest committed state. */
  def read(spark: SparkSession, root: String): DataFrame =
    readAsOf(spark, root, currentVersion(spark, root))

  /** Data-skipping read (round 12): plan ONLY the files whose manifest
    * min/max ranges can contain a row matching every `range` — the rest
    * are dropped before Spark ever sees their paths. The scan is a
    * SUPERSET of the matching rows (apply the row filter on top);
    * `filesScanned`/`filesTotal` make the saving a reportable FACT. A
    * file with no stats for a predicate column is never pruned. */
  def readWhere(spark: SparkSession, root: String, version: Long,
                ranges: Seq[ScanRange]): PrunedRead = {
    val (_, entries) = readManifest(spark, root, version)
    require(entries.nonEmpty, s"version $version of $root lists no data files")
    val kept = entries.filter { e =>
      ranges.forall {
        case ColRange(c, lo, hi) =>
          e.statFor(c).forall(s => s.max >= lo && s.min <= hi)
        case StrRange(c, lo, hi) =>
          e.strStatFor(c).forall(s => utf8Cmp(s.max, lo) >= 0 && utf8Cmp(s.min, hi) <= 0)
      }
    }
    val df =
      if (kept.nonEmpty) spark.read.parquet(kept.map(e => s"$root/${e.path}"): _*)
      // proven-empty: keep the schema by planning ONE file (any carries
      // it) under a false predicate — never the full O(files) list
      else spark.read.parquet(s"$root/${entries.head.path}").where(lit(false))
    PrunedRead(df, kept.length, entries.length)
  }

  /** (version, action, n_files) for every published version. */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Int)] =
    versions(spark, root).map { v =>
      val (action, entries) = readManifest(spark, root, v)
      (v, action, entries.length)
    }

  /** Replay-idempotent [[commitAppend]] for streaming ingestion
    * (foreachBatch at-least-once delivery): the manifest records the
    * commit's idempotency `token` (e.g. "stream-batch-<id>"); if ANY
    * published manifest already carries it, the commit is a NO-OP
    * returning that version — a replayed micro-batch can never
    * double-append, so at-least-once delivery converges to exactly-once
    * table state. A Conflict loss against a concurrent writer re-checks
    * the token (the winner may have been our own replay) before
    * surfacing. The loser's data files stay unreferenced-invisible, as
    * with every failed commit. Token lookup opens every manifest
    * (O(versions) small reads per commit) — honest at the
    * thousands-of-versions scale this models; past that a production
    * table keeps a token→version side index rebuilt from the manifests
    * it denormalizes. */
  def commitAppendOnce(df: DataFrame, root: String, token: String,
                       statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    tokenVersion(spark, root, token) match {
      case Some(v) => v
      case None =>
        val prev = versions(spark, root).lastOption
        val base = prev.map(readManifest(spark, root, _)._2).getOrElse(Seq.empty)
        try publishEntries(spark, root, prev.getOrElse(0L) + 1, "append",
          base ++ newEntries(df, root, statsCols), Some(token))
        catch {
          case c: Conflict =>
            tokenVersion(spark, root, token).getOrElse(throw c)
        }
    }
  }

  /** Copy-on-write UPSERT (round 12): apply `updates` keyed by the long
    * column `keyCol` — rows whose key exists are replaced, new keys are
    * inserted — rewriting ONLY the files whose `keyCol` min/max range can
    * contain a touched key. Untouched files are carried into the next
    * manifest BY REFERENCE (verbatim lines), so a 1k-row upsert into a
    * 100 TB table rewrites kilofiles, not the table. Correctness does not
    * depend on stats: a file without `keyCol` stats is conservatively
    * rewritten. `updates` must carry the table's schema. Returns
    * (published version, files rewritten, files kept). */
  def mergeCow(updates: DataFrame, root: String, keyCol: String,
               statsCols: Seq[String] = Nil): (Long, Int, Int) =
    mergeCowImpl(updates, root, keyCol, statsCols, strKey = false)

  /** [[mergeCow]] for a STRING key (round 12 cont.) — the reference's
    * actual daily workload is per-SYMBOL re-fetch + upsert
    * (`...py:38-44` loops symbols), and symbols are strings. Touched
    * files are located through the manifest's string stats; comparisons
    * are UTF-8 byte order end-to-end (the parquet footer order, and
    * Spark's own UTF8String order inside the locate join). */
  def mergeCowStr(updates: DataFrame, root: String, keyCol: String,
                  statsCols: Seq[String] = Nil): (Long, Int, Int) =
    mergeCowImpl(updates, root, keyCol, statsCols, strKey = true)

  private def mergeCowImpl(updates: DataFrame, root: String, keyCol: String,
                           statsCols: Seq[String],
                           strKey: Boolean): (Long, Int, Int) =
    cowCommit(updates.sparkSession, root, "merge", statsCols) { entries =>
      val spark = updates.sparkSession
      // touched = files whose range can contain an update key, decided
      // DISTRIBUTED: broadcast the (small, manifest-sized) stats table
      // against the update keys, so a billion-row update set never lands
      // on the driver. Files lacking stats are always touched.
      val (statless, withStats) =
        if (strKey) entries.partition(_.strStatFor(keyCol).isEmpty)
        else entries.partition(_.statFor(keyCol).isEmpty)
      val touchedStatted: Set[String] = if (withStats.isEmpty) Set.empty else {
        import spark.implicits._
        val (statsDf, keyExpr) =
          if (strKey)
            (withStats.map { e =>
              val s = e.strStatFor(keyCol).get; (e.path, s.min, s.max)
            }.toDF("__path", "__min", "__max"),
              col(keyCol).cast("string").as("__k"))
          else
            (withStats.map { e =>
              val s = e.statFor(keyCol).get; (e.path, s.min, s.max)
            }.toDF("__path", "__min", "__max"),
              col(keyCol).cast("long").as("__k"))
        updates.select(keyExpr).distinct()
          .join(broadcast(statsDf),
            col("__k") >= col("__min") && col("__k") <= col("__max"))
          .select("__path").distinct().collect().map(_.getString(0)).toSet
      }
      val statlessPaths = statless.map(_.path).toSet
      val (touched, untouched) = entries.partition(e =>
        statlessPaths.contains(e.path) || touchedStatted.contains(e.path))
      // size the rewrite like its input: N touched files come back as ~N
      // files, not one per shuffle partition — otherwise every COW commit
      // multiplies the file count by the cluster's parallelism and the
      // table shreds itself (the r12 ScaleBench CDF panel caught a
      // 1-block rewrite landing as 33 files). Insert-only merges
      // (touched empty) keep their natural partitioning — that's an
      // append, and compactSmall is the shred fix if batches are tiny.
      val rewritten =
        if (touched.isEmpty) updates
        else {
          val old = spark.read.parquet(touched.map(e => s"$root/${e.path}"): _*)
          old.join(updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
            .unionByName(updates)
            .repartition(touched.length)
        }
      (untouched, rewritten)
    }

  /** Copy-on-write DELETE (round 12): remove rows with
    * `lower <= keyCol <= upper`, rewriting only the files whose stats
    * overlap the range (a file wholly inside the range still gets an
    * explicit — possibly empty — rewrite; one that can't contain the
    * range is carried by reference). Returns (version, rewritten, kept). */
  def deleteCow(spark: SparkSession, root: String, keyCol: String,
                lower: Long, upper: Long,
                statsCols: Seq[String] = Nil): (Long, Int, Int) =
    cowCommit(spark, root, "delete", statsCols) { entries =>
      val (touched, untouched) = entries.partition { e =>
        e.statFor(keyCol).forall(s => s.max >= lower && s.min <= upper)
      }
      // same rewrite-sizing rule as mergeCowImpl: N touched files come
      // back as ~N files, never one per shuffle partition
      val survivors =
        if (touched.isEmpty) None
        else Some(spark.read.parquet(touched.map(e => s"$root/${e.path}"): _*)
          .where(!(col(keyCol) >= lower && col(keyCol) <= upper))
          .repartition(touched.length))
      (untouched, survivors.orNull)
    }

  /** Shared COW commit shape: split the current entries into
    * (kept-by-reference, rewrite frame), write the rewrite, publish
    * kept ∪ new through the same rename gate. */
  private def cowCommit(spark: SparkSession, root: String, action: String,
                        statsCols: Seq[String])(
      split: Seq[Entry] => (Seq[Entry], DataFrame)): (Long, Int, Int) = {
    val cur = currentVersion(spark, root)
    val (_, entries) = readManifest(spark, root, cur)
    val (untouched, rewrite) = split(entries)
    val fresh0 =
      if (rewrite == null) Seq.empty
      else newEntries(rewrite, root, statsCols)
    // a rewrite that deleted EVERY row can come back file-less; a manifest
    // listing zero files would make the current version unreadable (no
    // schema source), so force one schema-bearing empty file
    val fresh =
      if (fresh0.isEmpty && untouched.isEmpty && rewrite != null)
        newEntries(rewrite.coalesce(1), root, statsCols)
      else fresh0
    val v = publishEntries(spark, root, cur + 1, action, untouched ++ fresh)
    (v, entries.length - untouched.length, untouched.length)
  }

  /** Compact the current version into `numFiles` files, published as a
    * new version with action 'compact' — the OPTIMIZE step every
    * lakehouse needs once streaming appends have shredded a table into
    * thousands of small files (each append here adds a file set; reads
    * then pay per-file open cost). The data is byte-identical by
    * construction (one repartition of the current snapshot); old
    * versions stay readable until [[vacuum]], and readers holding any
    * version's file list are untouched — compaction is just another
    * commit racing through the same rename gate. */
  def compact(spark: SparkSession, root: String, numFiles: Int,
              statsCols: Seq[String] = Nil): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val cur = currentVersion(spark, root)
    val df = readAsOf(spark, root, cur).repartition(numFiles)
    publishEntries(spark, root, cur + 1, "compact",
      newEntries(df, root, statsCols))
  }

  /** Bin-packing OPTIMIZE (round 12 cont.): rewrite ONLY the files
    * smaller than `smallBytes`, packed into `targetFiles` outputs; files
    * already at size are carried BY REFERENCE (verbatim manifest lines).
    * This is the maintenance a streaming-ingested table actually needs —
    * after K micro-batch appends it holds K small files, and a full
    * [[compact]] would rewrite 100 TB to fix kilobytes of shred; Delta's
    * OPTIMIZE draws the same line (only files under a threshold are
    * rewritten). Stats are recomputed for the packed files only.
    * File sizes come from one getFileStatus per file here (local[*]);
    * at cluster scale they ride the write tasks' commit messages into
    * the manifest, like the footer stats. Fewer than 2 small files ⇒
    * nothing to pack ⇒ NO new version (returns the current one, 0
    * packed). Returns (version, filesPacked, filesKept). */
  def compactSmall(spark: SparkSession, root: String, smallBytes: Long,
                   targetFiles: Int,
                   statsCols: Seq[String] = Nil): (Long, Int, Int) = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val cur = currentVersion(spark, root)
    val (_, entries) = readManifest(spark, root, cur)
    val f = fs(spark, root)
    val (small, big) = entries.partition(e =>
      f.getFileStatus(new Path(s"$root/${e.path}")).getLen < smallBytes)
    if (small.length < 2) (cur, 0, entries.length)
    else {
      val packed = spark.read
        .parquet(small.map(e => s"$root/${e.path}"): _*)
        .repartition(targetFiles)
      val v = publishEntries(spark, root, cur + 1, "compact",
        big ++ newEntries(packed, root, statsCols))
      (v, small.length, big.length)
    }
  }

  /** [[compact]] that also RE-CLUSTERS (round 12): Delta's OPTIMIZE
    * ZORDER BY — after enough appends/COW rewrites have shredded the
    * write-time clustering, file min/max ranges widen and [[readWhere]]
    * stops skipping; this rewrite lays the current snapshot back along
    * the z-curve of `zCols` ([[Layout.zorderBy]]: one range repartition +
    * local sort — the cost of any global sort) and records fresh stats,
    * so skipping bites again on every clustered column at once. Pass
    * PRE-SCALED z columns (e.g. `(k*1024) div (maxk+1)`) — the Morton
    * interleave clamps at 2^bits. */
  def compactZOrder(spark: SparkSession, root: String, numFiles: Int,
                    bits: Int, zCols: Seq[org.apache.spark.sql.Column],
                    statsCols: Seq[String] = Nil): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val cur = currentVersion(spark, root)
    val df = Layout.zorderBy(readAsOf(spark, root, cur), numFiles, bits, zCols: _*)
    publishEntries(spark, root, cur + 1, "compact",
      newEntries(df, root, statsCols))
  }

  /** Read `version` with SCHEMA RECONCILIATION (round 12): group the
    * referenced files by originating commit directory (appends keep
    * manifest order, so first-seen order IS commit order), read each
    * group's schema from footers only, and apply [[SchemaEvolution]]'s
    * policy — present columns cast to the widest safe type, missing
    * columns null, cross-kind CONFLICTED columns quarantined by name
    * instead of footer-roulette. Adds `__gen` (1-based commit group).
    * Returns (data, quarantined column names, reader schema). */
  def readReconciled(spark: SparkSession, root: String, version: Long):
      (DataFrame, Seq[String], Seq[(String, String)]) = {
    val (_, entries) = readManifest(spark, root, version)
    require(entries.nonEmpty, s"version $version of $root lists no data files")
    val byDir = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    entries.foreach { e =>
      val dir = e.path.substring(0, e.path.lastIndexOf('/') max 0)
      byDir.updateWith(dir)(v => Some(v.getOrElse(Vector.empty) :+ s"$root/${e.path}"))
    }
    val gens = byDir.values.zipWithIndex
      .map { case (files, i) => ((i + 1).toLong, files: Seq[String]) }.toSeq
    val inventory = SchemaEvolution.generationSchemasFromFiles(spark, gens)
    val report = SchemaEvolution.driftReport(inventory)
    SchemaEvolution.readReconciledFiles(spark, gens, report)
  }

  /** Added / removed / changed rows between two versions —
    * [[SnapshotDiff.diff]] over the two resolved snapshots (one full-outer
    * join on the key; the delta ships, never the snapshots). For a keyed
    * table prefer [[changesBetween]], which reads only the files the
    * versions DISAGREE on. */
  def diffVersions(spark: SparkSession, root: String, from: Long, to: Long,
                   keys: Seq[String], tracked: Seq[String]): DataFrame =
    SnapshotDiff.diff(readAsOf(spark, root, from), readAsOf(spark, root, to),
      keys, tracked)

  /** CHANGE DATA FEED at file granularity (round 12 cont.): the
    * added/removed/changed rows between two versions, computed from the
    * MANIFEST DIFF — a data file referenced by BOTH manifests is immutable
    * and path-identical, so its rows are provably unchanged and it is
    * never opened; only the files the `from` manifest lost and the `to`
    * manifest gained enter one [[SnapshotDiff]] full-outer join. After a
    * 1k-row copy-on-write upsert on a 100 TB table the feed reads the
    * handful of rewritten files, not two full snapshots ([[diffVersions]]
    * is the fallback when the table has no stable key). Rows a rewrite
    * carried VALUE-identical into a new file (COW's untouched neighbours,
    * compaction's entire input) meet their old selves in the join and
    * cancel — the feed is exactly the logical delta.
    *
    * Requires `keys` to be unique per snapshot (the COW contract) and the
    * two versions' schemas to agree on `keys ++ tracked` (drifted tables:
    * reconcile first, [[readReconciled]]).
    *
    * Returns the change rows ([[SnapshotDiff]] shape: keys, old_ and new_
    * tracked columns, change_type) plus (filesRead, filesTotal) — the
    * file-skipping saving as a reportable fact. */
  def changesBetween(spark: SparkSession, root: String, from: Long, to: Long,
                     keys: Seq[String], tracked: Seq[String]):
      (DataFrame, Int, Int) = {
    val fromE = readManifest(spark, root, from)._2
    val toE = readManifest(spark, root, to)._2
    val fromPaths = fromE.map(_.path).toSet
    val toPaths = toE.map(_.path).toSet
    val removed = fromE.filterNot(e => toPaths.contains(e.path)).map(_.path)
    val added = toE.filterNot(e => fromPaths.contains(e.path)).map(_.path)
    val filesTotal = (fromPaths ++ toPaths).size
    // an empty side still needs the table schema: plan any ONE referenced
    // file under a false predicate (same trick as readWhere's proven-empty)
    def side(paths: Seq[String]): DataFrame =
      if (paths.nonEmpty) spark.read.parquet(paths.map(p => s"$root/$p"): _*)
      else spark.read.parquet(s"$root/${(toE ++ fromE).head.path}")
        .where(lit(false))
    (SnapshotDiff.diff(side(removed), side(added), keys, tracked),
      removed.length + added.length, filesTotal)
  }

  /** Retire time travel older than the last `retainLast` versions: delete
    * the expired manifests, then every data file no RETAINED manifest
    * references. Readers of retained versions are untouched (their files
    * survive by construction). `minAgeMillis` (round 12) is the READER
    * RETENTION CONTRACT: a version is expirable only when it stopped
    * being CURRENT — i.e. its SUCCESSOR committed — at least the horizon
    * ago (anchoring to the version's own commit time would let a
    * long-current version expire the instant a new commit lands, under a
    * reader that resolved it a second earlier). Set the horizon to the
    * longest scan a reader may hold a resolved file list (Delta's
    * deletedFileRetentionDuration plays the same role). Abandoned commit
    * `.tmp` bodies are swept too, behind a 10-minute floor so a racing
    * writer's in-flight body is never deleted between its create and
    * rename. Returns (manifests deleted, files deleted). */
  def vacuum(spark: SparkSession, root: String, retainLast: Int,
             minAgeMillis: Long = 0L): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the current version")
    val vs = versions(spark, root)
    val now = System.currentTimeMillis()
    val expired = vs.dropRight(retainLast).zipWithIndex
      .takeWhile { case (_, i) =>
        // vs(i + 1) exists: retainLast >= 1 keeps at least one successor
        commitTimestamp(spark, root, vs(i + 1)) <= now - minAgeMillis
      }.map(_._1)
    val retained = vs.drop(expired.length)
    val keep = retained.flatMap(readManifest(spark, root, _)._2).map(_.path).toSet
    val drop = expired.flatMap(readManifest(spark, root, _)._2).map(_.path).toSet -- keep
    val f = fs(spark, root)
    drop.foreach(rel => f.delete(new Path(s"$root/$rel"), false))
    expired.foreach(v => f.delete(manifestPath(root, v), false))
    val mdir = new Path(s"$root/$ManifestDir")
    val tmpHorizon = math.max(minAgeMillis, 10L * 60 * 1000)
    if (f.exists(mdir)) f.listStatus(mdir).toSeq
      .filter(s => s.getPath.getName.endsWith(".tmp") &&
        s.getModificationTime <= now - tmpHorizon)
      .foreach(s => f.delete(s.getPath, false))
    (expired.length, drop.size)
  }
}
