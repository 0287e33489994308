package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType

/** V1 streaming Source over the graft commit log: each micro-batch emits
  * the rows of the files ADDED by commits in `(startOffset, endOffset]`
  * — offsets are commit versions, so progress tracking rides the log
  * itself and every committed append is delivered exactly once (the
  * incremental-consumer role the reference delegates to its engine's
  * lazy dataset, deltalake_polars_type_handler.py:33-37).
  *
  * Contract notes:
  *   - append-stream semantics: OVERWRITE/MERGE commits surface as their
  *     *added* files (removals are not retracted) — same posture as
  *     Delta's source, which errors-or-ignores changes; compose with
  *     [[graft.streaming.Streams.dedupStream]] downstream if upstream
  *     rewrites can re-add rows. OPTIMIZE commits (bin-pack / Z-order)
  *     are skipped entirely — pure rearrangements of already-delivered
  *     rows (Delta's dataChange=false), as are deletion-vector repoints
  *     (same-path remove+add);
  *   - the read schema is pinned at stream start (schema evolution mid
  *     stream requires a restart);
  *   - `option("startingVersion", v)` begins at commit v instead of 0;
  *   - `option("maxCommitsPerTrigger", n)` caps each micro-batch at n
  *     commits (Delta's maxFilesPerTrigger analog), driven through
  *     [[SupportsAdmissionControl]] so `Trigger.AvailableNow` drains a
  *     long catch-up log in bounded batches instead of one giant one.
  *
  * Lives under org.apache.spark.sql because the micro-batch DataFrame
  * must be created with `internalCreateDataFrame(..., isStreaming=true)`
  * (package-private in Spark) — the same placement pattern production
  * lakehouse connectors use for their V1 sources.
  */
class GraftStreamSource(
    sqlContext: SQLContext,
    path: String,
    startingVersion: Option[Long],
    maxCommitsPerTrigger: Option[Long] = None,
    /** Emit row-level CHANGES (`_change_type` ∈ insert / delete /
      * update_preimage / update_postimage) instead of appended rows —
      * Delta's `readChangeFeed` stream. Each micro-batch serves its
      * commits' exact per-commit change rows (change files when the
      * table runs `graft.cdf=true`; appends as inserts; overwrite
      * commits as their net diff), so a downstream can maintain a
      * mirror without rescanning the table.
      */
    readChangeFeed: Boolean = false,
    /** Delta's `maxFilesPerTrigger` / `maxBytesPerTrigger`, enforced at
      * COMMIT granularity (offsets are commit versions): whole commits
      * are admitted until the next would push the batch past a cap, at
      * least one per batch. A streaming-sink-fed table commits one or a
      * few files per micro-batch, so commit granularity bounds catch-up
      * batches exactly like Delta's file granularity does there; one
      * giant historical commit still arrives whole (pair with
      * `maxRecordsPerFile`-bounded writes upstream). The INITIAL
      * SNAPSHOT of a fresh stream on a retention-cleaned log is also
      * split across triggers under these caps (Delta parity) via
      * [[SnapshotPhaseOffset]] — without caps it arrives as one batch.
      */
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession.asInstanceOf[ClassicSession]
  private def log =
    new graft.log.CommitLog(path, spark.sessionState.newHadoopConf())

  override val schema: StructType =
    if (readChangeFeed) GraftStreamSource.cdfSchema(log.snapshot().schema)
    else log.snapshot().schema

  /** End version frozen by prepareForTriggerAvailableNow. */
  @volatile private var availableNowCap: Option[Long] = None

  /** Offset used while serving the INITIAL SNAPSHOT in capped chunks:
    * `index` files of the (path-sorted) snapshot at `version` have been
    * served. Plain long offsets (all other phases, and every pre-split
    * checkpoint) stay the wire format — `json` here is a JSON object, so
    * the two never collide.
    */
  private[graft] case class SnapshotPhaseOffset(version: Long, index: Long)
      extends Offset {
    override def json: String = s"""{"v":$version,"i":$index}"""
  }

  /** (commit version, snapshot-phase file index if mid-snapshot). */
  private def parseOffset(o: OffsetV2): (Long, Option[Long]) = {
    val j = o match {
      case l: LongOffset           => return (l.offset, None)
      case SnapshotPhaseOffset(v, i) => return (v, Some(i))
      case s: SerializedOffset     => s.json
      case other                   => other.json
    }
    val t = j.trim
    if (t.startsWith("{")) {
      val re = """\{\s*"v"\s*:\s*(-?\d+)\s*,\s*"i"\s*:\s*(\d+)\s*\}""".r
      t match {
        case re(v, i) => (v.toLong, Some(i.toLong))
        case _ => throw new IllegalStateException(
          s"unrecognized graft stream offset: $j")
      }
    } else (t.toLong, None)
  }

  /** Deterministic file order for snapshot chunking — stable across
    * restarts because it depends only on the pinned snapshot. Cached:
    * the phase consults it every trigger, and the pinned snapshot is
    * immutable.
    */
  @volatile private var snapshotCache: Option[(Long, Seq[graft.log.AddFile])] = None
  private def snapshotFilesSorted(v: Long): Seq[graft.log.AddFile] =
    snapshotCache match {
      case Some((`v`, files)) => files
      case _ =>
        val files = log.snapshot(Some(v)).files.sortBy(_.path)
        snapshotCache = Some((v, files))
        files
    }

  /** Largest index `j > from` with files[from..j) under both caps (at
    * least one file per trigger so the phase always progresses).
    */
  private def admitSnapshotChunk(files: Seq[graft.log.AddFile], from: Long): Long = {
    var (n, bytes) = (0L, 0L)
    var j = from
    var done = false
    val it = files.iterator.drop(from.toInt)
    while (!done && it.hasNext) {
      val f = it.next()
      n += 1; bytes += f.sizeBytes
      val over = maxFilesPerTrigger.exists(n > _) ||
        maxBytesPerTrigger.exists(bytes > _)
      if (over && j > from) done = true
      else j += 1 // always admit at least one file
    }
    j
  }

  override def getDefaultReadLimit: ReadLimit =
    maxCommitsPerTrigger
      .map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = log.latestVersion()

  override def getOffset: Option[Offset] = log.latestVersion().map(LongOffset(_))

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = (log.latestVersion(), availableNowCap) match {
      case (Some(l), Some(cap)) => Some(math.min(l, cap))
      case (l, _)               => l
    }
    latest match {
      case None => null
      case Some(l) =>
        val parsedStart = Option(startOffset).map(parseOffset)
        // mid-initial-snapshot: keep chunking the pinned snapshot under
        // the caps until every file has been served, THEN resume commit
        // replay from the pinned version
        parsedStart match {
          case Some((v, Some(i))) =>
            val files = snapshotFilesSorted(v)
            if (i < files.size)
              return SnapshotPhaseOffset(v, admitSnapshotChunk(files, i))
          case _ => ()
        }
        val freshStream = parsedStart.isEmpty && startingVersion.isEmpty
        val oldestSurviving = log.versions().headOption.getOrElse(0L)
        // a BRAND-NEW stream on a retention-cleaned log serves the
        // INITIAL SNAPSHOT first; with file/byte caps it is split across
        // triggers (Delta applies the caps to the initial snapshot too —
        // a 100 TB table must not arrive as one unbounded batch)
        if (freshStream && oldestSurviving > 0 &&
            (maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty)) {
          val files = snapshotFilesSorted(oldestSurviving)
          val j = admitSnapshotChunk(files, 0L)
          return (
            if (j < files.size) SnapshotPhaseOffset(oldestSurviving, j)
            // tiny snapshot: fits one batch, serve it as such and move on
            else SnapshotPhaseOffset(oldestSurviving, files.size.toLong))
        }
        val start0 = parsedStart
          .map(_._1)
          .orElse(startingVersion.map(_ - 1))
          .getOrElse(-1L)
        // a BRAND-NEW stream on a retention-cleaned log starts at the
        // oldest surviving commit (its batch serves the initial
        // snapshot), so admission control never proposes an end version
        // whose commit no longer exists
        val start =
          if (freshStream) math.max(start0, oldestSurviving - 1)
          else start0
        val commitCapped = limit match {
          case m: ReadMaxFiles => math.min(l, start + m.maxFiles())
          case _               => l
        }
        // file/byte caps: admit whole commits while BOTH stay under
        // their caps, at least one — reads at most (admitted+1) commit
        // JSONs per trigger, bounded by the caps themselves
        val end =
          if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
            commitCapped
          else {
            val surviving = log.versions().filter(v => v > start && v <= commitCapped)
            var (files, bytes) = (0L, 0L)
            var last = start
            var done = surviving.isEmpty
            val it = surviving.iterator
            while (!done && it.hasNext) {
              val v = it.next()
              val c = log.readCommit(v)
              val rewritten = c.remove.map(_.path).toSet
              // OPTIMIZE/REORG commits serve no rows (see getBatch) —
              // admit them for free instead of counting phantom files
              val adds =
                if (c.operation == "OPTIMIZE" || c.operation == "REORG") Nil
                else c.add.filterNot(a => rewritten(a.path))
              files += adds.size
              bytes += adds.map(_.sizeBytes).sum
              val over = maxFilesPerTrigger.exists(files > _) ||
                maxBytesPerTrigger.exists(bytes > _)
              if (over && last > start) done = true // cap hit: stop BEFORE v
              else last = v // always admit at least one commit
            }
            last
          }
        if (end < 0) null else LongOffset(math.max(end, start))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (endV, endIdx) = parseOffset(end)
    endIdx.foreach { j =>
      // initial-snapshot phase: serve files [i0, j) of the snapshot
      // pinned at endV (path-sorted, so chunks are restart-stable)
      val i0 = start.map(o => parseOffset(o)._2.getOrElse(0L)).getOrElse(0L)
      val snap = log.snapshot(Some(endV))
      val chunk = snap.files.sortBy(_.path)
        .slice(i0.toInt, math.min(j, Int.MaxValue).toInt)
      val table = graft.io.GraftTable(spark, path)
      val base = table.dfForFiles(snap, chunk)
      val batch =
        if (readChangeFeed) {
          val snapCommit = log.readCommit(endV)
          graft.io.Cdc.stamp(
            base.withColumn(graft.io.Cdc.ChangeCol,
              org.apache.spark.sql.functions.lit("insert")),
            snapCommit.version, snapCommit.timestampMs)
        } else base
      return spark.internalCreateDataFrame(
        batch.queryExecution.toRdd, batch.schema, isStreaming = true)
    }
    val from = start.map(o => parseOffset(o)._1 + 1)
      .getOrElse(startingVersion.getOrElse(0L))
    val to = endV
    // gap handling BEFORE building the snapshot — snapshot(Some(to))
    // itself rejects retention-cleaned versions with a confusing error
    val surviving = log.versions()
    val gap = surviving.headOption.exists(oldest => from < oldest && from <= to)
    if (gap && (start.isDefined || startingVersion.isDefined)) {
      // Fail loudly (like Delta) instead of silently skipping commits
      // that log retention already cleaned: a checkpoint or explicit
      // startingVersion below the oldest surviving commit would
      // otherwise lose those commits' rows.
      val oldest = surviving.head
      throw new IllegalStateException(
        s"GraftStreamSource at $path: versions [$from, ${oldest - 1}] were " +
          "removed by log retention (cleanOldLogs); the stream checkpoint " +
          "or startingVersion predates the retained log. Restart with a " +
          s"fresh checkpoint or startingVersion >= $oldest.")
    }
    val snapV = if (surviving.contains(to)) to else surviving.head
    val snap = log.snapshot(Some(snapV))
    val table = graft.io.GraftTable(spark, path)
    def asStream(batch: DataFrame): DataFrame =
      spark.internalCreateDataFrame(
        batch.queryExecution.toRdd, batch.schema, isStreaming = true)
    if (gap) {
      // brand-new stream on a retention-cleaned log: the checkpointed
      // snapshot fully represents the cleaned commits, so serve it as
      // the initial batch (Delta's initial-snapshot semantics); in CDF
      // mode those rows are the mirror's starting inserts
      val base = table.dfForFiles(snap, snap.files)
      return asStream(
        if (readChangeFeed) {
          val snapCommit = log.readCommit(snapV)
          graft.io.Cdc.stamp(
            base.withColumn(graft.io.Cdc.ChangeCol,
              org.apache.spark.sql.functions.lit("insert")),
            snapCommit.version, snapCommit.timestampMs)
        } else base)
    }
    if (readChangeFeed)
      return asStream(table.changesForCommits(from, to, snap))
    val versions = surviving.filter(v => v >= from && v <= to)
    // a same-commit remove+add of one path is a metadata rewrite of an
    // existing file (deletion-vector DML repointing its DV), not new
    // data — emitting it would replay the file's surviving rows. An
    // OPTIMIZE commit (bin-pack / Z-order / cluster) is a pure
    // rearrangement of already-delivered rows — Delta marks its files
    // dataChange=false and the source skips them; emitting would replay
    // every compacted row. REORG (DV purge) likewise rewrites only
    // already-delivered live rows into new paths.
    val added = versions.flatMap { v =>
      val c = log.readCommit(v)
      if (c.operation == "OPTIMIZE" || c.operation == "REORG") Nil
      else {
        val rewritten = c.remove.map(_.path).toSet
        c.add.filterNot(a => rewritten(a.path))
      }
    }
    asStream(table.dfForFiles(snap, added))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$path]"
}

object GraftStreamSource {
  /** The change-feed read schema: table columns + `_change_type` +
    * commit provenance (`_commit_version`, `_commit_timestamp`) —
    * Delta's CDF column contract.
    */
  def cdfSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        graft.io.Cdc.ChangeCol,
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(
        graft.io.Cdc.VersionCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        graft.io.Cdc.TimestampCol,
        org.apache.spark.sql.types.TimestampType, nullable = false)))
}
