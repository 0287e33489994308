package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
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
  *     rewrites can re-add rows;
  *   - the read schema is pinned at stream start (schema evolution mid
  *     stream requires a restart);
  *   - `option("startingVersion", v)` begins at commit v instead of 0.
  *
  * Lives under org.apache.spark.sql because the micro-batch DataFrame
  * must be created with `internalCreateDataFrame(..., isStreaming=true)`
  * (package-private in Spark) — the same placement pattern production
  * lakehouse connectors use for their V1 sources.
  */
class GraftStreamSource(
    sqlContext: SQLContext,
    path: String,
    startingVersion: Option[Long]) extends Source {

  private val spark = sqlContext.sparkSession.asInstanceOf[ClassicSession]
  private def log =
    new graft.log.CommitLog(path, spark.sessionState.newHadoopConf())

  override val schema: StructType = log.snapshot().schema

  override def getOffset: Option[Offset] = log.latestVersion().map(LongOffset(_))

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf(_) + 1).getOrElse(startingVersion.getOrElse(0L))
    val to = versionOf(end)
    val snap = log.snapshot(Some(to))
    val versions = log.versions().filter(v => v >= from && v <= to)
    val added = versions.flatMap(v => log.readCommit(v).add)
    val table = graft.io.GraftTable(spark, path)
    val batch = table.dfForFiles(snap, added)
    spark.internalCreateDataFrame(
      batch.queryExecution.toRdd, batch.schema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$path]"
}
