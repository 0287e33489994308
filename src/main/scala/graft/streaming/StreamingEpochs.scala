package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

import graft.io.GraftWriter
import graft.log.CommitLog

/** Driver-side epoch commit protocol for the DSv2 streaming write
  * (`writeStream.toTable`): promote one epoch's staged parquet files
  * into the table root and append a single commit stamped with
  * `(streaming_query_id, streaming_batch_id)`.
  *
  * Exactly-once has two halves here:
  *
  *  - '''Replayed epochs.''' Structured Streaming replays an epoch
  *    whose tasks succeeded but whose checkpoint didn't advance. A
  *    replayed epoch's batch id is already `>=`-recorded for the
  *    query, so its staged files are deleted instead of appended. The
  *    detection scan walks the log newest-first and stops at this
  *    query's most recent commit — O(foreign commits since then), and
  *    the whole log once on a fresh query's first epoch; the caller's
  *    per-run cache makes every later epoch O(1).
  *  - '''Zombie task attempts.''' Only the files named in the tasks'
  *    commit messages are promoted; anything else in the stage
  *    directory (a lost executor's orphan or truncated file, leftovers
  *    of a crashed prior attempt of the same epoch) is deleted with
  *    the stage directory, never committed.
  */
object StreamingEpochs {

  val QueryIdKey = "streaming_query_id"
  val BatchIdKey = "streaming_batch_id"

  /** Highest batch id this query has committed to the table, if any
    * (newest-first scan, early exit on the first commit of this query).
    */
  private def lastCommitted(log: CommitLog, queryId: String): Option[Long] =
    log.versions().reverseIterator
      .map(log.readCommit)
      .collectFirst(Function.unlift { c =>
        if (!c.metadata.get(QueryIdKey).contains(queryId)) None
        else c.metadata.get(BatchIdKey).flatMap(b =>
          scala.util.Try(b.toLong).toOption)
      })

  def commit(
      spark: SparkSession,
      tablePath: String,
      stageDir: String,
      writtenFiles: Seq[String],
      queryId: String,
      epochId: Long,
      lastCommittedHint: Option[Long] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new CommitLog(tablePath, conf)
    require(log.tableExists(),
      s"streaming write target is not a graft table: $tablePath")
    val fs = new Path(tablePath).getFileSystem(conf)
    val stage = new Path(stageDir)
    val last = lastCommittedHint.orElse(lastCommitted(log, queryId))
    if (last.exists(_ >= epochId)) {
      fs.delete(stage, true) // replayed epoch: already committed
      return
    }
    if (!fs.exists(stage)) return // empty epoch: nothing staged
    // promote ONLY what the committed tasks reported: delete orphans
    // from failed/zombie attempts before the stage dir is promoted
    val allowed = writtenFiles.map(new Path(_).toUri.getPath).toSet
    val it = fs.listFiles(stage, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !allowed(st.getPath.toUri.getPath))
        fs.delete(st.getPath, false)
    }
    if (writtenFiles.isEmpty) { fs.delete(stage, true); return }
    GraftWriter.commitPromoted(spark, tablePath, stage,
      operation = "STREAMING WRITE",
      metadata = Map(QueryIdKey -> queryId, BatchIdKey -> epochId.toString))
  }

  def abort(spark: SparkSession, stageDir: String): Unit = {
    val stage = new Path(stageDir)
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(stage, true)
  }
}
