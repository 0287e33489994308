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
  * Exactly-once: Structured Streaming replays an epoch whose tasks
  * succeeded but whose checkpoint didn't advance. A replayed epoch's
  * batch id is already `>=`-recorded for the query, so its staged files
  * are deleted instead of appended. The id scan is bounded to the
  * replay window a `CommitLog` snapshot already reads — the same
  * posture as the foreachBatch sink's `lastCommittedBatch`.
  */
object StreamingEpochs {

  val QueryIdKey = "streaming_query_id"
  val BatchIdKey = "streaming_batch_id"

  /** Highest batch id this query has committed to the table, if any. */
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
      queryId: String,
      epochId: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new CommitLog(tablePath, conf)
    require(log.tableExists(),
      s"streaming write target is not a graft table: $tablePath")
    val fs = new Path(tablePath).getFileSystem(conf)
    val stage = new Path(stageDir)
    if (lastCommitted(log, queryId).exists(_ >= epochId)) {
      fs.delete(stage, true) // replayed epoch: already committed
      return
    }
    if (!fs.exists(stage)) return // empty epoch: nothing staged, nothing to commit
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
