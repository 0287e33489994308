package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DSv2 streaming write for graft catalog tables — what makes
  * `df.writeStream.toTable("cat.ns.tbl")` work end to end.
  *
  * Executors write each epoch's rows as parquet files under
  * `<table>/_staging-stream-<queryId>/<epochId>/` through Spark's own
  * parquet `OutputWriter` (same codec and footer statistics as the
  * batch writer); the driver-side epoch commit promotes the staged
  * files into the table root and appends one commit-log entry stamped
  * with `(streaming_query_id, streaming_batch_id)`. A replayed epoch
  * (failure between task success and checkpoint advance) finds its
  * batch id already recorded and discards the staged files instead of
  * double-appending — the same exactly-once contract as the
  * foreachBatch sink ([[graft.streaming.Streams.toGraftTable]]), on the
  * V2 API. The per-epoch commit protocol lives in
  * [[graft.streaming.StreamingEpochs]]; this file holds only the parts
  * that need sql-private access (ParquetFileFormat.prepareWrite,
  * OutputWriterFactory, SerializableConfiguration).
  */
object GraftStreamingWriteShim {
  def create(
      spark: SparkSession,
      tablePath: String,
      schema: StructType,
      queryId: String): StreamingWrite = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // prepareWrite mutates the job conf (write support, schema); the
    // serialized conf must be captured AFTER it
    val factory = new ParquetFileFormat().prepareWrite(
      spark.asInstanceOf[ClassicSession], job,
      Map("compression" -> "zstd"), schema)
    val serConf = new SerializableConfiguration(job.getConfiguration)
    new GraftStreamingWrite(tablePath, schema, queryId, factory, serConf)
  }
}

final class GraftStreamingWrite(
    tablePath: String,
    schema: StructType,
    queryId: String,
    factory: OutputWriterFactory,
    serConf: SerializableConfiguration) extends StreamingWrite {

  private def stageRoot = s"$tablePath/_staging-stream-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(stageRoot, schema, factory, serConf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    graft.streaming.StreamingEpochs.commit(
      SparkSession.active, tablePath, s"$stageRoot/$epochId", queryId, epochId)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    graft.streaming.StreamingEpochs.abort(
      SparkSession.active, s"$stageRoot/$epochId")
}

private final class GraftStreamWriterFactory(
    stageRoot: String,
    schema: StructType,
    owf: OutputWriterFactory,
    serConf: SerializableConfiguration) extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(
      s"$stageRoot/$epochId", schema, owf, serConf, partitionId, taskId, epochId)
}

/** Per-task writer: opens the parquet file lazily (an empty partition
  * leaves no file behind) and reports the written path in its commit
  * message.
  */
private final class GraftStreamDataWriter(
    dir: String,
    schema: StructType,
    owf: OutputWriterFactory,
    serConf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  private var writer: OutputWriter = _
  private var filePath: String = _

  private def ensureOpen(): Unit = if (writer == null) {
    val conf = new Configuration(serConf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graftstream", (epochId % Int.MaxValue).toInt),
        TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf, attempt)
    val ext = owf.getFileExtension(ctx)
    filePath = f"$dir/part-$partitionId%05d-$taskId$ext"
    writer = owf.newInstance(filePath, schema, ctx)
  }

  override def write(row: InternalRow): Unit = { ensureOpen(); writer.write(row) }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftStreamCommitMessage(Option(filePath))
  }

  override def abort(): Unit = if (writer != null) {
    writer.close()
    val p = new Path(filePath)
    p.getFileSystem(serConf.value).delete(p, false)
  }

  override def close(): Unit = ()
}

final case class GraftStreamCommitMessage(path: Option[String])
  extends WriterCommitMessage
