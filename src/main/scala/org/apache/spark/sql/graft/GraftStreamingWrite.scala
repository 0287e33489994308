package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** DSv2 streaming write for graft catalog tables — what makes
  * `df.writeStream.toTable("cat.ns.tbl")` work end to end.
  *
  * Executors write each epoch's rows as parquet files under
  * `<table>/_staging-stream-<queryId>/<epochId>/` through Spark's own
  * parquet `OutputWriter` (same codec and footer statistics as the
  * batch writer), routing rows of a partitioned table into hive-style
  * `col=value/` subdirectories per row; the driver-side epoch commit
  * promotes the staged files into the table root and appends one
  * commit-log entry stamped with `(streaming_query_id,
  * streaming_batch_id)`. A replayed epoch (failure between task
  * success and checkpoint advance) finds its batch id already recorded
  * and discards the staged files instead of double-appending — the
  * same exactly-once contract as the foreachBatch sink
  * ([[graft.streaming.Streams.toGraftTable]]), on the V2 API. The
  * per-epoch commit protocol lives in
  * [[graft.streaming.StreamingEpochs]]; this file holds only the parts
  * that need sql-private access (ParquetFileFormat.prepareWrite,
  * OutputWriterFactory, SerializableConfiguration).
  */
object GraftStreamingWriteShim {
  def create(
      spark: SparkSession,
      tablePath: String,
      schema: StructType,
      queryId: String,
      partitionCols: Seq[String]): StreamingWrite = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // prepareWrite mutates the job conf (write support, schema); the
    // serialized conf must be captured AFTER it
    val factory = new ParquetFileFormat().prepareWrite(
      spark.asInstanceOf[ClassicSession], job,
      Map("compression" -> "zstd"), schema)
    val serConf = new SerializableConfiguration(job.getConfiguration)
    new GraftStreamingWrite(tablePath, schema, queryId, partitionCols,
      spark.sessionState.conf.sessionLocalTimeZone, factory, serConf)
  }
}

final class GraftStreamingWrite(
    tablePath: String,
    schema: StructType,
    queryId: String,
    partitionCols: Seq[String],
    timeZone: String,
    factory: OutputWriterFactory,
    serConf: SerializableConfiguration) extends StreamingWrite {

  private def stageRoot = s"$tablePath/_staging-stream-$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(
      stageRoot, schema, partitionCols, timeZone, factory, serConf)

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
    partitionCols: Seq[String],
    timeZone: String,
    owf: OutputWriterFactory,
    serConf: SerializableConfiguration) extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(s"$stageRoot/$epochId", schema, partitionCols,
      timeZone, owf, serConf, partitionId, taskId, epochId)
}

/** Per-task writer: one lazily-opened parquet writer per hive partition
  * fragment seen in this task's rows (an empty partition leaves no file
  * behind). Partition values render through Spark's cast-to-string +
  * path escaping, so directory names match the batch writer's layout
  * bit for bit.
  */
private final class GraftStreamDataWriter(
    dir: String,
    schema: StructType,
    partitionCols: Seq[String],
    timeZone: String,
    owf: OutputWriterFactory,
    serConf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  private val writers = scala.collection.mutable.HashMap[String, OutputWriter]()
  private val paths = scala.collection.mutable.ArrayBuffer[String]()

  // cast-to-string projections for the partition columns (Spark's own
  // rendering semantics for dates/timestamps/decimals)
  private val partRender: Seq[(String, Cast)] = partitionCols.map { c =>
    val i = schema.fieldIndex(c)
    val f = schema(i)
    (c, Cast(BoundReference(i, f.dataType, f.nullable), StringType, Some(timeZone)))
  }

  private def fragmentOf(row: InternalRow): String =
    partRender.map { case (name, cast) =>
      val s = cast.eval(row)
      val rendered =
        if (s == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(s.toString)
      s"$name=$rendered"
    }.mkString("/")

  private def taskCtx(): TaskAttemptContextImpl = {
    val conf = new Configuration(serConf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graftstream", (epochId % Int.MaxValue).toInt),
        TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    new TaskAttemptContextImpl(conf, attempt)
  }

  private def writerFor(row: InternalRow): OutputWriter = {
    val frag = fragmentOf(row)
    writers.getOrElseUpdate(frag, {
      val ctx = taskCtx()
      val sub = if (frag.isEmpty) dir else s"$dir/$frag"
      val fp = f"$sub/part-$partitionId%05d-$taskId${owf.getFileExtension(ctx)}"
      paths += fp
      owf.newInstance(fp, schema, ctx)
    })
  }

  override def write(row: InternalRow): Unit = writerFor(row).write(row)

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    writers.clear()
    GraftStreamCommitMessage(paths.toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach(_.close())
    writers.clear()
    paths.foreach { fp =>
      val p = new Path(fp)
      p.getFileSystem(serConf.value).delete(p, false)
    }
  }

  override def close(): Unit = ()
}

final case class GraftStreamCommitMessage(paths: Seq[String])
  extends WriterCommitMessage
