package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}

/** Structured-Streaming surface (SURVEY §2.9).
  *
  * The reference has no streaming runtime — its incremental model is
  * batch-materialized time-window partitions, re-materialized idempotently
  * (dagster_delta/dbiomanager_fixed.py:93-103, handler.py:442-480). Here
  * that model is kept (foreachBatch + idempotent commits) and extended
  * with native streaming operators: watermarked tumbling windows,
  * `session_window` sessionization, and custom state via
  * `mapGroupsWithState`.
  */
object Streams {

  /** Gap-based sessionization with the built-in `session_window` — the
    * streaming analog of [[graft.ext.Events.sessionize]]. State is
    * bounded by the watermark; at scale the only shuffle keys on
    * (user_id, merged session window).
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Watermarked tumbling-window counts per event type. */
  def tumblingCounts(
      events: DataFrame,
      width: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Custom keyed state: running per-user event count via
    * `mapGroupsWithState` (the `KeyValueGroupedDataset` state API).
    */
  def runningCounts(events: Dataset[(Long, String)]): Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, String)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + batch.size
          state.update(next)
          (user, next)
      }
  }

  /** Stream into a graft table with exactly-once micro-batch commits:
    * each batch appends under a recorded `streaming_batch_id`; on restart
    * a replayed batch is skipped if the log already holds its id — the
    * Delta-style transactional sink, on our own commit log.
    */
  def toGraftTable(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      partitionBy: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = lastCommittedBatch(spark, path)
        if (committed.forall(_ < batchId)) {
          GraftWriter.write(spark, batch, path, WriteOptions(
            mode = WriteMode.Append,
            partitionBy = partitionBy,
            metadata = Map("streaming_batch_id" -> batchId.toString)))
        }
        ()
      }
      .start()

  private def lastCommittedBatch(spark: SparkSession, path: String): Option[Long] =
    if (!GraftTable.exists(spark, path)) None
    else GraftTable(spark, path).history()
      .flatMap(_.metadata.get("streaming_batch_id"))
      .map(_.toLong)
      .maxOption
}
