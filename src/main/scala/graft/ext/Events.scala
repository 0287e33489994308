package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the batch `events` table: typed JSON
  * extraction and inactivity-gap sessionization (SURVEY §2.8). The
  * streaming analogs live in [[graft.streaming.Streams]]; these batch
  * versions are the reference's "time-window partitions of an ordinary
  * table" model (dagster_delta/dbiomanager_fixed.py:93-103) made
  * data-driven.
  */
object Events {

  /** Pull a typed field out of the `props` JSON string column. */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"))

  /** Sessionize by inactivity gap: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`. Timestamps
    * are floored to epoch seconds first so session boundaries are exact
    * integers (cross-engine reproducible).
    *
    * Plan: one shuffle on `user_id` (the window partition); both the lag
    * and the running sum reuse the same sort, so Catalyst plans a single
    * Window node.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val epoch = unix_timestamp(col("ts"))
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("__epoch"), col("event_id"))
    val newSession = when(
      col("__epoch") - lag(col("__epoch"), 1).over(byUser) > gapSeconds, 1
    ).otherwise(lit(0))
    // first event of a user: lag is null -> otherwise(0); session ids
    // then start at 0 for every user
    events
      .withColumn("__epoch", epoch)
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__epoch")).as("start_epoch"),
        max(col("__epoch")).as("end_epoch"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_clicks"))
  }
}
