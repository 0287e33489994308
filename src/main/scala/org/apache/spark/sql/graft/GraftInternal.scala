package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge to `Dataset.ofRows` (package-private in Spark): turns the
  * native graft logical plan into a DataFrame so the programmatic read
  * path (`GraftTable.toDf`) shares the commit-log FileIndex with the
  * `format("graft")` path. Same placement pattern as the streaming shim.
  */
object GraftInternal {
  def dfFromPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
