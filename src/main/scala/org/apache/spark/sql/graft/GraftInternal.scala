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

  /** Multipart names of every unresolved attribute referenced by a
    * Column, read off the ColumnNode tree (the catalyst expression is
    * built lazily in Spark 4, so pre-analysis validation must walk the
    * node tree, not the expression).
    */
  def referencedNameParts(c: org.apache.spark.sql.Column): Seq[Seq[String]] =
    c.node.collect {
      case a: org.apache.spark.sql.internal.UnresolvedAttribute => a.nameParts
    }
}
