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

  /** Wrap an already-parsed catalyst expression as a user-facing Column
    * (the inverse of the ColumnNode conversion). Used by the SQL DML
    * interception rule to hand parser output to the programmatic
    * Dml/Merge APIs unchanged.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** V1 streaming relation over the graft stream source — what
    * `spark.readStream.format("graft").load(path)` builds internally.
    * Lets the catalog rule route `readStream.table("cat.ns.t")` to the
    * same admission-controlled source (the V1 streaming classes are
    * package-private to sql, hence this shim's placement).
    */
  def streamingRelationFor(
      spark: SparkSession, options: Map[String, String]): LogicalPlan = {
    val ds = org.apache.spark.sql.execution.datasources.DataSource(
      spark.asInstanceOf[ClassicSession],
      className = "graft",
      options = options)
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(ds)
  }

  /** Copy each `(srcUri, dstUri)` file pair on EXECUTORS (one task per
    * slice of the list) and return total bytes copied. The driver never
    * touches data bytes — a deep clone of a 100 TB table fans the copy
    * out across the cluster. Placed here for `SerializableConfiguration`
    * (private[spark]), which ships credentialed Hadoop conf to tasks.
    */
  def distributedCopy(
      spark: SparkSession, pairs: Seq[(String, String)]): Long = {
    if (pairs.isEmpty) return 0L
    val sc = spark.sparkContext
    val bc = sc.broadcast(new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf()))
    val slices = math.min(pairs.size, math.max(1, sc.defaultParallelism))
    sc.parallelize(pairs, slices).map { case (s, d) =>
      val conf = bc.value.value
      val sp = new org.apache.hadoop.fs.Path(s)
      val dp = new org.apache.hadoop.fs.Path(d)
      val dfs = dp.getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        sp.getFileSystem(conf), sp, dfs, dp,
        /* deleteSource = */ false, /* overwrite = */ true, conf)
      dfs.getFileStatus(dp).getLen
    }.sum().toLong
  }

  /** Multipart names of every unresolved attribute referenced by a
    * Column, read off the ColumnNode tree (the catalyst expression is
    * built lazily in Spark 4, so pre-analysis validation must walk the
    * node tree, not the expression). SQL-string nodes (`expr("s.v")`)
    * are parsed so their references are visible too.
    */
  def referencedNameParts(
      spark: SparkSession, c: org.apache.spark.sql.Column): Seq[Seq[String]] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    c.node.foreach {
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        buf += a.nameParts
      case s: org.apache.spark.sql.internal.SqlExpression =>
        spark.sessionState.sqlParser.parseExpression(s.expression).foreach {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            buf += ua.nameParts
          case _ => ()
        }
      case _ => ()
    }
    buf.toSeq
  }
}
