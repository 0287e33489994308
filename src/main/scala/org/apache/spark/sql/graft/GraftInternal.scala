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

  /** Recursively list each directory of `dirUris` on EXECUTORS (one
    * task per directory, so a table with thousands of partition
    * directories lists in parallel instead of serially on the driver)
    * and return (absolute path URI string, modificationTime) per file.
    * Same `SerializableConfiguration` placement rationale as
    * [[distributedCopy]].
    */
  /** Executor-parallel recursive listing with full file metadata —
    * (path, size, mtime) — for callers whose identity includes size
    * and mtime (COPY INTO's source inventory). One task per top-level
    * entry slice; the driver never walks the tree.
    */
  def distributedListFilesMeta(
      spark: SparkSession,
      dirUris: Seq[String]): Seq[(String, Long, Long)] = {
    val sc = spark.sparkContext
    if (dirUris.isEmpty) return Nil
    val bc = sc.broadcast(new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf()))
    val slices = math.min(dirUris.size, math.max(1, sc.defaultParallelism))
    sc.parallelize(dirUris, slices).flatMap { d =>
      val conf = bc.value.value
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      if (fs.exists(p)) {
        if (fs.getFileStatus(p).isFile) {
          val st = fs.getFileStatus(p)
          out += ((st.getPath.toString, st.getLen, st.getModificationTime))
        } else {
          val it = fs.listFiles(p, true)
          while (it.hasNext) {
            val st = it.next()
            out += ((st.getPath.toString, st.getLen, st.getModificationTime))
          }
        }
      }
      out
    }.collect().toSeq
  }

  def distributedListFiles(
      spark: SparkSession,
      dirUris: Seq[String]): org.apache.spark.rdd.RDD[(String, Long)] = {
    val sc = spark.sparkContext
    if (dirUris.isEmpty) return sc.emptyRDD
    val bc = sc.broadcast(new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf()))
    val slices = math.min(dirUris.size, math.max(1, sc.defaultParallelism))
    sc.parallelize(dirUris, slices).flatMap { d =>
      val conf = bc.value.value
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        out += ((st.getPath.toString, st.getModificationTime))
      }
      out
    }
  }

  /** Delete each URI on EXECUTORS (batched over tasks, not one
    * sequential driver loop) and return the URIs whose delete actually
    * removed a file (false = already gone, e.g. a prior vacuum).
    */
  def distributedDelete(spark: SparkSession, uris: Seq[String]): Seq[String] = {
    if (uris.isEmpty) return Nil
    val sc = spark.sparkContext
    val bc = sc.broadcast(new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf()))
    val slices = math.min(uris.size, math.max(1, sc.defaultParallelism))
    sc.parallelize(uris, slices).mapPartitions { it =>
      val conf = bc.value.value
      it.filter { u =>
        val p = new org.apache.hadoop.fs.Path(u)
        p.getFileSystem(conf).delete(p, false)
      }
    }.collect().toSeq
  }

  /** Filter `items` on EXECUTORS with a credentialed Hadoop conf (the
    * `SerializableConfiguration` placement rationale again): used by
    * bloom-filter pruning when the candidate set outgrows the driver's
    * thread pool — one footer read per file, fanned across the cluster.
    */
  def distributedFilter(
      spark: SparkSession,
      items: Seq[String],
      f: (org.apache.hadoop.conf.Configuration, String) => Boolean): Seq[String] = {
    if (items.isEmpty) return Nil
    val sc = spark.sparkContext
    val bc = sc.broadcast(new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf()))
    val slices = math.min(items.size, math.max(1, sc.defaultParallelism))
    sc.parallelize(items, slices).mapPartitions { it =>
      val conf = bc.value.value
      it.filter(p => f(conf, p))
    }.collect().toSeq
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
