package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

import graft.log.CommitLog

/** Zero-copy table clones (Delta's `CREATE TABLE ... SHALLOW CLONE`).
  *
  * A shallow clone is a new table whose v0 commit references the
  * source's data files by ABSOLUTE path — no bytes move, so cloning a
  * 100 TB table costs one metadata commit. The clone then diverges
  * independently: DML/OPTIMIZE on it write new local files and merely
  * drop the absolute references; the source never observes the clone,
  * and commits to the source after the clone point never appear in it.
  *
  * Reference behavior modeled: delta-rs/Delta's shallow-clone contract
  * (dagster-delta surfaces tables through delta-rs handles, where clones
  * are the standard cheap dev/test snapshot of a production table).
  *
  * Safety: every vacuum path in [[GraftTable]] skips absolute
  * references — a clone can only ever physically delete files under its
  * OWN root, so vacuuming a clone never breaks the source (or other
  * clones of it). The inverse hazard — vacuuming the SOURCE deletes
  * files a clone still references — is inherent to shallow clones
  * (Delta documents the same caveat) and is why [[shallow]] records
  * provenance (`cloneSource`/`cloneSourceVersion`) in the clone's
  * history.
  */
object Clone {

  /** Create `dstPath` as a shallow clone of `srcPath` at
    * `versionAsOf` (default: latest). Returns the clone's version (0).
    *
    * Carries the source's table properties wholesale — column-mapping
    * state, CHECK constraints, CDF/DV enablement, and protocol
    * reader/writer features — so the clone reads physical names and
    * enforces invariants exactly like the source did at the clone point.
    */
  def shallow(
      spark: SparkSession,
      srcPath: String,
      dstPath: String,
      versionAsOf: Option[Long] = None): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val srcLog = new CommitLog(srcPath, conf)
    require(srcLog.tableExists(),
      s"shallow clone source is not a graft table: $srcPath")
    val dstLog = new CommitLog(dstPath, conf)
    require(!dstLog.tableExists(),
      s"shallow clone destination is already a graft table: $dstPath")
    // reader-feature gate runs inside snapshot(): a build that cannot
    // interpret the source's format must not propagate its file refs
    val snap = srcLog.snapshot(versionAsOf)
    val srcRoot = new Path(srcPath)
    val qRoot = srcRoot.getFileSystem(conf).makeQualified(srcRoot)
    // qualify with the source FS scheme/authority so refs stay
    // unambiguous from the clone's (possibly different) root FS
    def abs(rel: String): String = {
      val p = new Path(rel)
      if (p.isAbsolute || p.toUri.getScheme != null)
        new Path(qRoot, p).toString // clone-of-clone: already absolute
      else new Path(qRoot, rel).toString
    }
    val files = snap.files.map(f => f.copy(
      path = abs(f.path),
      dv = f.dv.map(d => d.copy(path = abs(d.path)))))
    dstLog.commit(
      operation = "CLONE",
      mode = "shallow",
      schemaDdl = snap.schema.toDDL,
      partitionColumns = snap.partitionColumns,
      metadata = srcLog.tablePropertiesAt(snap.version) ++ Map(
        "cloneSource" -> qRoot.toString,
        "cloneSourceVersion" -> snap.version.toString),
      operationMetrics = Map(
        "numFiles" -> files.size.toLong,
        "numRecords" -> files.map(_.liveRecords).sum,
        "sizeBytes" -> files.map(_.sizeBytes).sum),
      add = files,
      remove = Nil)
  }

  /** Create `dstPath` as a DEEP clone of `srcPath` at `versionAsOf`
    * (default: latest): the pinned snapshot's data files (and deletion
    * vectors) are physically copied under the clone's root — executors
    * do the byte movement ([[org.apache.spark.sql.graft.GraftInternal
    * .distributedCopy]]), the driver only lists — and v0 references the
    * copies by relative path. Unlike a shallow clone the result is
    * fully self-contained: vacuuming or dropping the source can never
    * break it. Properties/constraints/protocol carry over identically.
    */
  def deep(
      spark: SparkSession,
      srcPath: String,
      dstPath: String,
      versionAsOf: Option[Long] = None): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val srcLog = new CommitLog(srcPath, conf)
    require(srcLog.tableExists(),
      s"deep clone source is not a graft table: $srcPath")
    val dstLog = new CommitLog(dstPath, conf)
    require(!dstLog.tableExists(),
      s"deep clone destination is already a graft table: $dstPath")
    val snap = srcLog.snapshot(versionAsOf)
    val srcRoot = new Path(srcPath)
    val qRoot = srcRoot.getFileSystem(conf).makeQualified(srcRoot)
    val dstRoot = new Path(dstPath)
    val qDst = dstRoot.getFileSystem(conf).makeQualified(dstRoot)
    def srcUri(ref: String): String = {
      val p = new Path(ref)
      if (p.isAbsolute || p.toUri.getScheme != null) p.toString
      else new Path(qRoot, ref).toString
    }
    // destination rel path: keep the source's layout for normal
    // (relative) refs; an absolute ref (deep-cloning a SHALLOW clone)
    // gets fresh hive-style partition dirs rebuilt from its
    // partitionValues, since its source-side layout is foreign here
    val seen = scala.collection.mutable.HashSet[String]()
    def uniq(rel: String): String =
      if (seen.add(rel)) rel
      else {
        val (stem, ext) = rel.lastIndexOf('.') match {
          case -1 => (rel, "")
          case i => (rel.substring(0, i), rel.substring(i))
        }
        Iterator.from(1).map(n => s"$stem-dup$n$ext").find(seen.add).get
      }
    def relFor(f: graft.log.AddFile): String = {
      val hp = new Path(f.path)
      if (!hp.isAbsolute && hp.toUri.getScheme == null) uniq(f.path)
      else {
        val dirs = snap.partitionColumns.map { c =>
          val v = f.partitionValues.getOrElse(c, "__HIVE_DEFAULT_PARTITION__")
          s"$c=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)}"
        }
        uniq((dirs :+ hp.getName).mkString("/"))
      }
    }
    val dvSeen = scala.collection.mutable.HashSet[String]()
    def dvRelFor(ref: String): String = {
      val name = new Path(ref).getName
      val rel = s"_dv/$name"
      if (dvSeen.add(rel)) rel
      else Iterator.from(1).map(n => s"_dv/dup$n-$name").find(dvSeen.add).get
    }
    val planned = snap.files.map { f =>
      val rel = relFor(f)
      val dvPair = f.dv.map(d => d -> dvRelFor(d.path))
      val copies =
        (srcUri(f.path) -> new Path(qDst, rel).toString) ::
          dvPair.map { case (d, r) =>
            srcUri(d.path) -> new Path(qDst, r).toString }.toList
      (f.copy(path = rel,
        dv = dvPair.map { case (d, r) => d.copy(path = r) }), copies)
    }
    val copied = org.apache.spark.sql.graft.GraftInternal
      .distributedCopy(spark, planned.flatMap(_._2))
    val files = planned.map(_._1)
    dstLog.commit(
      operation = "CLONE",
      mode = "deep",
      schemaDdl = snap.schema.toDDL,
      partitionColumns = snap.partitionColumns,
      metadata = srcLog.tablePropertiesAt(snap.version) ++ Map(
        "cloneSource" -> qRoot.toString,
        "cloneSourceVersion" -> snap.version.toString),
      operationMetrics = Map(
        "numFiles" -> files.size.toLong,
        "numRecords" -> files.map(_.liveRecords).sum,
        "sizeBytes" -> copied),
      add = files,
      remove = Nil)
  }
}
