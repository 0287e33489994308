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
}
