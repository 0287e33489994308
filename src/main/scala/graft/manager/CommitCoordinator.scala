package graft.manager

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{GraftWriter, WriteOptions}

/** Branch-isolated transactional write coordination — the Spark-native
  * mirror of the reference's lakeFS flow (branch per write -> write ->
  * diff-gate -> merge -> delete branch, with exponential-backoff retry on
  * conflicts: dagster_delta_polars/lakefs_io/
  * deltalake_polars_lakefs_type_handler.py:87-159, retry 33-61,
  * gate 134-142).
  *
  * The coordinator is a pluggable trait so a real lakeFS/catalog-backed
  * implementation can be dropped in; [[DirectCoordinator]] degrades to
  * plain optimistic commits (adequate single-driver), and
  * [[BranchingCoordinator]] implements the full branch lifecycle against
  * any filesystem by writing to a branch directory and promoting the
  * commit only after a gate check passes.
  */
trait CommitCoordinator {
  /** Run `write` transactionally; returns the committed version. */
  def coordinate(spark: SparkSession, path: String)(
      write: String => Long): Long
}

/** No isolation: write straight to the table (the base library's mode —
  * the commit-log rename is the only atomicity point).
  */
final class DirectCoordinator extends CommitCoordinator {
  def coordinate(spark: SparkSession, path: String)(write: String => Long): Long =
    write(path)
}

/** Retry with exponential backoff on transient failures (reference
  * constants: 5 retries, base 4s — we default lower for tests; jitter is
  * deterministic-free backoff since retries are driver-side).
  */
final class RetryingCoordinator(
    inner: CommitCoordinator,
    maxRetries: Int = 5,
    baseBackoffMs: Long = 4000,
    sleeper: Long => Unit = Thread.sleep) extends CommitCoordinator {
  def coordinate(spark: SparkSession, path: String)(write: String => Long): Long = {
    var attempt = 0
    while (true) {
      try return inner.coordinate(spark, path)(write)
      catch {
        case NonFatal(e) if attempt < maxRetries &&
            (e.isInstanceOf[java.util.ConcurrentModificationException] ||
             e.isInstanceOf[java.io.IOException]) =>
          sleeper(baseBackoffMs * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Branch-per-write against a plain filesystem: seed a branch at
  * `<table>/../_branches/<uuid>/<table-name>` from the current main
  * snapshot (lakeFS branches start from main's contents — on real lakeFS
  * this is an O(1) metadata operation; on a plain FS it is a physical
  * copy, so this coordinator is for gate/audit workflows, not the 100 TB
  * hot path), run the write on the branch, gate on a user predicate over
  * the branch result, then replay the branch contents onto the main
  * table in one commit. Seeding makes Append/merge writes correct: the
  * branch holds the full logical table, so the Overwrite promotion
  * preserves pre-existing main data instead of replacing the table with
  * just the new batch.
  */
final class BranchingCoordinator(
    gate: DataFrame => Boolean = _ => true) extends CommitCoordinator {
  def coordinate(spark: SparkSession, path: String)(write: String => Long): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val branch = new org.apache.hadoop.fs.Path(
      p.getParent, s"_branches/${java.util.UUID.randomUUID()}/${p.getName}")
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    try {
      val mainLog = new graft.log.CommitLog(path, conf)
      if (mainLog.tableExists()) {
        val snap = mainLog.snapshot()
        GraftWriter.write(spark, graft.io.GraftTable(spark, path).toDf(), branch.toString,
          WriteOptions(mode = graft.io.WriteMode.Overwrite,
            partitionBy = snap.partitionColumns,
            metadata = Map("branched_from" -> path,
              "branched_at_version" -> snap.version.toString)))
      }
      write(branch.toString) // the coordinated write, on the seeded branch
      val branchDf = graft.io.GraftTable(spark, branch.toString).toDf()
      if (!gate(branchDf))
        throw new IllegalStateException(s"branch gate rejected write for $path")
      // promote: replay branch contents onto main in a single commit
      GraftWriter.write(spark, branchDf, path,
        WriteOptions(mode = graft.io.WriteMode.Overwrite,
          metadata = Map("promoted_from" -> branch.toString)))
    } finally {
      fs.delete(branch.getParent, true) // drop the branch
    }
  }
}
