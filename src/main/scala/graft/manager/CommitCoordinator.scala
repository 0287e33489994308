package graft.manager

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}


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
  * snapshot, run the write on the branch, gate on a user predicate over
  * the branch result, then promote the branch's NET actions onto main in
  * one CAS commit.
  *
  * Like lakeFS (reference: lakefs_io/
  * deltalake_polars_lakefs_type_handler.py:114-148), both seed and
  * promote are O(metadata) — no data file is ever copied:
  *
  *  - '''Seed''' writes ONE branch commit-log entry whose AddFiles point
  *    at main's live data files by absolute path (the commit-log file
  *    index resolves absolute entries as-is, so branch reads serve
  *    main's bytes directly — a Delta shallow-clone).
  *  - The coordinated '''write''' runs against the branch: appends land
  *    as branch-local files; COW rewrites logically drop borrowed main
  *    files from the branch log (never physically — main is untouched
  *    throughout).
  *  - '''Promote''' computes the net diff vs the seed: branch-local
  *    files are renamed (O(1) each, no byte copy) into the main root and
  *    become adds; seeded main files no longer live on the branch become
  *    removes; one commit applies both, CAS-pinned to the seed version
  *    so a concurrent main commit fails the promotion with
  *    ConcurrentModificationException ([[RetryingCoordinator]] then
  *    re-runs the whole branch lifecycle from the fresh snapshot — the
  *    reference's retry contract, handler.py:33-61).
  *
  * The gate sees the full logical table (seed ∪ branch writes), so
  * Append/merge coordination validates the table a reader would see
  * after promotion, not just the new batch.
  */
final class BranchingCoordinator(
    gate: DataFrame => Boolean = _ => true) extends CommitCoordinator {
  import org.apache.hadoop.fs.Path

  def coordinate(spark: SparkSession, path: String)(write: String => Long): Long = {
    val p = new Path(path)
    val branch = new Path(
      p.getParent, s"_branches/${java.util.UUID.randomUUID()}/${p.getName}")
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    /** Normalized absolute (scheme-less) path of `rel` under `root`. */
    def abs(root: String, rel: String): String =
      fs.makeQualified(new Path(root, rel)).toUri.getPath
    try {
      val mainLog = new graft.log.CommitLog(path, conf)
      val branchLog = new graft.log.CommitLog(branch.toString, conf)
      // ---- seed: one metadata commit referencing main's files ----
      val seed: Option[graft.log.Snapshot] =
        if (!mainLog.tableExists()) None
        else {
          val snap = mainLog.snapshot()
          branchLog.commit(
            operation = "BRANCH SEED",
            mode = "branch",
            schemaDdl = snap.schema.toDDL,
            partitionColumns = snap.partitionColumns,
            // main's table properties (CDF flag, CHECK constraints, ...)
            // ride along so branch writes enforce the same contracts
            metadata = mainLog.tableProperties() ++
              Map("branched_from" -> path,
                "branched_at_version" -> snap.version.toString),
            operationMetrics = Map(
              "num_referenced_files" -> snap.files.size.toLong),
            add = snap.files.map(f => f.copy(path = abs(path, f.path))),
            remove = Nil)
          Some(snap)
        }
      write(branch.toString) // the coordinated write, on the seeded branch
      val branchDf = graft.io.GraftTable(spark, branch.toString).toDf()
      if (!gate(branchDf))
        throw new IllegalStateException(s"branch gate rejected write for $path")
      // ---- promote: net actions onto main, CAS-pinned to the seed ----
      val bSnap = branchLog.snapshot()
      // seeded entries are the absolute ones (GraftWriter only ever adds
      // branch-relative paths); everything else is a branch-local file
      val (borrowed, fresh) =
        bSnap.files.partition(f => new Path(f.path).isAbsolute)
      val borrowedAbs = borrowed.map(f => abs(path, f.path)).toSet
      val removes = seed.toSeq.flatMap(_.files)
        .filterNot(f => borrowedAbs(abs(path, f.path)))
        .map(f => graft.log.RemoveFile(f.path))
      // files renamed into main before the CAS commit are orphans if the
      // commit (or a later rename) throws — track and delete them before
      // re-raising, so each RetryingCoordinator attempt starts clean
      // instead of leaking a batch of unreferenced files under main
      val moved = scala.collection.mutable.ArrayBuffer[Path]()
      try {
        val adds = fresh.map { f =>
          val src = new Path(branch, f.path)
          var rel = f.path
          var dst = new Path(p, rel)
          if (fs.exists(dst)) { // name collision with an existing main file
            val segs = rel.split('/')
            rel = (segs.dropRight(1) :+
              s"${java.util.UUID.randomUUID()}-${segs.last}").mkString("/")
            dst = new Path(p, rel)
          }
          fs.mkdirs(dst.getParent)
          if (!fs.rename(src, dst))
            throw new java.io.IOException(s"promote rename $src -> $dst failed")
          moved += dst
          f.copy(path = rel)
        }
        mainLog.commit(
          operation = "BRANCH PROMOTE",
          mode = "branch",
          schemaDdl = bSnap.schema.toDDL,
          partitionColumns = bSnap.partitionColumns,
          metadata = Map("promoted_from" -> branch.toString),
          operationMetrics = Map(
            "num_added_files" -> adds.size.toLong,
            "num_removed_files" -> removes.size.toLong,
            "num_output_rows" -> adds.map(_.numRecords).sum),
          add = adds,
          remove = removes,
          // a commit that slipped in since the seed invalidates the net
          // diff — fail the CAS and let RetryingCoordinator re-branch
          expectedVersion = seed.map(_.version))
      } catch {
        case NonFatal(e) =>
          moved.foreach { d =>
            try fs.delete(d, false) catch { case NonFatal(_) => () }
          }
          throw e
      }
    } finally {
      fs.delete(branch.getParent, true) // drop the branch
    }
  }
}
