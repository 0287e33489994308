package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Idempotent bulk file ingestion — Delta's `COPY INTO` contract applied
  * to a graft table: ingest every source file NOT yet recorded, so
  * re-running the same statement is an exact no-op (no commit, version
  * unchanged). This is the reference's idempotent re-materialization
  * guarantee (dagster_delta_tests/test_type_handler.py:53-66) applied
  * to foreign-file ingestion instead of asset outputs.
  *
  * Source-file identity is `(qualified path, size, mtime)`. Every COPY
  * INTO commit records the CUMULATIVE identity set it has seen under a
  * per-commit (non-carried) metadata key, so the already-ingested set is
  * read from the NEWEST surviving COPY INTO commit — one commit read,
  * not a history scan, and each property list is written once per COPY
  * INTO (never re-serialized by unrelated commits, which is why this is
  * NOT a carried-forward `graft.*` property). A re-uploaded source file
  * (same path, new size/mtime) is a NEW identity and ingests again —
  * same contract as Delta's COPY INTO.
  *
  * Retention caveat (inherent to log-backed dedup state, same as
  * Delta's): if log retention prunes EVERY COPY INTO commit, the
  * ingested set is forgotten and a re-run re-ingests. The cumulative
  * list makes this need ALL such commits to age out, not just one.
  *
  * Scale shape: the identity set is metadata-scale (one short string
  * per source file — the same order as the add-actions the ingest
  * itself appends); the data copy is one distributed read of only the
  * NEW files appended through the normal write path (stats, blooms,
  * constraints all apply).
  */
object CopyInto {

  /** Per-commit metadata key holding the cumulative ingested identity
    * set as a sorted, newline-joined list. Deliberately NOT
    * `graft.`-prefixed: it must live in the COPY INTO commit alone, not
    * be carried into (and re-serialized by) every later commit.
    */
  val SourcesKey: String = "copyInto.ingestedSources"

  /** Top-level source entries beyond this fan the recursive listing out
    * to executors.
    */
  private val DriverListLimit = 64

  final case class Result(
      /** Committed version; None when the run was a no-op. */
      version: Option[Long],
      ingestedFiles: Int,
      skippedFiles: Int)

  /** Ingest `sourceDir`'s files of `format` into the table at `path`.
    * Files whose identity is already recorded are skipped; if nothing
    * is new, NO commit happens. The table must exist (COPY INTO is an
    * ingestion statement, not a create).
    */
  def copyInto(
      spark: SparkSession,
      path: String,
      sourceDir: String,
      format: String = "parquet",
      /** Evolve the table schema when source files carry extra columns
        * (same semantics as the schema-evolution write mode).
        */
      mergeSchema: Boolean = false): Result = {
    require(format.equalsIgnoreCase("parquet"),
      s"COPY INTO supports FILEFORMAT = PARQUET here, got $format")
    val table = GraftTable(spark, path)
    val snap = table.snapshot() // must exist; also the CAS base
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(sourceDir)
    val fs = src.getFileSystem(conf)
    require(fs.exists(src), s"COPY INTO source not found: $sourceDir")

    // current source inventory (qualified path + size + mtime). Past a
    // handful of top-level entries the recursive walk fans out to
    // EXECUTORS (one task per entry slice) — a million-file ingest
    // source must never serialize its listing through the driver (the
    // same scale rule the vacuum orphan sweep follows)
    val topLevel = fs.listStatus(fs.makeQualified(src)).toSeq
    val listed: Seq[(String, Long, Long)] =
      if (topLevel.size <= DriverListLimit) {
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        val it = fs.listFiles(fs.makeQualified(src), true)
        while (it.hasNext) {
          val st = it.next()
          out += ((st.getPath.toString, st.getLen, st.getModificationTime))
        }
        out.toSeq
      } else
        org.apache.spark.sql.graft.GraftInternal.distributedListFilesMeta(
          spark, topLevel.map(_.getPath.toString))
    val inventory = listed.collect {
      case (p, len, mtime)
          if {
            val name = p.substring(p.lastIndexOf('/') + 1)
            !name.startsWith("_") && !name.startsWith(".") &&
              name.toLowerCase(java.util.Locale.ROOT).endsWith(".parquet")
          } =>
        (p, s"$p|$len|$mtime")
    }
    val seen = ingestedIdentities(table)
    val (skipped, fresh) = inventory.partition(f => seen(f._2))
    if (fresh.isEmpty)
      return Result(None, 0, skipped.size) // exact no-op: no commit

    // read the NEW files schema-on-read and let the normal write path
    // validate compatibility (loud mismatch unless mergeSchema) — the
    // copy goes through stats/bloom/constraint machinery like any append
    val incoming = spark.read.parquet(fresh.map(_._1).toSeq: _*)
    val cumulative = (seen ++ fresh.map(_._2)).toSeq.sorted
    val v = GraftWriter.write(spark, incoming, path,
      WriteOptions(
        mode = WriteMode.Append,
        schemaMode = if (mergeSchema) Some(SchemaMode.Merge) else None,
        metadata = Map(SourcesKey -> cumulative.mkString("\n"))))
    Result(Some(v), fresh.size, skipped.size)
  }

  /** The cumulative ingested identity set = the newest surviving COPY
    * INTO commit's record (each such commit carries the full set).
    */
  private def ingestedIdentities(table: GraftTable): Set[String] = {
    val log = table.log
    log.versions().reverse.iterator
      .map(v => log.readCommit(v))
      .collectFirst {
        case c if c.metadata.contains(SourcesKey) =>
          c.metadata(SourcesKey).split("\n").iterator
            .filter(_.nonEmpty).toSet
      }
      .getOrElse(Set.empty)
  }
}
