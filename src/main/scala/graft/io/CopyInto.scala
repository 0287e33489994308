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
  * INTO commit records ONLY the identities it newly ingested under a
  * per-commit (non-carried) metadata key; the already-ingested set is
  * the UNION of those records across the retained log. Per-commit
  * metadata therefore stays O(new files) no matter how many runs have
  * accumulated — a million-file source ingested over hundreds of runs
  * never re-serializes the full set into any single commit. A
  * re-uploaded source file (same path, new size/mtime) is a NEW
  * identity and ingests again — same contract as Delta's COPY INTO.
  *
  * Concurrency: the append commit is compare-and-swapped on the
  * snapshot version the seen-set was read at, so two racing COPY INTOs
  * cannot both ingest the same files — the loser re-reads the (now
  * larger) seen-set and retries, usually degrading to a no-op.
  *
  * Retention: log cleanup FOLDS the identity records of pruned COPY
  * INTO commits into a sidecar before deleting them
  * ([[graft.log.CommitLog.RetentionFoldedKeys]]), and the seen-set
  * unions it back in — routine checkpoint+retention maintenance never
  * forgets what was ingested. RESTORE interaction: restoring the
  * table to a pre-COPY version reverts the DATA but the COPY commit
  * (and its identity record) remains in the log, so a re-run does NOT
  * re-ingest the rolled-back rows — re-upload the source files (new
  * mtime = new identity) to force re-ingestion after a RESTORE.
  *
  * Scale shape: the identity records are metadata-scale (one short
  * string per NEW source file — the same order as the add-actions the
  * ingest itself appends); the data copy is one distributed read of
  * only the NEW files appended through the normal write path (stats,
  * blooms, constraints all apply).
  */
object CopyInto {

  /** Per-commit metadata key holding the identities newly ingested BY
    * THAT COMMIT as a sorted, newline-joined list. Deliberately NOT
    * `graft.`-prefixed: it must live in the COPY INTO commit alone, not
    * be carried into (and re-serialized by) every later commit.
    * (Commits from older builds carried the cumulative set under the
    * same key; the union read handles both encodings.)
    */
  val SourcesKey: String = "copyInto.ingestedSources"

  /** Top-level source entries beyond this fan the recursive listing out
    * to executors.
    */
  private val DriverListLimit = 64

  private val SupportedFormats = Seq("parquet", "json", "csv")

  /** File extensions admitted per format (the data-file filter —
    * anything else in the source tree is skipped, or refused when
    * EXPLICITLY named via FILES).
    */
  private def extensionsOf(format: String): Seq[String] =
    format.toLowerCase(java.util.Locale.ROOT) match {
      case "parquet" => Seq(".parquet")
      case "json"    => Seq(".json", ".jsonl")
      case "csv"     => Seq(".csv")
      case other     => throw new IllegalArgumentException(other)
    }

  final case class Result(
      /** Committed version; None when the run was a no-op. */
      version: Option[Long],
      ingestedFiles: Int,
      skippedFiles: Int)

  /** Ingest `sourceDir`'s files of `format` (PARQUET / JSON / CSV —
    * text formats read with the target table's schema unless
    * `mergeSchema` infers) into the table at `path`.
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
      mergeSchema: Boolean = false,
      /** `PATTERN = 'glob'`: restrict the source listing to files whose
        * path RELATIVE to `sourceDir` matches the glob (`*`, `?`,
        * `[...]`, `{a,b}`, and `**` across directories). Exclusive with
        * `files`.
        */
      pattern: Option[String] = None,
      /** `FILES = (...)`: ingest exactly these files (named relative to
        * `sourceDir`); a named file that does not exist fails loudly.
        * Exclusive with `pattern`.
        */
      files: Option[Seq[String]] = None,
      /** `FORMAT_OPTIONS ('k' = 'v', ...)`: reader options for text
        * formats, layered OVER the loud defaults (`mode = FAILFAST` —
        * a malformed or schema-mismatched text file must abort the
        * ingest, never commit NULLs; CSV adds `header = true` and
        * `enforceSchema = false`, so header names are VALIDATED against
        * the target schema instead of mapped by position). A headerless
        * CSV landing zone passes `'header' = 'false'`.
        */
      formatOptions: Map[String, String] = Map.empty): Result = {
    require(SupportedFormats.exists(_.equalsIgnoreCase(format)),
      s"COPY INTO supports FILEFORMAT = " +
        s"${SupportedFormats.map(_.toUpperCase).mkString("/")} here, got $format")
    require(pattern.isEmpty || files.isEmpty,
      "COPY INTO takes PATTERN or FILES, not both")
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(sourceDir)
    val fs = src.getFileSystem(conf)
    require(fs.exists(src), s"COPY INTO source not found: $sourceDir")
    val qualifiedSrc = fs.makeQualified(src).toString

    val extensions = extensionsOf(format)
    def isDataFile(p: String): Boolean = {
      val name = p.substring(p.lastIndexOf('/') + 1)
      !name.startsWith("_") && !name.startsWith(".") &&
        extensions.exists(name.toLowerCase(java.util.Locale.ROOT).endsWith)
    }
    def relative(p: String): String =
      p.stripPrefix(qualifiedSrc).stripPrefix("/")

    // current source inventory (qualified path + size + mtime). FILES
    // stats exactly the named files — no directory walk at all. For a
    // directory listing, past a handful of top-level entries the
    // recursive walk fans out to EXECUTORS (one task per entry slice) —
    // a million-file ingest source must never serialize its listing
    // through the driver (the same scale rule the vacuum orphan sweep
    // follows)
    val listed: Seq[(String, Long, Long)] = files match {
      case Some(names) =>
        require(names.nonEmpty, "COPY INTO FILES list is empty")
        names.map { n =>
          val fp = fs.makeQualified(new Path(src, n))
          require(fs.exists(fp), s"COPY INTO FILES entry not found: $fp")
          val st = fs.getFileStatus(fp)
          require(st.isFile, s"COPY INTO FILES entry is a directory: $fp")
          (fp.toString, st.getLen, st.getModificationTime)
        }
      case None =>
        val topLevel = fs.listStatus(fs.makeQualified(src)).toSeq
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
    }
    val globMatch: String => Boolean = pattern match {
      case Some(g) =>
        // java.nio glob: the standard *, ?, [...], {a,b}, ** semantics;
        // matched against the path RELATIVE to the source dir, like
        // Delta's PATTERN
        val m = java.nio.file.FileSystems.getDefault
          .getPathMatcher("glob:" + g)
        p => m.matches(java.nio.file.Paths.get(relative(p)))
      case None => _ => true
    }
    // an EXPLICITLY named file that the data-file filter would drop
    // (hidden/underscore prefix, or an extension not admitted by the
    // declared FILEFORMAT) fails loudly — silently ignoring a FILES
    // entry would report a clean no-op for a file the user demanded
    if (files.isDefined) listed.foreach { case (p, _, _) =>
      require(isDataFile(p),
        s"COPY INTO FILES entry is not an ingestible $format data file " +
          s"(hidden/underscore-prefixed or wrong extension): $p")
    }
    val inventory = listed.collect {
      case (p, len, mtime) if isDataFile(p) && globMatch(p) =>
        (p, s"$p|$len|$mtime")
    }

    // CAS loop: the seen-set is read at a snapshot version and the
    // append commits against exactly that version — a concurrent COPY
    // INTO landing in between forces a re-derivation here instead of a
    // double ingest
    var attempt = 0
    while (true) {
      val table = GraftTable(spark, path)
      val snap = table.snapshot() // must exist; also the CAS base
      val seen = ingestedIdentities(table)
      val (skipped, fresh) = inventory.partition(f => seen(f._2))
      if (fresh.isEmpty)
        return Result(None, 0, skipped.size) // exact no-op: no commit

      // read the NEW files and let the normal write path validate
      // compatibility (loud mismatch unless mergeSchema) — the copy
      // goes through stats/bloom/constraint machinery like any append.
      // Parquet is schema-on-read; text formats (json/csv) read with
      // the TARGET table's schema (text inference is unstable — a batch
      // of all-integer values in a double column would flip the type),
      // EXCEPT under mergeSchema, where inference is the point
      val freshPaths = fresh.map(_._1).toSeq
      val incoming = format.toLowerCase(java.util.Locale.ROOT) match {
        case "parquet" => spark.read.parquet(freshPaths: _*)
        case "json" =>
          // FAILFAST catches MALFORMED records; a well-formed file
          // whose fields simply don't match the target would still
          // read as all-NULL rows under a forced schema — so the
          // inferred field set must be CONTAINED in the target schema
          // (one sampling-bound inference pass over the NEW files only)
          val r = spark.read
            .options(Map("mode" -> "FAILFAST") ++ formatOptions)
          if (mergeSchema) r.json(freshPaths: _*)
          else {
            val target = snap.schema.fieldNames
              .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
            val unknown = r.json(freshPaths: _*).schema.fieldNames
              .filterNot(f => target(f.toLowerCase(java.util.Locale.ROOT)))
            require(unknown.isEmpty,
              s"COPY INTO source JSON carries fields not in the target " +
                s"schema: ${unknown.mkString(", ")} (add MERGE SCHEMA to " +
                "evolve, or fix the source)")
            r.schema(snap.schema).json(freshPaths: _*)
          }
        case "csv" =>
          // enforceSchema=false: header NAMES validate against the
          // target schema (positional mapping would silently swap
          // reordered columns); headerless zones pass header=false
          val r = spark.read.options(Map(
            "header" -> "true", "enforceSchema" -> "false",
            "mode" -> "FAILFAST") ++ formatOptions)
          (if (mergeSchema) r.option("inferSchema", "true")
           else r.schema(snap.schema)).csv(freshPaths: _*)
      }
      try {
        val v = GraftWriter.write(spark, incoming, path,
          WriteOptions(
            mode = WriteMode.Append,
            schemaMode = if (mergeSchema) Some(SchemaMode.Merge) else None,
            metadata =
              Map(SourcesKey -> fresh.map(_._2).sorted.mkString("\n")),
            casOnVersion = Some(snap.version)))
        return Result(Some(v), fresh.size, skipped.size)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= 5) throw e
          attempt += 1 // re-read the seen-set against the fresh log
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The cumulative ingested identity set = the union of every retained
    * COPY INTO commit's record (each records only ITS new files; old
    * builds recorded cumulative sets — a superset union is harmless)
    * PLUS the records log retention folded out of pruned commits
    * ([[graft.log.CommitLog.foldedMetadata]]) — so routine
    * checkpoint+cleanOldLogs maintenance never forgets what was
    * ingested and silently re-ingests old source files.
    */
  private def ingestedIdentities(table: GraftTable): Set[String] = {
    val log = table.log
    val out = Set.newBuilder[String]
    // ORDER MATTERS: commits first, sidecars second. Retention writes
    // the fold BEFORE deleting the commits it covers, so a commit
    // missing from the listing implies its sidecar already exists — the
    // reverse order has a window (sidecar not yet read, commit already
    // pruned) where a concurrent cleanOldLogs hides identities and a
    // racing COPY INTO silently re-ingests.
    log.versions().foreach { v =>
      val c = log.readCommit(v)
      c.metadata.get(SourcesKey).foreach { s =>
        s.split("\n").iterator.filter(_.nonEmpty).foreach(out += _)
      }
    }
    out ++= log.foldedMetadata(SourcesKey)
    out.result()
  }
}
