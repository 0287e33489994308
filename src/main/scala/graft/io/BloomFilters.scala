package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Parquet-footer bloom filters as a point-lookup index (declared via
  * table property `graft.bloom.cols` = comma-separated column names).
  *
  * High-cardinality equality lookup on a non-clustered column (dedup by
  * URL, id probes) defeats footer min/max skipping: uniform hashes span
  * every file's [min, max], so each file survives the interval test and
  * gets scanned. Parquet's per-column split-block bloom filters
  * (`parquet.bloom.filter.enabled#<col>`) answer "is this value
  * POSSIBLY in this row group" from the footer alone; consulting them
  * during file pruning turns a full-table point probe into a scan of
  * O(files that may hold the key) — typically one or two plus the false
  * positives (~1% at parquet's default NDV sizing).
  *
  * Scale posture: footer consultation costs one ranged read per
  * surviving candidate file, so it runs ONLY for `=`/`IN` filters on
  * DECLARED columns, only on files that already survived min/max
  * pruning, and in parallel across a bounded pool. Absent filters
  * (pre-declaration files, foreign writers) and any read error keep the
  * file — the residual filter above the scan guarantees correctness
  * either way, same contract as every other skipping path.
  */
object BloomFilters {

  val PropKey: String = graft.log.CommitLog.ReservedPrefix + "bloom.cols"

  def colsOf(props: Map[String, String]): Seq[String] =
    props.get(PropKey).toSeq
      .flatMap(_.split(",").iterator.map(_.trim).filter(_.nonEmpty))

  /** Parquet writer options enabling footer bloom filters for the
    * declared columns — keyed by PHYSICAL name (files are written under
    * physical names; ColumnMapping invariant).
    */
  def writerOptions(props: Map[String, String]): Map[String, String] = {
    val cols = colsOf(props)
    if (cols.isEmpty) Map.empty
    else {
      val m = ColumnMapping.fromProps(props)
      cols.map { c =>
        s"parquet.bloom.filter.enabled#${ColumnMapping.physicalName(m, c)}" ->
          "true"
      }.toMap
    }
  }

  /** Declared bloom columns as PHYSICAL names at a snapshot. */
  def physColsOf(snap: graft.log.Snapshot): Set[String] = {
    val props = snap.commits.last.metadata
      .filter { case (k, _) => k.startsWith(graft.log.CommitLog.ReservedPrefix) }
    val cols = colsOf(props)
    if (cols.isEmpty) Set.empty
    else {
      val m = ColumnMapping.fromSnapshot(snap)
      cols.map(ColumnMapping.physicalName(m, _)).toSet
    }
  }

  /** Consult `file`'s footer bloom filters for EVERY check in one
    * footer open (one ranged read per file regardless of how many
    * declared columns the query probes): false ONLY when some check's
    * values are provably absent from every row group. A row group
    * without a filter, a value the column's physical type cannot hash,
    * or any IO error keeps the file (conservative).
    */
  def mayContain(
      conf: Configuration,
      file: Path,
      checks: Seq[(String, Seq[Any])]): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, FLOAT, INT32, INT64}
    val live = checks.filter(_._2.nonEmpty)
    if (live.isEmpty) return true
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        import scala.jdk.CollectionConverters._
        val groups = r.getRowGroups.asScala.toSeq
        groups.isEmpty || live.forall { case (physCol, values) =>
          groups.exists { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == physCol) match {
              case None => true // column absent (schema evolution): keep
              case Some(md) =>
                val bf = r.getBloomFilterDataReader(block).readBloomFilter(md)
                if (bf == null) true // no filter written: keep
                else {
                  val prim = md.getPrimitiveType.getPrimitiveTypeName
                  def mayHold(v: Any): Boolean = {
                    val hash: Option[Long] = (prim, v) match {
                      case (INT64, n: Number)  => Some(bf.hash(n.longValue()))
                      case (INT32, n: Number)  => Some(bf.hash(n.intValue()))
                      case (DOUBLE, n: Number) => Some(bf.hash(n.doubleValue()))
                      case (FLOAT, n: Number)  => Some(bf.hash(n.floatValue()))
                      case (BINARY, s: String) => Some(bf.hash(Binary.fromString(s)))
                      case _                   => None // unhashable: keep
                    }
                    hash.forall(bf.findHash)
                  }
                  values.exists(mayHold)
                }
            }
          }
        }
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => true }
  }

  /** Candidate sets beyond this fan the footer reads out to EXECUTORS
    * instead of the driver's thread pool — a million-file point probe
    * must not serialize a million ranged reads through one process.
    */
  val DriverPruneLimit = 512

  /** File-pruning pass over `files` for `=`/`IN` filters on declared
    * bloom columns: returns the relative paths that may hold a match.
    * Footer reads run in parallel — driver thread pool for small
    * candidate sets, executor tasks past [[DriverPruneLimit]] (one
    * ranged read per file either way; that read is the cost this index
    * trades for skipping whole scans).
    */
  def pruneFiles(
      conf: Configuration,
      tablePath: String,
      files: Seq[graft.log.AddFile],
      checks: Seq[(String, Seq[Any])],
      spark: Option[org.apache.spark.sql.SparkSession] = None): Set[String] = {
    if (files.isEmpty || checks.isEmpty) return files.map(_.path).toSet
    spark match {
      case Some(s) if files.size > DriverPruneLimit =>
        val tp = tablePath
        val cks = checks
        org.apache.spark.sql.graft.GraftInternal
          .distributedFilter(s, files.map(_.path),
            (c, rel) => mayContain(c, new Path(tp, rel), cks))
          .toSet
      case _ =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(files.size,
            Runtime.getRuntime.availableProcessors())))
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val futs = files.map { f =>
            Future {
              val abs = new Path(tablePath, f.path)
              if (mayContain(conf, abs, checks)) Some(f.path) else None
            }
          }
          Await.result(Future.sequence(futs),
            scala.concurrent.duration.Duration.Inf).flatten.toSet
        } finally pool.shutdown()
    }
  }
}
