package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.io.{DataFilter, GraftTable, SkipOp}

/** Registers graft tables as a Spark data source format:
  *
  * {{{
  * spark.read.format("graft").load(path)
  * spark.read.format("graft").option("versionAsOf", 3).load(path)
  * }}}
  *
  * Built on the stable V1 source API: [[PrunedFilteredScan]] receives the
  * required columns and the pushable filters from Catalyst, maps them to
  * commit-log **data skipping** (file-level min/max pruning) plus the
  * normal parquet pushdown, and returns the pruned plan's RDD. Filters
  * are also re-applied by Spark above the scan, so unhandled filter
  * shapes stay correct automatically.
  */
final class GraftSource
    extends RelationProvider
    with SchemaRelationProvider
    with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))

  private def startOf(
      sqlContext: SQLContext, parameters: Map[String, String]): Option[Long] =
    GraftReadOptions.start(
      sqlContext.sparkSession, pathOf(parameters), parameters)

  private def rowIdsOf(parameters: Map[String, String]): Boolean =
    parameters.get("withRowIds").exists(_.equalsIgnoreCase("true"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    if (cdfOf(parameters)) {
      // ignoring the option would hand an id-keyed consumer the wrong
      // columns without a sound
      require(!rowIdsOf(parameters),
        "withRowIds is not supported together with readChangeFeed")
      // Delta's batch-CDF surface: startingVersion/startingTimestamp
      // (inclusive, one required — serving "all changes ever" implicitly
      // would turn a typo into a full-history scan) + optional
      // endingVersion/endingTimestamp (inclusive)
      val from = startOf(sqlContext, parameters).getOrElse(
        throw new IllegalArgumentException(
          "readChangeFeed batch reads require option(\"startingVersion\", v) " +
            "or option(\"startingTimestamp\", ts) (inclusive; optional " +
            "endingVersion/endingTimestamp defaults to latest)"))
      // resolve the ending version ONCE at relation construction — a
      // commit landing between analysis and execution must not shift the
      // scanned range/alignment snapshot away from the analyzed schema
      GraftChangesRelation(
        sqlContext, pathOf(parameters), from,
        GraftReadOptions.end(
          sqlContext.sparkSession, pathOf(parameters), parameters))
    } else
      GraftRelation(
        sqlContext,
        pathOf(parameters),
        GraftReadOptions.asOf(
          sqlContext.sparkSession, pathOf(parameters), parameters),
        withRowIds =
          parameters.get("withRowIds").exists(_.equalsIgnoreCase("true")))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation =
    createRelation(sqlContext, parameters) // schema comes from the log

  // ---- spark.readStream.format("graft") (see GraftStreamSource) ----

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(!rowIdsOf(parameters),
      "withRowIds is not supported on streaming reads")
    val path = pathOf(parameters)
    val base = GraftTable(sqlContext.sparkSession, path).snapshot().schema
    (shortName(),
      if (cdfOf(parameters))
        org.apache.spark.sql.graft.GraftStreamSource.cdfSchema(base)
      else base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new org.apache.spark.sql.graft.GraftStreamSource(
      sqlContext,
      pathOf(parameters),
      startOf(sqlContext, parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toLong),
      readChangeFeed = cdfOf(parameters),
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toLong),
      // accepts byte-string suffixes ("1g", "512m") like Delta's option
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger")
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes))
}

/** Batch change-feed relation (Delta's
  * `read.option("readChangeFeed").option("startingVersion", ...)`):
  * rows are the exact per-commit changes of commits
  * `[fromVersion, endingVersion ?: latest]` — table columns +
  * `_change_type` — via [[graft.io.GraftTable.changesForCommits]]
  * (always per-commit granularity, cost scales with the range's churn).
  */
final case class GraftChangesRelation(
    sqlContext: SQLContext,
    path: String,
    fromVersion: Long,
    toVersion: Long)
    extends BaseRelation
    with org.apache.spark.sql.sources.TableScan {

  private def table = GraftTable(sqlContext.sparkSession, path)

  override def schema: StructType =
    org.apache.spark.sql.graft.GraftStreamSource.cdfSchema(
      table.snapshot(Some(toVersion)).schema)

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    table.changesForCommits(
      fromVersion, toVersion, table.snapshot(Some(toVersion))).rdd
}

final case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    versionAsOf: Option[Long],
    /** `option("withRowIds", "true")`: append `_graft_row_id` (row
      * tracking — [[graft.io.RowTracking]]); requires the property.
      */
    withRowIds: Boolean = false)
    extends BaseRelation
    with PrunedFilteredScan {

  private def table = GraftTable(sqlContext.sparkSession, path)

  if (withRowIds) require(
    graft.io.RowTracking.enabled(table.log.tableProperties()),
    s"withRowIds read of $path requires the " +
      s"${graft.log.CommitLog.RowTrackingKey} = true table property")

  override val schema: StructType = {
    val base = table.snapshot(versionAsOf).schema
    if (!withRowIds) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        graft.io.RowTracking.Col, org.apache.spark.sql.types.LongType,
        nullable = true),
      org.apache.spark.sql.types.StructField(
        graft.io.RowTracking.VersionCol, org.apache.spark.sql.types.LongType,
        nullable = true)))
  }

  /** Map Catalyst source filters to data-skipping filters where the shape
    * allows (comparisons against literals on stat-bearing columns).
    */
  private def toSkip(f: Filter): Seq[DataFilter] = f match {
    case EqualTo(a, v)            => Seq(DataFilter(a, SkipOp.Eq, v))
    case LessThan(a, v)           => Seq(DataFilter(a, SkipOp.Lt, v))
    case LessThanOrEqual(a, v)    => Seq(DataFilter(a, SkipOp.Le, v))
    case GreaterThan(a, v)        => Seq(DataFilter(a, SkipOp.Gt, v))
    case GreaterThanOrEqual(a, v) => Seq(DataFilter(a, SkipOp.Ge, v))
    case IsNull(a)                => Seq(DataFilter(a, SkipOp.IsNull))
    case IsNotNull(a)             => Seq(DataFilter(a, SkipOp.IsNotNull))
    case In(a, vs) if vs.forall(_ != null) =>
      Seq(DataFilter(a, SkipOp.In, vs.toSeq))
    case And(l, r)                => toSkip(l) ++ toSkip(r)
    case _                        => Nil // Or/StartsWith/...: residual only
  }

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    // row-id reads come from the native plan (they need the file/index
    // metadata columns the V1 scan cannot surface) — no skipping here;
    // extension users never reach this branch (the substitution rule
    // rewrites to the native plan with pushdown intact)
    if (withRowIds) {
      val df = table.toDfWithRowIds(versionAsOf)
      val projected =
        if (requiredColumns.isEmpty) df
        else df.select(requiredColumns.head, requiredColumns.tail: _*)
      return projected.rdd
    }
    val skips = filters.toSeq.flatMap(toSkip)
      .filter(d => d.op == SkipOp.IsNull || d.op == SkipOp.IsNotNull ||
        (d.value != null && !d.value.isInstanceOf[Array[_]]))
    val pruned: DataFrame = table.scanPruned(skips, versionAsOf)
    val projected =
      if (requiredColumns.isEmpty) pruned
      else pruned.select(requiredColumns.head, requiredColumns.tail: _*)
    projected.rdd
  }
}

/** Shared resolution of version/timestamp read options — one contract
  * for the path route (`format("graft")`), the catalog route, and the
  * streaming source:
  *   - `versionAsOf` | `timestampAsOf` — plain time travel (at-or-before);
  *   - `startingVersion` | `startingTimestamp` — CDF/stream start
  *     (first commit AT OR AFTER the timestamp, Delta's semantics);
  *   - `endingVersion` | `endingTimestamp` — CDF end (at-or-before;
  *     defaults to the current latest version, resolved once).
  * Timestamps parse as `yyyy-MM-dd[ HH:mm:ss[.S]]` in the SESSION
  * timezone — the same clock `TIMESTAMP AS OF` resolves against.
  */
object GraftReadOptions {

  def tsMillis(spark: SparkSession, s: String): Long = {
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val local = scala.util.Try(
      java.time.LocalDateTime.parse(s.trim.replace(' ', 'T')))
      .orElse(scala.util.Try(
        java.time.LocalDate.parse(s.trim).atStartOfDay()))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse timestamp '$s' (expected yyyy-MM-dd[ HH:mm:ss[.S]])"))
    local.atZone(zone).toInstant.toEpochMilli
  }

  private def oneOf(
      opts: Map[String, String], vKey: String, tsKey: String): Unit =
    require(opts.get(vKey).isEmpty || opts.get(tsKey).isEmpty,
      s"set either $vKey or $tsKey, not both")

  def asOf(
      spark: SparkSession, path: String, opts: Map[String, String]): Option[Long] = {
    oneOf(opts, "versionAsOf", "timestampAsOf")
    opts.get("versionAsOf").map(_.toLong)
      .orElse(opts.get("timestampAsOf").map(s =>
        GraftTable(spark, path).versionAtTimestamp(tsMillis(spark, s))))
  }

  def start(
      spark: SparkSession, path: String, opts: Map[String, String]): Option[Long] = {
    oneOf(opts, "startingVersion", "startingTimestamp")
    opts.get("startingVersion").map(_.toLong)
      .orElse(opts.get("startingTimestamp").map(s =>
        GraftTable(spark, path).versionAtOrAfterTimestamp(tsMillis(spark, s))))
  }

  def end(
      spark: SparkSession, path: String, opts: Map[String, String]): Long = {
    oneOf(opts, "endingVersion", "endingTimestamp")
    opts.get("endingVersion").map(_.toLong)
      .orElse(opts.get("endingTimestamp").map(s =>
        GraftTable(spark, path).versionAtTimestamp(tsMillis(spark, s))))
      .getOrElse(GraftTable(spark, path).version())
  }
}
