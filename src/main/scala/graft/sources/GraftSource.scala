package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
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

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    if (cdfOf(parameters)) {
      // Delta's batch-CDF surface: startingVersion (inclusive, required
      // — serving "all changes ever" implicitly would turn a typo into
      // a full-history scan) + optional endingVersion (inclusive)
      val from = parameters.get("startingVersion").map(_.toLong).getOrElse(
        throw new IllegalArgumentException(
          "readChangeFeed batch reads require option(\"startingVersion\", v) " +
            "(inclusive; optional endingVersion defaults to latest)"))
      // resolve the ending version ONCE at relation construction — a
      // commit landing between analysis and execution must not shift the
      // scanned range/alignment snapshot away from the analyzed schema
      GraftChangesRelation(
        sqlContext, pathOf(parameters), from,
        parameters.get("endingVersion").map(_.toLong).getOrElse(
          GraftTable(sqlContext.sparkSession, pathOf(parameters)).version()))
    } else
      GraftRelation(
        sqlContext,
        pathOf(parameters),
        parameters.get("versionAsOf").map(_.toLong))

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
      parameters.get("startingVersion").map(_.toLong),
      parameters.get("maxCommitsPerTrigger").map(_.toLong),
      readChangeFeed = cdfOf(parameters))
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
    versionAsOf: Option[Long])
    extends BaseRelation
    with PrunedFilteredScan {

  private def table = GraftTable(sqlContext.sparkSession, path)

  override val schema: StructType = table.snapshot(versionAsOf).schema

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
