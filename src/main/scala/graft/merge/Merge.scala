package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}

/** The reference's four merge strategies
  * (reference: dagster_delta/config.py:190-196, handler.py:70-120).
  */
sealed trait MergeType { def name: String }
object MergeType {
  /** matched → update all columns; unmatched source rows dropped. */
  case object UpdateOnly extends MergeType { val name = "update_only" }
  /** insert only source rows with no match (write-time dedup). */
  case object DeduplicateInsert extends MergeType { val name = "deduplicate_insert" }
  /** matched → update; unmatched source → insert. */
  case object Upsert extends MergeType { val name = "upsert" }
  /** matched → update; target rows unmatched by source → delete; no
    * insert clause (reference: handler.py:117-118).
    */
  case object ReplaceDeleteUnmatched extends MergeType { val name = "replace_delete_unmatched" }
}

/** Merge configuration (reference: dagster_delta/config.py:199-215):
  * `predicate` is a SQL join condition over `source_alias`/`target_alias`
  * (e.g. "s.a = t.a"), overridable per output
  * (handler.py:83-88,150).
  */
final case class MergeConfig(
    mergeType: MergeType,
    predicate: String,
    sourceAlias: String = "s",
    targetAlias: String = "t",
    /** Partition-scope predicate on the target: rows outside it are left
      * untouched and the merge scan is confined to it
      * (reference ANDs partition conjuncts into the merge predicate,
      * handler.py:92-98).
      */
    partitionFilter: Option[Column] = None,
    /** Reject source columns whose type differs from the target's
      * (reference: config.py `error_on_type_mismatch`, default true).
      */
    errorOnTypeMismatch: Boolean = true,
    metadata: Map[String, String] = Map.empty)

final case class MergeStats(
    version: Long,
    numSourceRows: Long,
    numOutputRows: Long)

/** Executes merges as declarative join plans over [[GraftTable]] — every
  * strategy is pure-relational (and therefore oracle-checkable):
  *
  *   - update_only:   (t LEFT JOIN s) project s-if-matched-else-t
  *   - dedup_insert:  t UNION ALL (s LEFT ANTI JOIN t)
  *   - upsert:        update_only ∪ (s LEFT ANTI JOIN t)
  *   - replace_delete_unmatched: s LEFT SEMI JOIN t
  *
  * If the target table doesn't exist it is created empty from the source
  * schema first (reference: handler.py:241-252).
  *
  * Multi-match caveat: when one target row matches several source rows the
  * update strategies emit one row per match (Delta errors instead). Callers
  * needing Delta semantics should de-duplicate the source on the merge key
  * first (e.g. with [[graft.ext.Dedup.latestByKey]]).
  *
  * Scale notes: the join shuffles on the merge keys; Catalyst picks
  * broadcast when the source is small (the common CDC case). The rewrite is
  * confined to `partitionFilter` when given, so a partition-scoped merge
  * touches only those partitions' files.
  */
object MergeExecutor {

  def merge(
      spark: SparkSession,
      source: DataFrame,
      path: String,
      config: MergeConfig,
      partitionBy: Seq[String] = Nil): MergeStats = {
    if (!GraftTable.exists(spark, path)) {
      // create empty target with source schema
      GraftWriter.write(spark, source.limit(0), path,
        WriteOptions(mode = WriteMode.ErrorIfExists, partitionBy = partitionBy))
    }
    val table = GraftTable(spark, path)
    val full = table.toDf()
    val (inScope, outOfScope) = config.partitionFilter match {
      case Some(p) => (full.filter(p), Some(full.filter(!p)))
      case None    => (full, None)
    }

    val merged = apply(inScope, source, config)
    val result = outOfScope match {
      case Some(rest) => merged.unionByName(rest)
      case None       => merged
    }

    val numSource = source.count()
    val v = GraftWriter.write(spark, result, path,
      WriteOptions(
        mode = WriteMode.Overwrite,
        partitionBy = table.snapshot().partitionColumns,
        metadata = config.metadata ++ Map("operation" -> s"MERGE:${config.mergeType.name}")))
    val numOut = table.snapshot().files.map(_.numRecords).sum
    MergeStats(v, numSource, numOut)
  }

  /** The pure-relational core: merge `source` into `target` and return the
    * new target contents. Public so it can be used (and oracle-checked) as
    * a standalone transformation without a table on disk.
    */
  def apply(target: DataFrame, source: DataFrame, config: MergeConfig): DataFrame = {
    if (config.errorOnTypeMismatch) {
      val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
      source.schema.foreach { f =>
        tTypes.get(f.name).foreach { tt =>
          require(tt == f.dataType,
            s"merge type mismatch on '${f.name}': target $tt vs source ${f.dataType}")
        }
      }
    }
    val ta = config.targetAlias
    val sa = config.sourceAlias
    val cond = expr(config.predicate)
    val cols = target.columns.toSeq
    val marker = "__graft_matched"

    def t = target.alias(ta)
    def s = source.alias(sa)
    // NOT EXISTS via anti joins (null-safe matched detection via marker lit)
    def updated: DataFrame =
      t.join(s.withColumn(marker, lit(true)), cond, "left")
        .select(cols.map { c =>
          when(col(marker), col(s"$sa.$c")).otherwise(col(s"$ta.$c")).as(c)
        }: _*)
    def sourceOnly: DataFrame =
      s.join(t, cond, "left_anti").select(cols.map(col): _*)

    config.mergeType match {
      case MergeType.UpdateOnly => updated
      case MergeType.DeduplicateInsert =>
        target.select(cols.map(col): _*).unionByName(sourceOnly)
      case MergeType.Upsert => updated.unionByName(sourceOnly)
      case MergeType.ReplaceDeleteUnmatched =>
        s.join(t, cond, "left_semi").select(cols.map(col): _*)
    }
  }
}
