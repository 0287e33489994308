package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Filter-aware scan-size estimation for graft tables — the planning
  * half of data skipping.
  *
  * `LogicalRelation(HadoopFsRelation)` reports the file index's TOTAL
  * `sizeInBytes` as its statistics, and in size-only estimation mode a
  * `Filter` passes its child's stats through unchanged — so a query
  * touching one partition of a 100 TB table still *plans* as 100 TB.
  * Join strategy selection happens on those logical stats: the pruned
  * slice never qualifies for a broadcast join, and the table gets
  * shuffled at full width only for AQE to discover (after the map-side
  * shuffle write) that a few megabytes survived. Delta ships the same
  * fix as its stats-aware scan preparation; this is the graft analog.
  *
  * The rule runs once, pre-CBO (after predicate pushdown has placed
  * filters adjacent to the relation), splits the scan's filters into
  * partition/data sets exactly as `FileSourceStrategy` will, asks the
  * commit-log-backed [[GraftFileIndex]] for the surviving files' byte
  * sum — a pure metadata computation — and pins that size onto the
  * relation via a delegating [[PinnedSizeFileIndex]]. Downstream
  * planning (broadcast thresholds, join reorder) then sees what the
  * scan will actually read. Scan execution is untouched: the wrapper
  * delegates `listFiles` to the original index, so the pruned file set
  * (and its memoised bloom consultations) is computed once.
  */
class GraftScanStats(session: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        lr @ LogicalRelation(fs @ HadoopFsRelation(index: GraftFileIndex, _, _, _, _, _), _, _, false, _)) =>
      val conjuncts = splitConjunctivePredicates(cond).filter(e =>
        e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]]))
      val partNames = fs.partitionSchema.fieldNames.toSet
      val dataNames = fs.dataSchema.fieldNames.toSet
      // classify by referenced columns, like FileSourceStrategy: filters
      // touching metadata attrs (e.g. the deletion-vector anti-filter on
      // `_metadata.row_index`) reference neither set and are ignored
      val (partitionFilters, rest) = conjuncts.partition(e =>
        e.references.nonEmpty && e.references.forall(a => partNames(a.name)))
      val dataFilters = rest.filter(e =>
        e.references.nonEmpty && e.references.forall(a => dataNames(a.name)))
      if (partitionFilters.isEmpty && dataFilters.isEmpty) f
      else {
        val pruned = index.prunedSizeInBytes(partitionFilters, dataFilters)
        if (pruned >= fs.location.sizeInBytes) f
        else {
          val pinned = fs.copy(
            location = new PinnedSizeFileIndex(index, pruned))(session)
          f.copy(child = lr.copy(relation = pinned))
        }
      }
  }
}

/** A [[FileIndex]] that answers everything from the wrapped index but
  * reports a pre-computed (pruned) `sizeInBytes` — the vehicle
  * [[GraftScanStats]] uses to surface skipping-aware scan sizes to the
  * size-only stats estimator without touching scan execution. Not
  * re-matched by the rule (it is not a [[GraftFileIndex]]), so the
  * rewrite is idempotent by construction.
  */
final class PinnedSizeFileIndex(val underlying: GraftFileIndex, pinnedSize: Long)
    extends FileIndex {
  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
  override def inputFiles: Array[String] = underlying.inputFiles
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long = pinnedSize
  override def partitionSchema: StructType = underlying.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs
  override def toString: String = s"$underlying (pinned ${pinnedSize}B)"
}
