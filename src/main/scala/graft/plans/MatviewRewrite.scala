package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, IntegerLiteral, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.ext.MaterializedAgg
import graft.io.GraftTable

/** Transparent aggregate rewrite over materialized views — the classic
  * OLAP "aggregate navigator" (Oracle query rewrite, Calcite's
  * materialized-view substitution), expressed as a Catalyst optimizer
  * rule: a full-table `GROUP BY` whose keys and aggregates are exactly
  * what a registered [[graft.ext.MaterializedAgg]] summary maintains is
  * answered from the SUMMARY (O(groups) rows) instead of rescanning the
  * source (O(rows)) — at 100 TB that turns a full corpus aggregation
  * into a metadata-sized read, with bit-identical results guaranteed by
  * the maintained-column contracts.
  *
  * Opt-in and conservative by construction:
  *   - candidate views are listed in `spark.graft.matview.rewrite`
  *     (comma-separated summary paths); empty ⇒ the rule is a no-op;
  *   - the rewrite fires only when the view's source-version watermark
  *     EQUALS the exact snapshot version the scan was planned against
  *     ([[graft.sources.GraftFileIndex.scannedVersion]]) — a stale view,
  *     or a scan of an older/newer snapshot (time travel), never
  *     rewrites;
  *   - the aggregate must sit directly on the scan (attribute-only
  *     Projects allowed — column pruning inserts those); any Filter
  *     (including deletion-vector masks) or expression Project blocks it;
  *   - grouping keys must equal the view's recorded keys, and every
  *     aggregate must map onto a maintained/derivable column:
  *     `sum(intcol)` → maintained exact sum, `count(*)` → n_rows,
  *     `count(col)` → nvals, `avg(col)` → exact sum/count (at least as
  *     accurate as native double accumulation), `min/max(col)` →
  *     maintained extrema, `count(DISTINCT col)` → the support relation.
  *     Anything else leaves the plan untouched.
  *
  * The replacement subtree preserves the Aggregate's output attribute
  * ids and types exactly, so parent operators re-resolve nothing.
  */
class MatviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import MatviewRewriteRule.ConfKey

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val listed = spark.conf.getOption(ConfKey).getOrElse("")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    if (listed.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate if shapeCandidate(agg) =>
        scanTarget(agg.child).flatMap { case (path, version) =>
          listed.view.flatMap(v =>
            tryRewrite(agg, v, path, version)).headOption
        }.getOrElse(agg)
    }
  }

  /** Cheap view-independent precheck — bare-attribute grouping and
    * plain aliased aggregates only — so unmatched plan shapes never pay
    * the per-view commit-log reads (the rule runs inside the optimizer
    * fixed point, on every Aggregate of every query while the conf is
    * set).
    */
  private def shapeCandidate(agg: Aggregate): Boolean =
    agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) &&
      agg.aggregateExpressions.forall {
        case _: AttributeReference => true
        case al: Alias => al.child.isInstanceOf[AggregateExpression]
        case _ => false
      }

  /** The (table path, pinned snapshot version) under `p` iff `p` is a
    * graft native scan with nothing but attribute-only Projects above
    * it. A Filter (row-level semantics — including DV masks) or an
    * expression Project disqualifies the subtree.
    */
  private def scanTarget(p: LogicalPlan): Option[(String, Long)] = p match {
    case proj: Project
        if proj.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanTarget(proj.child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case ix: graft.sources.GraftFileIndex =>
          Some((ix.scannedTablePath, ix.scannedVersion))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def qualified(p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(hp).toString.stripSuffix("/")
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def tryRewrite(
      agg: Aggregate,
      viewPath: String,
      scannedPath: String,
      scannedVersion: Long): Option[LogicalPlan] = {
    if (!GraftTable.exists(spark, viewPath)) return None
    val (source, keys, values, minmax, dist) =
      try MaterializedAgg.definitionOf(spark, viewPath)
      catch { case _: IllegalStateException => return None }
    if (qualified(source) != qualified(scannedPath)) return None

    // grouping keys must be bare attributes forming a SUBSET of the
    // recorded keys: equality answers directly from the summary rows; a
    // strict subset (including the empty set — a global aggregate)
    // ROLLS UP by re-aggregating the summary (sum of sums, min of mins,
    // sum of counts — O(groups) work, exact by associativity). Only
    // count(DISTINCT) cannot roll up (distinct sets do not add).
    val keySet = keys.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val groupNames = agg.groupingExpressions.map(attrName)
    if (groupNames.exists(_.isEmpty)) return None
    val groupSet = groupNames.flatten.toSet
    if (!groupSet.subsetOf(keySet)) return None
    val rollup = groupSet != keySet

    val valueSet = values.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val mmSet = minmax.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val distSet = dist.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val naming = MaterializedAgg.specsOf(values)
      .map { case (c, sumC, nvC) =>
        c.toLowerCase(java.util.Locale.ROOT) -> ((sumC, nvC)) }.toMap
    // recorded column spellings, keyed lowercase — summary columns use
    // the recorded case
    val keyByLower = keys
      .map(k => k.toLowerCase(java.util.Locale.ROOT) -> k).toMap
    def recorded(cols: Seq[String], n: String): String =
      cols.find(_.equalsIgnoreCase(n)).getOrElse(n)

    // the distinct columns the query actually asks for — only those
    // support relations join (and gate freshness)
    val neededDist = scala.collection.mutable.LinkedHashSet[String]()

    import org.apache.spark.sql.functions.{max => fMax, min => fMin, sum => fSum}

    /** Summary expression answering one aggregate. Direct mode reads the
      * maintained column; rollup mode RE-AGGREGATES it across the
      * collapsed keys — exact by associativity (integer sums/counts add,
      * extrema nest; maintained NULL-iff-no-value columns are skipped by
      * the outer aggregate exactly as the source rows' NULLs were).
      * Counts coalesce to 0 so a GLOBAL rollup over an empty summary
      * still reads count = 0 (sum over empty is NULL, like the source).
      */
    def mapAgg(ae: AggregateExpression): Option[Column] = {
      if (ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case s: Sum if !ae.isDistinct && integral(s.child) =>
          attrName(s.child).filter(valueSet).map { n =>
            if (rollup) fSum(col(naming(n)._1)) else col(naming(n)._1)
          }
        case c: Count if !ae.isDistinct && c.children.size == 1 =>
          val src = c.children.head match {
            case IntegerLiteral(_) => Some("n_rows")
            case e => attrName(e).filter(valueSet).map(n => naming(n)._2)
          }
          src.map(n =>
            if (rollup) coalesce(fSum(col(n)), lit(0L)) else col(n))
        case c: Count if ae.isDistinct && c.children.size == 1 && !rollup =>
          attrName(c.children.head).filter(distSet).map { n =>
            val rec = recorded(dist, n)
            neededDist += rec
            coalesce(col(s"__nd_$rec"), lit(0L))
          }
        case a: Average if !ae.isDistinct && integral(a.child) =>
          attrName(a.child).filter(valueSet).map { n =>
            if (rollup)
              fSum(col(naming(n)._1)).cast("double") / fSum(col(naming(n)._2))
            else col(naming(n)._1).cast("double") / col(naming(n)._2)
          }
        case m: Min =>
          attrName(m.child).filter(mmSet).map { n =>
            val c = col(s"min_${recorded(minmax, n)}")
            if (rollup) fMin(c) else c
          }
        case m: Max =>
          attrName(m.child).filter(mmSet).map { n =>
            val c = col(s"max_${recorded(minmax, n)}")
            if (rollup) fMax(c) else c
          }
        case _ => None
      }
    }

    /** (isGroupingKey, summary expression) per output. */
    def mapNamed(ne: NamedExpression): Option[(Boolean, Column)] = ne match {
      case a: AttributeReference if groupSet(
          a.name.toLowerCase(java.util.Locale.ROOT)) =>
        Some((true, col(keyByLower(a.name.toLowerCase(java.util.Locale.ROOT)))))
      case al: Alias => al.child match {
        case ae: AggregateExpression => mapAgg(ae).map((false, _))
        case _ => None
      }
      case _ => None
    }

    val mapped0 = agg.aggregateExpressions.map(mapNamed)
    if (mapped0.exists(_.isEmpty)) return None
    val mapped = mapped0.flatten

    // freshness: the view (and every needed support relation) must
    // reflect EXACTLY the snapshot version the scan was planned against
    val (sumDf, mainV) =
      try MaterializedAgg.summaryWithSupports(
        spark, viewPath, keys, neededDist.toSeq)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (mainV != scannedVersion) return None

    // any failure CONSTRUCTING the replacement (analysis surprises,
    // summary schema drift) must fall back to the source scan, never
    // fail the user's query (NonFatal spares the method-level returns)
    val projected = try {
      if (!rollup) sumDf.select(mapped.map(_._2): _*)
      else {
        // rollup: re-aggregate the summary over the collapsed key set —
        // aggregate outputs ride temp aliases, then one select restores
        // the query's output order (keys and aggregates interleave).
        // Names dedup so `GROUP BY k, k` can't make the groupBy output
        // ambiguous
        val groupCols = agg.groupingExpressions.flatMap(attrName)
          .distinct.map(n => col(keyByLower(n)))
        val aggCols = mapped.zipWithIndex.collect {
          case ((false, c), i) => c.as(s"__mv_$i")
        }
        // NOTE: never .distinct()/.dropDuplicates() here — the injected
        // subtree is spliced in AFTER ReplaceDeduplicateWithAggregate
        // ran, so a Deduplicate node would reach the planner unreplaced
        val aggCols1 =
          if (aggCols.nonEmpty) aggCols
          else Seq(org.apache.spark.sql.functions.count(lit(1)).as("__mv_drop"))
        val grouped = sumDf.groupBy(groupCols: _*)
          .agg(aggCols1.head, aggCols1.tail: _*)
        grouped.select(mapped.zipWithIndex.map {
          case ((true, c), _) => c
          case ((false, _), i) => col(s"__mv_$i")
        }: _*)
      }
    } catch { case scala.util.control.NonFatal(_) => return None }
    val replacement = projected.queryExecution.analyzed
    // exprId + type graft: parents keep resolving against the original
    // output; a type mismatch (summary schema drift) refuses the rewrite.
    // Nullability may WIDEN (summary columns read nullable): parents
    // that folded on the original count's non-nullability stay correct
    // because n_rows/nvals are never NULL by the maintenance invariant
    // (every merge writes them; rollup counts coalesce to 0)
    if (replacement.output.size != agg.output.size) return None
    val aliased = agg.output.zip(replacement.output).map { case (o, n) =>
      if (o.dataType != n.dataType) return None
      Alias(n, o.name)(exprId = o.exprId)
    }
    logInfo(s"rewriting GROUP BY over $scannedPath@$scannedVersion to " +
      s"materialized view $viewPath")
    Some(Project(aliased, replacement))
  }
}

object MatviewRewriteRule {
  /** Comma-separated summary paths eligible for transparent rewrite;
    * unset/empty disables the rule entirely.
    */
  val ConfKey = "spark.graft.matview.rewrite"
}
