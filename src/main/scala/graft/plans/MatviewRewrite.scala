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
      case agg: Aggregate =>
        scanTarget(agg.child).flatMap { case (path, version) =>
          listed.view.flatMap(v =>
            tryRewrite(agg, v, path, version)).headOption
        }.getOrElse(agg)
    }
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

    // grouping keys must be bare attributes equal (as a set) to the
    // recorded keys
    val keySet = keys.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val groupNames = agg.groupingExpressions.map(attrName)
    if (groupNames.exists(_.isEmpty)) return None
    val groupSet = groupNames.flatten.toSet
    if (groupSet != keySet ||
      groupNames.size != agg.groupingExpressions.size) return None

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

    def mapAgg(ae: AggregateExpression): Option[Column] = {
      if (ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case s: Sum if !ae.isDistinct && integral(s.child) =>
          attrName(s.child).filter(valueSet).map(n => col(naming(n)._1))
        case c: Count if !ae.isDistinct && c.children.size == 1 =>
          c.children.head match {
            case IntegerLiteral(_) => Some(col("n_rows"))
            case e => attrName(e).filter(valueSet).map(n => col(naming(n)._2))
          }
        case c: Count if ae.isDistinct && c.children.size == 1 =>
          attrName(c.children.head).filter(distSet).map { n =>
            val rec = recorded(dist, n)
            neededDist += rec
            coalesce(col(s"__nd_$rec"), lit(0L))
          }
        case a: Average if !ae.isDistinct && integral(a.child) =>
          attrName(a.child).filter(valueSet)
            .map(n => col(naming(n)._1).cast("double") / col(naming(n)._2))
        case m: Min =>
          attrName(m.child).filter(mmSet)
            .map(n => col(s"min_${recorded(minmax, n)}"))
        case m: Max =>
          attrName(m.child).filter(mmSet)
            .map(n => col(s"max_${recorded(minmax, n)}"))
        case _ => None
      }
    }

    def mapNamed(ne: NamedExpression): Option[Column] = ne match {
      case a: AttributeReference if keySet(
          a.name.toLowerCase(java.util.Locale.ROOT)) =>
        Some(col(keyByLower(a.name.toLowerCase(java.util.Locale.ROOT))))
      case al: Alias => al.child match {
        case ae: AggregateExpression => mapAgg(ae)
        case _ => None
      }
      case _ => None
    }

    val mapped = agg.aggregateExpressions.map(mapNamed)
    if (mapped.exists(_.isEmpty)) return None

    // freshness: the view (and every needed support relation) must
    // reflect EXACTLY the snapshot version the scan was planned against
    val (sumDf, mainV) =
      try MaterializedAgg.summaryWithSupports(
        spark, viewPath, keys, neededDist.toSeq)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (mainV != scannedVersion) return None

    val replacement = sumDf.select(mapped.flatten: _*)
      .queryExecution.analyzed
    // exprId + type graft: parents keep resolving against the original
    // output; a type mismatch (summary schema drift) refuses the rewrite
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
