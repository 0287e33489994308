package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductFP64, DotProductRewrite, GraftFunctions, QuantizeInt8, SortedIntersectCount}

/** Session extension registering graft's native expressions, for use via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the deployment
  * path that makes `graft_dot(...)` available to plain SQL users on a
  * cluster. (Library operators also self-register per session through
  * [[graft.functions.GraftFunctions.register]], so the extension is not
  * required for the programmatic API.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // format("graft") reads become native columnar parquet scans (with
    // BucketSpec-reported partitioning for co-bucketed joins)
    ext.injectResolutionRule(session =>
      new graft.sources.GraftRelationSubstitution(session))
    // SQL over graft.`/path` targets: the parser rewrite claims the
    // two-part identifier before ResolveSQLOnFile rejects it; the
    // resolution rule then routes DML (DELETE FROM / UPDATE / MERGE
    // INTO / INSERT) to the COW Dml/Merge engines and substitutes the
    // native columnar plan for plain reads
    ext.injectParser((_, parser) => new graft.plans.GraftSqlParser(parser))
    // join planning sees skipping-aware scan sizes: a partition/stats
    // -pruned slice of a huge table can qualify for broadcast instead of
    // shuffling at full logical width (Delta's stats-aware scan prep)
    ext.injectPreCBORule(session => new graft.sources.GraftScanStats(session))
    ext.injectResolutionRule(session => new graft.plans.GraftSqlDml(session))
    // graft catalog tables (spark.sql.catalog.<name>=graft.catalog.
    // GraftCatalog): reads become the native columnar plan, SQL writes
    // and CTAS route to GraftWriter. Must run AFTER GraftSqlDml in each
    // pass so DML targets are intercepted before the read substitution
    // rewrites them.
    ext.injectResolutionRule(session => new graft.catalog.GraftCatalogRule(session))
    // transparent aggregate rewrite over registered materialized views
    // (opt-in via spark.graft.matview.rewrite; empty conf = no-op)
    ext.injectOptimizerRule(session => new graft.plans.MatviewRewriteRule(session))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[DotProductFP64].getName, GraftFunctions.DotName),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"${GraftFunctions.DotName} expects 2 arguments")
        DotProductFP64(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.SortedIntersectName),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        GraftFunctions.SortedIntersectName),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"${GraftFunctions.SortedIntersectName} expects 2 arguments")
        SortedIntersectCount(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.QuantizeName),
      new ExpressionInfo(classOf[QuantizeInt8].getName,
        GraftFunctions.QuantizeName),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"${GraftFunctions.QuantizeName} expects 1 argument")
        QuantizeInt8(args(0))
      }))
  }
}
