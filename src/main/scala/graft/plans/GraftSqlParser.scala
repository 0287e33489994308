package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LeafNode, LogicalPlan}
import org.apache.spark.sql.types.{DataType, StructType}

/** Parse-time placeholder for a graft table addressed by path in SQL
  * (`graft.`/path/to/table``). Deliberately unresolved: if the
  * resolution rule ([[GraftSqlDml]]) is not installed, analysis fails
  * loudly instead of silently misreading.
  */
final case class UnresolvedGraftRelation(path: String) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

/** Parse-time placeholder for `table_changes(...)` /
  * `table_changes_by_path(...)` — claimed at parse time because Spark's
  * `ResolveFunctions` fails analysis HARD on an unknown table-valued
  * function before injected resolution rules run; [[GraftSqlDml]]
  * rewrites the placeholder into the batch change-feed relation.
  */
final case class UnresolvedTableChanges(
    args: Seq[Expression], byPath: Boolean) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

/** Parser wrapper (installed via `SparkSessionExtensions.injectParser`)
  * that rewrites `graft.`path`` relations into
  * [[UnresolvedGraftRelation]] placeholders right after parsing —
  * before Spark's `ResolveSQLOnFile` can claim the two-part
  * `datasource.path` identifier and reject the non-FileFormat source.
  * Everything else delegates verbatim; the grammar is entirely Spark's.
  * Same interception pattern Delta uses for `delta.`path``.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def substitute(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      // InsertIntoStatement is a UnaryNode over its *query*; the target
      // `table` is a plain field, so the tree walk won't reach it
      case i: InsertIntoStatement =>
        i.copy(table = substituteRel(i.table))
      // RelationTimeTravel holds its relation the same way
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        tt.copy(relation = substituteRel(tt.relation))
      case u: UnresolvedRelation if isGraftPath(u) =>
        UnresolvedGraftRelation(u.multipartIdentifier(1))
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
          if tvf.name.length == 1 &&
            tvf.name.head.equalsIgnoreCase("table_changes") =>
        UnresolvedTableChanges(tvf.functionArgs, byPath = false)
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
          if tvf.name.length == 1 &&
            tvf.name.head.equalsIgnoreCase("table_changes_by_path") =>
        UnresolvedTableChanges(tvf.functionArgs, byPath = true)
    }

  private def substituteRel(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case u: UnresolvedRelation if isGraftPath(u) =>
        UnresolvedGraftRelation(u.multipartIdentifier(1))
    }

  private def isGraftPath(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  // --- maintenance statements Spark's grammar doesn't know ---
  // target: graft.`/path` or a dotted catalog name
  private val T = """(?:graft\s*\.\s*`([^`]+)`|((?:\w+\.)*\w+))"""
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + T + """(\s+FULL)?""" +
      """(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val ReorgRe =
    ("""(?is)^\s*REORG\s+TABLE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')""" +
      """\s*;?\s*$""").r
  private val ConvertRe =
    ("""(?is)^\s*CONVERT\s+TO\s+GRAFT\s+parquet\s*\.\s*`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val GenerateRe =
    ("""(?is)^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      T + """\s*;?\s*$""").r
  private val DropFeatureRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+FEATURE\s+(\w+)\s*;?\s*$""").r
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+""" + T +
      """\s+FROM\s+'([^']+)'""" +
      """(?:\s+FILEFORMAT\s*=\s*(\w+))?""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FILES\s*=\s*\(([^)]*)\))?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(\s+MERGE\s+SCHEMA)?\s*;?\s*$""").r

  /** `'k' = 'v', ...` pairs of a FORMAT_OPTIONS clause. The ENTIRE body
    * must be consumed by the quoted-pair grammar — an entry that
    * doesn't match (e.g. unquoted `'header' = false`) would otherwise
    * be silently dropped, and for header=false the csv default
    * (header=true) would then eat the first data row of every file.
    */
  private def optionPairs(s: String): Map[String, String] = {
    val pair = """'([^']*)'\s*=\s*'([^']*)'""".r
    val leftover = pair.replaceAllIn(s, "").replaceAll("[\\s,]+", "")
    require(leftover.isEmpty,
      s"FORMAT_OPTIONS entries must be 'key' = 'value' (both quoted); " +
        s"could not parse: $leftover")
    pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap
  }
  private val CreateMatViewRe =
    ("""(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+""" + T +
      """\s+AS\s+SELECT\s+(.+?)\s+FROM\s+""" + T +
      """\s+GROUP\s+BY\s+(.+?)\s*;?\s*$""").r
  private val CreateVectorIndexRe =
    ("""(?is)^\s*CREATE\s+VECTOR\s+INDEX\s+""" + T +
      """\s+ON\s+""" + T +
      """\s*\(\s*(\w+)\s*\)""" +
      """(?:\s+ID\s+(\w+))?""" +
      """(?:\s+OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val RefreshVectorIndexRe =
    ("""(?is)^\s*REFRESH\s+VECTOR\s+INDEX\s+""" + T + """\s*;?\s*$""").r
  private val DropVectorIndexRe =
    ("""(?is)^\s*DROP\s+VECTOR\s+INDEX\s+""" + T + """\s*;?\s*$""").r
  private val CreateDedupStoreRe =
    ("""(?is)^\s*CREATE\s+DEDUP\s+STORE\s+""" + T +
      """\s+ON\s+""" + T +
      """\s*\(\s*(\w+)\s*\)""" +
      """(?:\s+ID\s+(\w+))?""" +
      """(?:\s+OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val RefreshDedupStoreRe =
    ("""(?is)^\s*REFRESH\s+DEDUP\s+STORE\s+""" + T + """\s*;?\s*$""").r
  private val DropDedupStoreRe =
    ("""(?is)^\s*DROP\s+DEDUP\s+STORE\s+""" + T + """\s*;?\s*$""").r
  private val DescribeVectorIndexRe =
    ("""(?is)^\s*DESCRIBE\s+VECTOR\s+INDEX\s+""" + T + """\s*;?\s*$""").r
  private val DescribeDedupStoreRe =
    ("""(?is)^\s*DESCRIBE\s+DEDUP\s+STORE\s+""" + T +
      """(\s+WITH\s+STATS)?\s*;?\s*$""").r
  private val DescribeMatViewRe =
    ("""(?is)^\s*DESCRIBE\s+MATERIALIZED\s+VIEW\s+""" + T + """\s*;?\s*$""").r
  // optional MAX DEPTH n: the discovery walk is bounded (default 3
  // levels) and WARNS when it pruned unexplored directories — the
  // clause widens it for deep lake layouts
  private val ShowVectorIndexesRe =
    """(?is)^\s*SHOW\s+VECTOR\s+INDEXES\s+IN\s+'([^']+)'(?:\s+MAX\s+DEPTH\s+(\d+))?\s*;?\s*$""".r
  private val ShowDedupStoresRe =
    """(?is)^\s*SHOW\s+DEDUP\s+STORES\s+IN\s+'([^']+)'(?:\s+MAX\s+DEPTH\s+(\d+))?\s*;?\s*$""".r
  private val ShowMatViewsRe =
    """(?is)^\s*SHOW\s+MATERIALIZED\s+VIEWS\s+IN\s+'([^']+)'(?:\s+MAX\s+DEPTH\s+(\d+))?\s*;?\s*$""".r
  private val RefreshMatViewRe =
    ("""(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+""" + T + """\s*;?\s*$""").r
  private val DropMatViewRe =
    ("""(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+""" + T + """\s*;?\s*$""").r
  private val CloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" + T +
      """\s+(SHALLOW\s+|DEEP\s+)?CLONE\s+""" + T +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""" +
      """\s*;?\s*$""").r

  private def target(path: String, name: String): Either[String, Seq[String]] =
    if (path != null) Left(path) else Right(name.split('.').toSeq)

  private def maxDepthOf(d: String): Int = if (d == null) 3 else d.toInt

  /** The utility statements ([[GraftVacuumCommand]] etc.); None when the
    * text is not one of them — then the whole statement goes to Spark's
    * parser untouched.
    */
  private def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case VacuumRe(p, n, hours, dry) =>
        Some(GraftVacuumCommand(target(p, n),
          Option(hours).map(_.toLong), dryRun = dry != null))
      case OptimizeRe(p, n, fullKw, wpred, zcols) =>
        Some(GraftOptimizeCommand(target(p, n),
          Option(zcols).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
          Option(wpred).map(_.trim).filter(_.nonEmpty),
          full = fullKw != null))
      case ReorgRe(p, n, wpred) =>
        Some(GraftReorgCommand(target(p, n),
          Option(wpred).map(_.trim).filter(_.nonEmpty)))
      case GenerateRe(p, n) => Some(GraftGenerateCommand(target(p, n)))
      case HistoryRe(p, n) => Some(GraftDescribeHistoryCommand(target(p, n)))
      case DetailRe(p, n) => Some(GraftDescribeDetailCommand(target(p, n)))
      case RestoreRe(p, n, v, ts) => Some(GraftRestoreCommand(target(p, n),
        Option(v).map(_.toLong), Option(ts)))
      case DropFeatureRe(p, n, feature) =>
        Some(GraftDropFeatureCommand(target(p, n), feature))
      case CopyIntoRe(p, n, src, fmt, pat, fl, fo, ms) =>
        Some(GraftCopyIntoCommand(target(p, n), src,
          Option(fmt).getOrElse("parquet"), mergeSchema = ms != null,
          pattern = Option(pat),
          files = Option(fl).map(_.split(',').toSeq
            .map(_.trim.stripPrefix("'").stripSuffix("'"))
            .filter(_.nonEmpty)),
          formatOptions = Option(fo).map(optionPairs).getOrElse(Map.empty)))
      case CreateMatViewRe(p, n, sel, sp, sn, gb) =>
        Some(GraftCreateMatViewCommand(target(p, n), target(sp, sn),
          sel.trim,
          gb.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
      case RefreshMatViewRe(p, n) =>
        Some(GraftRefreshMatViewCommand(target(p, n)))
      case DropMatViewRe(p, n) =>
        Some(GraftDropMatViewCommand(target(p, n)))
      case CreateVectorIndexRe(p, n, sp, sn, vecCol, idCol, opts) =>
        Some(GraftCreateVectorIndexCommand(target(p, n), target(sp, sn),
          vecCol, Option(idCol),
          Option(opts).map(optionPairs).getOrElse(Map.empty)))
      case RefreshVectorIndexRe(p, n) =>
        Some(GraftRefreshVectorIndexCommand(target(p, n)))
      case DropVectorIndexRe(p, n) =>
        Some(GraftDropVectorIndexCommand(target(p, n)))
      case CreateDedupStoreRe(p, n, sp, sn, textCol, idCol, opts) =>
        Some(GraftCreateDedupStoreCommand(target(p, n), target(sp, sn),
          textCol, Option(idCol),
          Option(opts).map(optionPairs).getOrElse(Map.empty)))
      case RefreshDedupStoreRe(p, n) =>
        Some(GraftRefreshDedupStoreCommand(target(p, n)))
      case DropDedupStoreRe(p, n) =>
        Some(GraftDropDedupStoreCommand(target(p, n)))
      case DescribeVectorIndexRe(p, n) =>
        Some(GraftDescribeVectorIndexCommand(target(p, n)))
      case DescribeDedupStoreRe(p, n, ws) =>
        Some(GraftDescribeDedupStoreCommand(target(p, n), withStats = ws != null))
      case DescribeMatViewRe(p, n) =>
        Some(GraftDescribeMatViewCommand(target(p, n)))
      case ShowVectorIndexesRe(root, d) =>
        Some(GraftShowVectorIndexesCommand(root, maxDepthOf(d)))
      case ShowDedupStoresRe(root, d) =>
        Some(GraftShowDedupStoresCommand(root, maxDepthOf(d)))
      case ShowMatViewsRe(root, d) =>
        Some(GraftShowMatViewsCommand(root, maxDepthOf(d)))
      case ConvertRe(p, parts) => Some(GraftConvertCommand(p,
        Option(parts).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)))
      case CloneRe(ine, dp, dn, kind, sp, sn, v, ts) =>
        Some(GraftCloneCommand(target(dp, dn), target(sp, sn),
          Option(v).map(_.toLong), Option(ts), ifNotExists = ine != null,
          // Delta semantics: bare CLONE means deep
          deep = kind == null || kind.trim.equalsIgnoreCase("DEEP")))
      case _ => None
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenancePlan(sqlText).getOrElse(substitute(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(
      sqlText: String, context: ParameterContext): LogicalPlan =
    maintenancePlan(sqlText).getOrElse(
      substitute(delegate.parsePlanWithParameters(sqlText, context)))

  override def parseQuery(sqlText: String): LogicalPlan =
    substitute(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
