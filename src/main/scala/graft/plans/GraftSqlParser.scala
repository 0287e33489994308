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
      case u: UnresolvedRelation if isGraftPath(u) =>
        UnresolvedGraftRelation(u.multipartIdentifier(1))
    }

  private def substituteRel(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case u: UnresolvedRelation if isGraftPath(u) =>
        UnresolvedGraftRelation(u.multipartIdentifier(1))
    }

  private def isGraftPath(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  override def parsePlan(sqlText: String): LogicalPlan =
    substitute(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, context: ParameterContext): LogicalPlan =
    substitute(delegate.parsePlanWithParameters(sqlText, context))

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
