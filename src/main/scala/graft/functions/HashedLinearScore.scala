package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-integer hashed linear text score: tokenize (`lower(trim)`,
  * whitespace split — the shared cross-engine tokenization), hash each
  * token to a bucket (`md5[0,15) hex as long % buckets`, the repo's
  * md5-bucket idiom), and sum the e6-scaled bucket weights plus the
  * bias. One scan per row, weights as a reference object, codegen
  * delegates to [[evalScore]] ([[PqQueryTable]]'s pattern). All-integer
  * scoring means both engines produce identical bigints — no float
  * parity surface at query time. NULL input yields NULL (callers
  * coalesce to the bias, mirroring the oracle's no-token rows).
  */
case class HashedLinearScore(
    child: Expression,
    weightsE6: Array[Long],
    biasE6: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_linear_score"

  def evalScore(input: UTF8String): Long = {
    // tokenize/bucket are QualityModel's OWN functions — the exact ones
    // training used, so the model scored is the model trained (a
    // re-implementation here could silently drift)
    val toks = graft.ext.QualityModel.tokensOf(input.toString)
    var acc = biasE6
    var i = 0
    while (i < toks.length) {
      acc += weightsE6(graft.ext.QualityModel.bucketOf(toks(i)))
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any =
    evalScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedLinearScore", this,
      "graft.functions.HashedLinearScore")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.evalScore($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
