package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token count of a text column through
  * [[graft.ext.BpeModel]]'s embedded merge table: shared whitespace
  * pre-tokenization, merges applied in rank order per word, surviving
  * symbols summed. One pass per row, no shuffle; like
  * [[TrigramLangScore]], codegen delegates the data-dependent loop to
  * [[evalCount]] via a reference object. The word→count memo is
  * per-expression-instance (≈ per task) and bounded — natural corpora
  * repeat words, so the merge loop amortizes to vocabulary size.
  * NULL input yields NULL.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val memo =
    scala.collection.mutable.HashMap.empty[String, Int]

  def evalCount(input: UTF8String): Long =
    graft.ext.BpeModel.textTokenCount(input.toString, memo)

  override protected def nullSafeEval(input: Any): Any =
    evalCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeCount", this, "graft.functions.BpeCount")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.evalCount($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
