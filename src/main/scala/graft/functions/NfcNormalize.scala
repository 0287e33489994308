package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) of a string
  * column via `java.text.Normalizer` — the codec-free cleaning step a
  * text pipeline runs before hashing/dedup (composed vs decomposed
  * accents hash differently; NFC makes them one form, exactly what
  * DuckDB's `nfc_normalize` computes, so the twin is exact). Codegen
  * delegates to [[evalNfc]] via a reference object, same shape as
  * [[BpeCount]]. NULL input yields NULL.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nfc_normalize"

  def evalNfc(input: UTF8String): UTF8String = {
    val s = input.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most real
    // text is already NFC and skips the allocation entirely
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    evalNfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this,
      "graft.functions.NfcNormalize")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.evalNfc($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
