package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language trigram scores of a text column: for each language
  * (index-aligned with the `langs` constructor arg), the sum of profile
  * weights over every trigram OCCURRENCE of the normalized input —
  * `' ' + regexp[^a-z]+→' '(lower(text)) + ' '`, the exact
  * normalization [[graft.ext.LangProfiles.normalize]] documents for
  * both engines. One pass per row, profile map as a codegen reference
  * object (tiny — ≤ 200 trigrams/language); like [[PqQueryTable]], the
  * data-dependent loop lives in [[evalScores]] and codegen delegates —
  * the per-row virtual call is noise next to the string scan.
  * NULL input yields NULL (callers coalesce to zero scores).
  */
case class TrigramLangScore(
    child: Expression,
    langs: Array[String],
    weights: Map[String, Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_trigram_lang_score"

  def evalScores(input: UTF8String): GenericArrayData = {
    val s = " " + input.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z]+", " ") + " "
    val out = new Array[Long](langs.length)
    var i = 0
    while (i + 3 <= s.length) {
      val w = weights.getOrElse(s.substring(i, i + 3), null)
      if (w != null) {
        var l = 0
        while (l < out.length) { out(l) += w(l); l += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    evalScores(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("trigramLangScore", this,
      "graft.functions.TrigramLangScore")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.evalScores($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
