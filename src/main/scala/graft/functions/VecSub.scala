package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Elementwise float subtraction of two `array<float>` columns — the
  * residual step of IVF-PQ (`vector − cell centroid`). Single-precision
  * IEEE subtract per element, so the result is bit-identical across
  * engines (the DuckDB oracle computes the same FLOAT − FLOAT). The HOF
  * spelling `zip_with(a, b, (x, y) -> x - y)` is value-identical but is
  * a CodegenFallback, which would knock the whole residual+encode
  * projection out of whole-stage codegen. NULL on null input, length
  * mismatch, or a null element (the dot kernel's null discipline).
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sub"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = x.getFloat(i) - y.getFloat(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $x.getFloat($i) - $y.getFloat($i);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
