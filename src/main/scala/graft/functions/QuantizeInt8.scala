package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization of an `array<float>` in ONE
  * pass per row: returns `struct(q8: array<int>, scale_e6: long)` where
  * scale = max |x|, q[i] = floor(x·127/scale + 0.5), scale_e6 =
  * floor(scale·1e6 + 0.5). A two-loop codegen kernel (max-abs, then
  * quantize) instead of the declarative
  * `transform(v, x -> ... array_max(transform(v, abs)) ...)`
  * formulation, whose scale subexpression Catalyst inlines into the
  * lambda and re-evaluates PER ELEMENT — O(d²) work per row, ruinous at
  * d=1024. Null/empty arrays yield zeros with scale_e6 = 0; null
  * elements are read as 0 (inputs are embedding vectors,
  * containsNull = false).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("q8", ArrayType(IntegerType, containsNull = false)),
    StructField("scale_e6", LongType)))

  override def prettyName: String = "graft_quantize_int8"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > scale) scale = a
      i += 1
    }
    val q = new Array[Int](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(v.getFloat(i).toDouble * 127 / scale + 0.5).toInt
        i += 1
      }
    }
    InternalRow(new GenericArrayData(q.map(x => x: Any)),
      math.floor(scale * 1e6 + 0.5).toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val a = ctx.freshName("a")
      val row = ctx.freshName("row")
      s"""
         |int $n = $v.numElements();
         |double $scale = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs((double) $v.getFloat($i));
         |  if ($a > $scale) $scale = $a;
         |}
         |int[] $q = new int[$n];
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (int) java.lang.Math.floor(
         |      (double) $v.getFloat($i) * 127 / $scale + 0.5);
         |  }
         |}
         |Object[] $row = new Object[2];
         |$row[0] = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($q);
         |$row[1] = (long) java.lang.Math.floor($scale * 1e6 + 0.5);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
