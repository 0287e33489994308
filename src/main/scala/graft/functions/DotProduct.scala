package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated left-to-right in double — the exact fold semantics of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`, but
  * with `doGenCode` emitting a tight primitive loop instead of
  * per-element interpreted lambdas (~20x on 64-dim vectors). This is the
  * hot inner op of every similarity operator, so it must stay inside
  * whole-stage codegen.
  *
  * Null semantics mirror the HOF exactly, so [[DotProductRewrite]] is
  * value-preserving on arbitrary user data: `zip_with` pads the shorter
  * array with nulls and null elements propagate through the fold, so the
  * HOF yields NULL for length-mismatched arrays or any null element —
  * and so does this expression. The per-element null check is elided at
  * codegen time when both inputs are `containsNull = false` (the case for
  * every graft.ext.Similarity call site), keeping the hot loop
  * branch-free.
  */
case class DotProductFP64(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are produced only by graft.ext.Similarity, always
  // array<float>; no ExpectsInputTypes (private API in Spark 4)
  override def dataType: DataType = DoubleType

  // NULL on length mismatch / null element, even for non-null children
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def mayContainNullElems: Boolean = {
    def cn(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
    cn(left) || cn(right)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (mayContainNullElems)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft native functions (idempotent). */
object GraftFunctions {
  val DotName = "graft_dot"
  val SortedIntersectName = "graft_sorted_intersect_count"
  val QuantizeName = "graft_quantize_int8"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering an existing name makes Spark WARN-spam
    // every operator entry point (one line per query per function)
    def registerOnce(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    registerOnce(QuantizeName) { args =>
      require(args.length == 1, s"$QuantizeName expects 1 argument")
      QuantizeInt8(args(0))
    }
    registerOnce(DotName) { args =>
      require(args.length == 2, s"$DotName expects 2 arguments")
      DotProductFP64(args(0), args(1))
    }
    registerOnce(SortedIntersectName) { args =>
      require(args.length == 2, s"$SortedIntersectName expects 2 arguments")
      SortedIntersectCount(args(0), args(1))
    }
  }
}
