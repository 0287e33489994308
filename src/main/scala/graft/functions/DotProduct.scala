package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated left-to-right in double — the exact fold semantics of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`, but
  * with `doGenCode` emitting a tight primitive loop instead of
  * per-element interpreted lambdas (~20x on 64-dim vectors). This is the
  * hot inner op of every similarity operator, so it must stay inside
  * whole-stage codegen.
  */
case class DotProductFP64(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are produced only by graft.ext.Similarity, always
  // array<float>; no ExpectsInputTypes (private API in Spark 4)
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
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
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
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

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$DotName expects 2 arguments")
        DotProductFP64(args(0), args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SortedIntersectName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$SortedIntersectName expects 2 arguments")
        SortedIntersectCount(args(0), args(1))
      },
      "built-in")
  }
}
