package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native PQ encoder: maps an `array<float>` vector to its `m` codebook
  * indices in one codegen'd pass.
  *
  * The declarative formulation (per subspace: an `array(...)` of ksub
  * `struct(dist, idx)` entries over [[DotProductFP64]] slices, sorted and
  * sliced) is value-identical but builds an expression tree of m·ksub
  * dot calls — large enough to fall out of whole-stage codegen's method
  * budget and allocate m·ksub structs per row. This kernel is the same
  * arithmetic as a flat loop: per subspace, squared-L2 via the dot
  * expansion ‖x‖² − 2⟨x,c⟩ + ‖c‖² with LEFT-TO-RIGHT double folds
  * (identical to [[DotProductFP64]] and the DuckDB oracle), micro-rounded
  * HALF_UP to e6 fixed point, argmin with lowest-index tie-break.
  *
  * `books` (m × ksub × dsub) and the precomputed ‖c‖² table ride along
  * as codegen reference objects — k·dim·4 bytes, never shuffled.
  * Returns NULL for a null input, a dimension mismatch, or a null
  * element (a vector that cannot be encoded, mirroring the dot kernel's
  * null discipline).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val m = books.length
  private val ksub = books(0).length
  private val dsub = books(0)(0).length

  @transient private lazy val selfDots: Array[Array[Double]] =
    books.map(_.map { sub =>
      var s = 0.0; var i = 0
      while (i < sub.length) { s += sub(i).toDouble * sub(i).toDouble; i += 1 }
      s
    })

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    var e = 0
    while (e < m * dsub) { if (x.isNullAt(e)) return null; e += 1 }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var xx = 0.0
      var i = 0
      while (i < dsub) {
        val v = x.getFloat(off + i).toDouble; xx += v * v; i += 1
      }
      var best = Long.MaxValue
      var bi = 0
      var c = 0
      while (c < ksub) {
        val cv = books(j)(c)
        var xc = 0.0
        i = 0
        while (i < dsub) {
          xc += x.getFloat(off + i).toDouble * cv(i).toDouble; i += 1
        }
        val d = PqEncode.roundE6(xx - 2.0 * xc + selfDots(j)(c))
        if (d < best) { best = d; bi = c }
        c += 1
      }
      out(j) = bi
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bks = ctx.addReferenceObj("pqBooks", books, "float[][][]")
      val sds = ctx.addReferenceObj("pqSelfDots", selfDots, "double[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val xx = ctx.freshName("xx")
      val xc = ctx.freshName("xc")
      val v = ctx.freshName("v")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val e = ctx.freshName("e")
      s"""
         |if ($x.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $e = 0; $e < ${m * dsub}; $e++) {
         |    if ($x.isNullAt($e)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int[] $out = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $off = $j * $dsub;
         |    double $xx = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $v = (double) $x.getFloat($off + $i);
         |      $xx += $v * $v;
         |    }
         |    long $best = Long.MAX_VALUE;
         |    int $bi = 0;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      float[] $cv = $bks[$j][$c];
         |      double $xc = 0.0;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        $xc += (double) $x.getFloat($off + $i) * (double) $cv[$i];
         |      }
         |      long $d = graft.functions.PqEncode.roundE6($xx - 2.0 * $xc + $sds[$j][$c]);
         |      if ($d < $best) { $best = $d; $bi = $c; }
         |    }
         |    $out[$j] = $bi;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC table: for a full-precision vector, the m × ksub
  * matrix of micro-rounded per-subspace scores to every sub-centroid —
  * squared-L2 distances by default, INNER PRODUCTS with `ip = true`
  * (maximum-inner-product retrieval: the consumer ranks the summed
  * table DESCENDING instead). One codegen'd loop sharing [[PqEncode]]'s
  * arithmetic (same folds, same rounding), instead of m·ksub separate
  * dot expressions whose generated class is large enough to dominate
  * the query in janino compile time. NULL on null input / dim mismatch
  * / null element.
  */
case class PqQueryTable(child: Expression, books: Array[Array[Array[Float]]],
    ip: Boolean = false)
    extends UnaryExpression {

  private val m = books.length
  private val ksub = books(0).length
  private val dsub = books(0)(0).length

  @transient private lazy val selfDots: Array[Array[Double]] =
    books.map(_.map { sub =>
      var s = 0.0; var i = 0
      while (i < sub.length) { s += sub(i).toDouble * sub(i).toDouble; i += 1 }
      s
    })

  override def dataType: DataType = ArrayType(
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_qtab"

  /** The table computation, shared by interpreted eval and the codegen
    * delegation (the loop is data-dependent on `books`; emitting it
    * inline would re-grow the generated class this kernel exists to
    * shrink — one virtual call per QUERY row is noise).
    */
  def evalTable(x: ArrayData): ArrayData = {
    if (x.numElements() != m * dsub) return null
    var e = 0
    while (e < m * dsub) { if (x.isNullAt(e)) return null; e += 1 }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var xx = 0.0
      if (!ip) { // the query self-dot only feeds the L2 expansion
        var i0 = 0
        while (i0 < dsub) {
          val v = x.getFloat(off + i0).toDouble; xx += v * v; i0 += 1
        }
      }
      var i = 0
      val row = new Array[Long](ksub)
      var c = 0
      while (c < ksub) {
        val cv = books(j)(c)
        var xc = 0.0
        i = 0
        while (i < dsub) {
          xc += x.getFloat(off + i).toDouble * cv(i).toDouble; i += 1
        }
        row(c) =
          if (ip) PqEncode.roundE6(xc)
          else PqEncode.roundE6(xx - 2.0 * xc + selfDots(j)(c))
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    evalTable(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqQueryTable", this,
      "graft.functions.PqQueryTable")
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $self.evalTable($x);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance: sum of per-subspace table lookups —
  * `Σ_j qtab[j][codes[j]]` over an `array<array<long>>` distance table
  * (query side) and an `array<int>` code vector (corpus side). The HOF
  * spelling (`aggregate(zip_with(...))`) is value-identical but is a
  * CodegenFallback, which knocks the whole ADC join stage out of
  * whole-stage codegen. NULL on null input, subspace-count mismatch, or
  * an out-of-range code.
  */
case class PqAdcDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(t: Any, c: Any): Any = {
    val tab = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tab.numElements() != m) return null
    var acc = 0L
    var j = 0
    while (j < m) {
      val row = tab.getArray(j)
      val code = codes.getInt(j)
      if (code < 0 || code >= row.numElements()) return null
      acc += row.getLong(code)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val code = ctx.freshName("code")
      s"""
         |int $m = $c.numElements();
         |if ($t.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $m; $j++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $t.getArray($j);
         |    int $code = $c.getInt($j);
         |    if ($code < 0 || $code >= $row.numElements()) { ${ev.isNull} = true; break; }
         |    $acc += $row.getLong($code);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** `round(x * 1e6)` with Spark's DoubleType Round semantics
    * (BigDecimal HALF_UP), then truncating long cast — bit-identical to
    * the declarative `round(expr * 1e6).cast("long")` this kernel
    * replaces (and to DuckDB's `round`).
    */
  def roundE6(x: Double): Long = {
    val scaled = x * 1e6
    if (scaled.isNaN || scaled.isInfinite) return scaled.toLong
    java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }
}
