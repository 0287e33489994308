package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key over 2–4 double-cast columns: each value is
  * quantile-ranked against its column's equi-depth cut points (count of
  * cuts below = coarse bucket, uniform interpolation inside the bucket
  * refines to 16 bits), then the ranks' bits are interleaved.
  *
  * Replaces the declarative formulation (a fold of 255 `when(v > cut)`
  * comparisons per column, with the whole rank subtree duplicated once
  * per interleaved bit): that expression tree was large enough that
  * janino compilation dominated OPTIMIZE ZORDER wall-clock (~50 s per
  * call regardless of data size, and uncacheable — the literal cuts
  * differ per table). Here the cuts ride as a reference object and
  * ranking is a binary search; the expression is a deliberate
  * CodegenFallback — the key feeds a range-shuffle SORT, whose cost
  * dwarfs interpreted per-row eval, and skipping codegen is exactly
  * what removes the janino bill. NULL inputs rank 0 (deterministic; a
  * key is a layout hint, not data).
  */
case class MortonKey(children: Seq[Expression], cuts: Array[Array[Double]])
    extends Expression with CodegenFallback {

  private val stride = children.size
  private val bitsPer = 16

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_morton_key"

  def evalKey(row: InternalRow): Long = {
    var acc = 0L
    var i = 0
    while (i < stride) {
      val v = children(i).eval(row)
      val rank =
        if (v == null) 0L
        else {
          val d = v.asInstanceOf[Double]
          val cu = cuts(i)
          val j = java.util.Arrays.binarySearch(cu, d)
          val coarse = if (j >= 0) j else -(j + 1) // #cuts strictly below d
          val lo = if (coarse == 0) Double.MinValue else cu(coarse - 1)
          val hi = if (coarse == cu.length) Double.MaxValue else cu(coarse)
          val frac = if (hi > lo) (d - lo) / (hi - lo) else 0.0
          val fine = math.min(math.max(math.floor(frac * 256).toInt, 0), 255)
          (coarse.toLong * 256L + fine) % (1L << bitsPer)
        }
      var b = 0
      while (b < bitsPer) {
        acc |= ((rank >> b) & 1L) << (b * stride + i)
        b += 1
      }
      i += 1
    }
    acc
  }

  override def eval(input: InternalRow): Any = evalKey(input)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
