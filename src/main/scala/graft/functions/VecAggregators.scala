package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated element-wise vector sums in exact e6 fixed point. */
final case class VecAgg(n: Long, sums: Array[Long])

/** Typed `Aggregator[IN, BUF, OUT]` (the UDAF surface, SURVEY §2.10):
  * element-wise sum of embedding vectors in e6 fixed point — the partial
  * step of a centroid computation. Fixed-point longs keep the aggregation
  * associative and order-independent (double sums are neither), so the
  * result is exact, mergeable map-side, and oracle-checkable.
  */
final class VecSumE6 extends Aggregator[Array[Float], VecAgg, VecAgg] {

  /** round-half-away-from-zero on the exact double value (matches both
    * Spark SQL round() and DuckDB round() for every non-pathological
    * input; no shortest-decimal detour).
    */
  private def rnd(v: Double): Long =
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong

  override def zero: VecAgg = VecAgg(0L, Array.emptyLongArray)

  override def reduce(b: VecAgg, a: Array[Float]): VecAgg = {
    val sums =
      if (b.sums.isEmpty) new Array[Long](a.length)
      else b.sums
    var i = 0
    while (i < a.length && i < sums.length) {
      sums(i) += rnd(a(i).toDouble * 1e6)
      i += 1
    }
    VecAgg(b.n + 1, sums)
  }

  override def merge(x: VecAgg, y: VecAgg): VecAgg = {
    if (x.sums.isEmpty) return y
    if (y.sums.isEmpty) return x
    val out = new Array[Long](math.max(x.sums.length, y.sums.length))
    var i = 0
    while (i < out.length) {
      out(i) = (if (i < x.sums.length) x.sums(i) else 0L) +
        (if (i < y.sums.length) y.sums(i) else 0L)
      i += 1
    }
    VecAgg(x.n + y.n, out)
  }

  override def finish(reduction: VecAgg): VecAgg = reduction

  override def bufferEncoder: Encoder[VecAgg] = Encoders.product[VecAgg]
  override def outputEncoder: Encoder[VecAgg] = Encoders.product[VecAgg]
}
