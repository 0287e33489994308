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

/** One scored candidate: similarity (e6 fixed point) + neighbor id. */
final case class Scored(sim_e6: Long, n_id: Long)

/** Bounded top-k by (sim desc, id asc) as a typed Aggregator: the
  * partial buffer never exceeds k entries, so map-side combine reduces
  * each upstream partition to ≤ k rows BEFORE the exchange — a top-k
  * over n·q scored pairs shuffles O(q · k · partitions) rows, where the
  * window row_number() formulation shuffles (and sorts) all n·q. That
  * is the difference between a kNN that survives 100 TB and one that
  * dies in the exchange. Determinism: total order (sim desc, id asc),
  * insertion-order independent.
  */
final class TopKBySim(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  // (sim desc, id asc) — the same order the window formulation used
  private def lt(a: Scored, b: Scored): Boolean =
    a.sim_e6 > b.sim_e6 || (a.sim_e6 == b.sim_e6 && a.n_id < b.n_id)

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortWith(lt).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    // cheap admission check keeps the common no-op path allocation-free
    if (b.length >= k && !lt(a, b.last)) b else trim(b :+ a)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    if (x.isEmpty) y else if (y.isEmpty) x else trim(x ++ y)

  override def finish(r: Seq[Scored]): Seq[Scored] = trim(r)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}
