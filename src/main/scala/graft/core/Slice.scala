package graft.core

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Half-open time interval `[start, end)`.
  *
  * Mirrors the reference's time-window partition model
  * (reference: dagster_delta/dbiomanager_fixed.py:93-103): incremental data
  * is a time-window partition of an ordinary table, not a stream.
  */
final case class TimeWindow(start: Timestamp, end: Timestamp)

/** One partition dimension of a slice: a column plus either static keys or
  * time windows (reference: dagster_delta/dbiomanager_fixed.py:87-110).
  */
sealed trait PartitionDimension { def column: String }

/** Static partition keys, e.g. `color IN ('red','blue')`. */
final case class StaticDimension(column: String, keys: Seq[String])
    extends PartitionDimension

/** Time-window partition keys. `fmt` optionally formats the timestamp into
  * the (string/int) partition column's representation — the reference's
  * date-format-aware coercion (dagster_delta/handler.py:397-431).
  */
final case class TimeWindowDimension(
    column: String,
    windows: Seq[TimeWindow],
    fmt: Option[String] = None)
    extends PartitionDimension

/** A table restricted to a projection and a conjunction of partition
  * predicates — the unit of one read or write
  * (reference: dagster_delta/dbiomanager_fixed.py:120-126).
  */
final case class TableSlice(
    schema: String,
    table: String,
    partitionDimensions: Seq[PartitionDimension] = Nil,
    columns: Option[Seq[String]] = None)

/** Compiles partition dimensions into Catalyst [[Column]] predicates.
  *
  * Semantics ported from the reference's DNF compiler
  * (dagster_delta/handler.py:350-480):
  *   - static 1 key  -> `col = v`; many keys -> de-duplicated `col IN (...)`
  *   - time windows, READ side  -> collapsed half-open range
  *     `col >= min(start) AND col < max(end)` (handler.py:442-454,536-544)
  *   - time windows, WRITE side -> pinned `col = min(start)` — on output a
  *     window denotes exactly one partition value (handler.py:474-480)
  *   - multiple dimensions AND together (handler.py:350-394)
  *   - string/int partition columns holding dates are coerced through `fmt`
  *     (handler.py:397-431; int cast at 425-427)
  *
  * The compiler is pure planning logic (driver-side, like the reference);
  * Catalyst then gets partition pruning / pushdown for free.
  */
object SliceCompiler {

  sealed trait Side
  case object ReadSide extends Side
  case object WriteSide extends Side

  /** DNF tuple as in the reference: (column, op, value-literal). Kept for
    * logging/metadata parity (handler.py:47-67); the real IR is [[Column]].
    */
  final case class Predicate(column: String, op: String, value: String) {
    override def toString: String = s"$column $op $value"
  }

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  private def fmtTs(ts: Timestamp, fmt: String): String =
    DateTimeFormatter
      .ofPattern(fmt)
      .withZone(ZoneOffset.UTC)
      .format(ts.toInstant)

  /** Literal for a timestamp coerced to the partition column's type. */
  private def coerce(
      ts: Timestamp,
      colType: Option[DataType],
      fmt: Option[String]): Column = colType match {
    case Some(StringType) =>
      lit(fmtTs(ts, fmt.getOrElse("yyyy-MM-dd HH:mm:ss")))
    case Some(IntegerType) | Some(LongType) =>
      // e.g. yyyyMMdd int partition columns
      lit(fmtTs(ts, fmt.getOrElse("yyyyMMdd")).toLong)
    case Some(DateType) =>
      lit(java.sql.Date.valueOf(
        dateFmt.withZone(ZoneOffset.UTC).format(ts.toInstant)))
    case _ => lit(ts)
  }

  private def staticValue(v: String, colType: Option[DataType]): Any =
    colType match {
      case Some(IntegerType) => v.toInt
      case Some(LongType)    => v.toLong
      case _                 => v
    }

  private def staticLit(v: String, colType: Option[DataType]): Column =
    lit(staticValue(v, colType))

  /** Compile one dimension to a predicate [[Column]]. */
  def compileDimension(
      dim: PartitionDimension,
      side: Side,
      colType: Option[DataType] = None): Column = dim match {
    case StaticDimension(c, keys) =>
      val distinct = keys.distinct
      if (distinct.size == 1) col(c) === staticLit(distinct.head, colType)
      else col(c).isin(distinct.map(k => staticValue(k, colType)): _*)
    case TimeWindowDimension(c, windows, fmt) =>
      require(windows.nonEmpty, s"empty time windows for $c")
      // Collapse many windows to one contiguous [min(start), max(end)) —
      // a deliberate over-approximation the reference also makes
      // (handler.py:413-417,448-454).
      val start = windows.map(_.start).minBy(_.getTime)
      val end = windows.map(_.end).maxBy(_.getTime)
      side match {
        case WriteSide => col(c) === coerce(start, colType, fmt)
        case ReadSide =>
          col(c) >= coerce(start, colType, fmt) &&
          col(c) < coerce(end, colType, fmt)
      }
  }

  /** Conjunction over all dimensions; None when slice is unpartitioned. */
  def compile(
      slice: TableSlice,
      side: Side,
      schema: Option[StructType] = None): Option[Column] = {
    val preds = slice.partitionDimensions.map { d =>
      val t = schema.flatMap(s => s.find(_.name == d.column).map(_.dataType))
      compileDimension(d, side, t)
    }
    preds.reduceOption(_ && _)
  }

  /** DNF tuples for logging/metadata parity with the reference. */
  def toDnf(slice: TableSlice, side: Side): Seq[Predicate] =
    slice.partitionDimensions.flatMap {
      case StaticDimension(c, keys) =>
        val d = keys.distinct
        if (d.size == 1) Seq(Predicate(c, "=", s"'${d.head}'"))
        else Seq(Predicate(c, "in", d.mkString("('", "','", "')")))
      case TimeWindowDimension(c, ws, _) =>
        val start = ws.map(_.start).minBy(_.getTime)
        val end = ws.map(_.end).maxBy(_.getTime)
        side match {
          case WriteSide => Seq(Predicate(c, "=", s"'$start'"))
          case ReadSide =>
            Seq(Predicate(c, ">=", s"'$start'"), Predicate(c, "<", s"'$end'"))
        }
    }

  /** Apply a slice to a DataFrame: predicate then projection
    * (reference read path: handler.py:316,536-549).
    */
  def apply(df: org.apache.spark.sql.DataFrame, slice: TableSlice)
      : org.apache.spark.sql.DataFrame = {
    val filtered = compile(slice, ReadSide, Some(df.schema))
      .map(df.filter)
      .getOrElse(df)
    slice.columns match {
      case Some(cs) => filtered.select(cs.map(col): _*)
      case None     => filtered
    }
  }
}
