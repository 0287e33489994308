package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (SURVEY §2.3: range/as-of
  * joins are ABSENT in the reference and delegated to the dataframe
  * library; here they're first-class).
  */
object Joins {

  /** Banded range self-join: all unordered row pairs whose integer
    * `epCol` values lie within `delta` of each other. Instead of the
    * naive O(n²) inequality join, rows are bucketed at width `delta` and
    * each left row probes only buckets {b-1, b, b+1} — the join shuffles
    * on the bucket key and each pair is found exactly once (the right
    * row's bucket is unique). Linear in data for bounded density.
    */
  def bandedRangeSelfJoin(
      df: DataFrame,
      idCol: String,
      epCol: String,
      delta: Long): DataFrame = {
    require(delta > 0, "delta must be positive")
    val base = df.select(col(idCol), col(epCol))
    val bucket = floor(col(epCol) / delta).cast("long")
    val probes = base
      .select(col(idCol).as("a_id"), col(epCol).as("ep_a"),
        explode(array(bucket - 1, bucket, bucket + 1)).as("__bucket"))
    val build = base
      .select(col(idCol).as("b_id"), col(epCol).as("ep_b"),
        bucket.as("__bucket"))
    probes
      .join(build, Seq("__bucket"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("ep_a") - col("ep_b")) <= delta)
      .select(col("a_id"), col("b_id"), (col("ep_b") - col("ep_a")).as("diff"))
  }

  /** As-of join: for every left row, the single latest right row with
    * `right.ts <= left.ts` in the same key group (LEFT semantics:
    * unmatched left rows keep nulls).
    *
    * Plan: tag sides, align schemas, union, then one window pass per key
    * ordered by (ts, side) taking the last non-null right value — a
    * single shuffle on the key, O(n log n) in the partition, and no
    * range-join row explosion (the naive `l.ts >= r.ts` join is
    * O(|L|·|R|) per key). This is the formulation that survives 100 TB:
    * both inputs shuffle once on the key and stream through one sort.
    *
    * `right` must be unique per (key, ts) — pre-aggregate if not, or
    * matches are nondeterministic (DuckDB's ASOF JOIN has the same
    * contract).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.exists(leftCols.contains),
      s"right value columns $rightValueCols collide with left columns")

    val alignedLeft = left
      .withColumn("__side", lit(1))
      .select(
        (leftCols.map(col) :+ col("__side")) ++
          rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val alignedRight = right
      .withColumn("__side", lit(0))
      .select(
        (keyCols.map(col) :+ col(tsCol) :+ col("__side")) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightValueCols.map(col): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side")) // right rows sort before left at ts ties => '<=' semantics
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(alignedLeft.unionByName(alignedRight)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
