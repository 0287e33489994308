package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (SURVEY §2.3: range/as-of
  * joins are ABSENT in the reference and delegated to the dataframe
  * library; here they're first-class).
  */
object Joins {

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
