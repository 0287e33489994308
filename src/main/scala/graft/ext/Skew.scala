package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §4 / 100 TB design note: salting for
  * skew, AQE for runtime re-plan).
  *
  * A hot grouping key funnels its entire group through one reducer; the
  * classic fix is a deterministic salt: aggregate on (key, salt) first —
  * spreading the hot key over `buckets` reducers — then merge partials on
  * the key alone. Spark's map-side combine already partial-aggregates
  * within a task; salting additionally spreads the REDUCE side, which is
  * what melts at 100 TB when one key holds 1% of all rows.
  */
object Skew {

  /** Deterministic salt from `saltSource` (any stable column, e.g. a row
    * id): two-phase sum/count per key.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      saltSource: Column,
      buckets: Int = 16): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("value_sum"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Salted exact distinct count: shuffle 1 de-duplicates on
    * (key, value) — the skewed key spreads by value hash — shuffle 2
    * counts per key. Equivalent to COUNT(DISTINCT value) GROUP BY key
    * with a skew-tolerant plan.
    */
  def saltedCountDistinct(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column): DataFrame =
    df.select((keyCols.map(col) :+ valueCol.as("__v")): _*)
      .distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
}
