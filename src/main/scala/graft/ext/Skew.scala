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

  /** Skew-aware inner equi-join: identical results to
    * `left.join(right, keys)`, planned so a handful of HOT keys cannot
    * melt one reducer.
    *
    * AQE's skew-join handles a skewed SHUFFLE partition, but only at
    * sort-merge-join time and only by splitting partitions — when one
    * key holds 1% of a 100 TB fact table, the standard production fix
    * is differentiated routing, done here explicitly:
    *
    *  1. One partial-aggregated count finds keys with more than
    *     `hotThreshold` left rows — by construction a SHORT list (each
    *     hot key exceeds the threshold), materialized driver-side.
    *  2. COLD keys take the normal shuffle join — no behavior change.
    *  3. HOT keys never shuffle: their left rows stay in place and the
    *     right side's matching rows (a tiny slice: hot KEYS are few —
    *     hot key ≠ big right side in the fact⋈dim shape this targets)
    *     broadcast to them.
    *
    * The union is the exact inner join: every (l, r) pair appears in
    * exactly one branch, decided by its key's hotness.
    */
  def skewJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      hotThreshold: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "skewJoin needs at least one key column")
    val kc = keys.map(col)
    // hot keys are a SHORT list by construction (each exceeds the
    // threshold, so there are at most |left|/threshold of them): collect
    // them once and rebuild as a local relation — a plan literal with no
    // cached-block lifecycle, so the returned lazy join can never lose a
    // dependency to a Scratch.drain that runs before it materializes
    val keySchema = left.select(kc: _*).schema
    val hotKeys = left.groupBy(kc: _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(kc: _*)
      .collect()
    val hot = left.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotKeys: _*), keySchema)
    val cold = left.join(broadcast(hot), keys, "left_anti")
      .join(right, keys)
    val hotRows = left.join(broadcast(hot), keys, "left_semi")
      .join(broadcast(right.join(broadcast(hot), keys, "left_semi")), keys)
    cold.unionByName(hotRows)
  }
}
