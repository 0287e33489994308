package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * Sampling at 100 TB must be (a) a narrow filter — no shuffle, no
  * global ordering, pushable below joins — and (b) stable across runs,
  * engines and partitionings, so ablations and holdout splits are
  * reproducible bit-for-bit. Both operators hash the record KEY (md5 —
  * engine-independent), map it to one of 1000 buckets, and keep rows
  * whose bucket falls under the requested permille. The same key always
  * lands in the same bucket: re-running the pipeline, or sampling a
  * different table keyed by the same id, selects the same population
  * (which is exactly what train/eval splits need — `rand()` gives
  * neither property, and Spark's `sample()` is partitioning-dependent).
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key: first 24 bits of
    * md5(key-as-string). Uniform for any key distribution (cryptographic
    * mixing), identical in any engine with md5.
    */
  def hashBucket(key: Column, buckets: Int = 1000): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("long") % buckets

  /** Keep ~`permille`/1000 of rows, selected by key hash. */
  def hashSample(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille must be in [0, 1000]")
    df.filter(hashBucket(col(keyCol)) < permille)
  }

  /** Deterministic train/val/test (or any) split assignment: each row
    * gets the split whose cumulative permille range its key bucket
    * falls in. Same key → same split, across runs, engines and tables —
    * the property that keeps eval sets leak-free when the corpus is
    * re-materialized. Pure narrow projection (a literal CASE chain).
    * `splits` must sum to exactly 1000 so every row is assigned.
    */
  def splitAssign(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Int)] =
        Seq("train" -> 980, "val" -> 10, "test" -> 10),
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      s"split permilles must sum to 1000, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "every split needs a positive share")
    val bucket = hashBucket(col(keyCol))
    val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val expr = splits.zip(cuts).foldRight(lit(null).cast("string"): Column) {
      case (((name, _), cut), rest) =>
        when(bucket < cut, lit(name)).otherwise(rest)
    }
    df.withColumn(outCol, expr)
  }

  /** Per-stratum sampling rates (permille), e.g. downsample a dominant
    * source while keeping all of a rare one. Strata absent from `rates`
    * are dropped. Still a pure narrow filter: the rate lookup is a
    * literal CASE chain on the stratum column.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 1000),
      "every rate must be in [0, 1000] permille")
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(0): Column) {
      case ((stratum, p), rest) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(rest)
    }
    df.filter(hashBucket(col(keyCol)) < rate)
  }
}
