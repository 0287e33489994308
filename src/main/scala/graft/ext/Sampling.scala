package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Domain-mixture resampling: downsample domains so the KEPT corpus
    * hits the target mixture `weights` (relative shares, e.g.
    * web→500, books→300, code→200) with maximal data retention — the
    * domain scarcest relative to its target weight is kept at 100% and
    * every other domain is hash-downsampled to match. Domains absent
    * from `weights` are dropped.
    *
    * Exact integer arithmetic end to end: the binding domain b
    * minimizes n_s/w_s, and each domain's acceptance threshold (in
    * millionths) is round(1e6 · (n_b·w_s)/(w_b·n_s)), computed as a
    * rational — no float drift between engines or runs. The per-domain
    * counts are one tiny partial-aggregated groupBy (#domains rows)
    * collected like the k-means centroid literals; the data-path filter
    * is a pure narrow literal CASE on the key hash — pushable,
    * shuffle-free, reproducible bit-for-bit at any scale.
    */
  def domainMix(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "every domain weight must be positive")
    val counts: Map[String, Long] = df
      .filter(col(domainCol).isin(weights.keys.toSeq: _*))
      .groupBy(domainCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false))
    // binding domain: smallest n/w keeps all its rows (double ratio for
    // ordering only — ties broken by name; the thresholds below are
    // exact rationals)
    val (bDom, bW) = present.minBy { case (s, w) => (counts(s).toDouble / w, s) }
    val bN = counts(bDom)
    val thr: Seq[(String, Long)] = present.toSeq.map { case (s, w) =>
      val n = counts(s)
      // round(1e6 * (bN*w)/(bW*n)) = (2*bN*w*1e6 + bW*n) / (2*bW*n) in ints
      val t = ((BigInt(bN) * w * 1000000L * 2 + BigInt(bW) * n) /
        (BigInt(bW) * n * 2)).toLong
      s -> t
    }.sortBy(_._1)
    val thrCol = thr.foldRight(lit(-1L): Column) { case ((s, t), rest) =>
      when(col(domainCol) === s, lit(t)).otherwise(rest)
    }
    df.filter(hashBucket(col(keyCol), 1000000) < thrCol)
  }

  /** Deterministic global shuffle positions (the "shuffle the corpus
    * once, reproducibly" final materialization step): every row gets a
    * dense position `0..n-1` in the order of `md5(seed || key)` (key
    * tiebreak, so the order is total and ENGINE-INDEPENDENT — re-running
    * the pipeline, or any other md5-capable system, produces the
    * identical permutation; Spark's `orderBy(rand())` gives neither).
    *
    * Scale shape: positions depend only on the total hash order, never
    * on partition boundaries — range-partition on the hash, per-
    * partition `row_number`, and driver-side prefix offsets over the
    * per-partition COUNTS (#partitions values), exactly the
    * [[selectByBudget]] formulation. No single-partition global window.
    */
  def shuffledPositions(
      df: DataFrame,
      seed: String,
      keyCol: String = "doc_id",
      outCol: String = "pos"): DataFrame = {
    val h = md5(concat(lit(seed), col(keyCol).cast("string")))
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val ranked = df.withColumn("__h", h)
      .repartitionByRange(parts, col("__h"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true) // one materialization backs both jobs
    Scratch.register(ranked)
    val counts: Map[Int, Long] = ranked
      .groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Seq[(Int, Long)] = {
      var acc = 0L
      (0 until parts).map { p =>
        val o = (p, acc); acc += counts.getOrElse(p, 0L); o
      }
    }
    val offCol = offsets.foldRight(lit(0L): Column) { case ((p, off), rest) =>
      when(col("__pid") === p, lit(off)).otherwise(rest)
    }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__h").asc, col(keyCol).asc)
    ranked
      .withColumn(outCol, row_number().over(w).cast("long") - 1L + offCol)
      .drop("__h", "__pid")
  }

  /** Token-budget corpus selection (the "take the best data up to N
    * tokens" pipeline step): rank rows by (`scoreCol` DESC, `idCol` ASC
    * — a total order when ids are unique) and keep the maximal prefix
    * whose cumulative `tokenCol` stays within `budget`. Token counts
    * must be non-null.
    *
    * Scale shape: a running total over a global ORDER BY window executes
    * in ONE partition — the classic window anti-pattern at 100 TB.
    * Instead the corpus is range-repartitioned on the ranking key,
    * running totals are computed per partition, and each partition's
    * base offset comes from the per-partition sums (#partitions values,
    * collected driver-side and baked back in as a literal CASE) — both
    * corpus-wide passes stay fully parallel.
    */
  def selectByBudget(
      df: DataFrame,
      budget: Long,
      scoreCol: String = "score",
      tokenCol: String = "n_tokens",
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // pin the RANGE partition id as a column — spark_partition_id() is
    // physical-partitioning-dependent and would re-evaluate to the
    // WINDOW exchange's ids if referenced after it. Eagerly checkpoint
    // the ranked relation: the partition-sums job and the window job
    // must see the SAME materialized rows (a nondeterministic score
    // would otherwise silently desync the offsets), and the corpus scan
    // + range exchange runs once, not twice. Registered for
    // Scratch.drain like the pair-generators — consume the result
    // before draining.
    val ranked = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    Scratch.register(ranked)
    val sums: Map[Int, Long] = ranked
      .groupBy("__pid").agg(sum(col(tokenCol)).as("__sum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // offsets(p) = total tokens in partitions before p
    val offsets: Seq[(Int, Long)] = {
      var acc = 0L
      (0 until parts).map { p =>
        val o = (p, acc); acc += sums.getOrElse(p, 0L); o
      }
    }
    val offCol = offsets.foldRight(lit(0L): Column) { case ((p, off), rest) =>
      when(col("__pid") === p, lit(off)).otherwise(rest)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("__cum", sum(col(tokenCol)).over(w) + offCol)
      .filter(col("__cum") <= budget)
      .drop("__cum", "__pid")
  }

  /** Weighted Poisson sampling: include each row independently with
    * probability `min(1, expectedRows · wᵢ / Σw)` — inclusion chance
    * proportional to an integer weight column (tokens, bytes), expected
    * sample size ≈ `expectedRows`. The standard one-pass distributed
    * weighted sampler: ONE narrow filter, no shuffle, no sort — where a
    * top-k-by-jittered-key (A-ES) design needs a global top-k AND
    * transcendental math whose last-ulp differs across engines.
    *
    * Exactness discipline: the inclusion test is pure INTEGER
    * arithmetic in decimal — `hash24(key) · Σw < expectedRows · wᵢ ·
    * 2²⁴` — so any engine with md5 computes the identical sample
    * (DuckDB twin uses HUGEINT). `Σw` is one scalar aggregate, baked
    * into the plan as a literal.
    */
  def weightedSample(
      df: DataFrame,
      expectedRows: Long,
      weightCol: String = "n_tokens",
      keyCol: String = "doc_id",
      /** Precomputed Σw (skips the scalar aggregate job). */
      totalWeightHint: Option[Long] = None): DataFrame = {
    require(expectedRows >= 0, "expectedRows must be non-negative")
    val (totalW, maxW) = totalWeightHint match {
      case Some(t) => (t, t) // conservative: any non-negative wᵢ ≤ Σw
      case None =>
        val r = df.agg(sum(col(weightCol).cast("long")),
          max(col(weightCol).cast("long"))).head()
        (r.getLong(0), r.getLong(1))
    }
    require(totalW > 0, s"total weight must be positive, got $totalW")
    // Decimal(38) headroom proof: both comparison sides must stay inside
    // 38 digits or non-ANSI decimal overflow yields NULL and the filter
    // SILENTLY drops exactly the heaviest rows. LHS ≤ 2²⁴·Σw; RHS ≤
    // expectedRows·max(wᵢ)·2²⁴ — checked in BigInt so the check itself
    // cannot overflow.
    val headroom = BigInt(10).pow(38)
    val shift = BigInt(1L << 24)
    require(shift * BigInt(totalW) < headroom &&
      BigInt(expectedRows) * BigInt(math.max(maxW, 0L)) * shift < headroom,
      s"weightedSample inclusion product exceeds decimal(38) headroom " +
        s"(expectedRows=$expectedRows, maxWeight=$maxW, totalWeight=" +
        s"$totalW) — the overflow would NULL out and silently exclude " +
        "the heaviest rows; rescale the weight column (e.g. kilo-tokens)")
    val dec = "decimal(38,0)"
    df.filter(
      hashBucket(col(keyCol), 1 << 24).cast(dec) * lit(totalW).cast(dec) <
        lit(expectedRows).cast(dec) * col(weightCol).cast(dec) *
          lit(1L << 24).cast(dec))
  }

  /** Per-group quota: keep the top `quota` rows of each group by
    * (score DESC, id ASC) — the "cap every source/domain at N documents"
    * stage. One shuffle on the group key; the ranking window never
    * sees more than a group's rows per partition.
    */
  def groupQuota(
      df: DataFrame,
      quota: Int,
      groupCol: String = "source",
      scoreCol: String = "score",
      idCol: String = "doc_id"): DataFrame = {
    require(quota > 0, "quota must be positive")
    df.withColumn("__rn",
      row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col(scoreCol).desc, col(idCol).asc)))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Per-group quantile gate — the DataComp/fineweb-style curation
    * step "keep each source's best `permille`/1000 by quality score".
    * Unlike [[groupQuota]]'s absolute cap, the kept count scales with
    * the group: exactly ceil(n_group · permille / 1000) rows survive
    * (integer-exact cutoff — no float percent_rank edge cases), ranked
    * by `scoreCol` (descending by default; `ascending = true` for
    * lower-is-better scores) with the id as the deterministic
    * tie-break.
    *
    * Plan shape at 100 TB: ONE shuffle on the group key; both windows
    * (rank + group count) share the same partitioning, so the second
    * window adds no exchange. Never a global sort.
    */
  def topQuantileByGroup(
      df: DataFrame,
      permille: Int,
      groupCol: String = "source",
      scoreCol: String = "score",
      idCol: String = "doc_id",
      ascending: Boolean = false): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille must be in [0, 1000]")
    // NULL scores rank WORST in either direction: a row whose quality is
    // unknown must never win the gate. This also pins cross-engine
    // parity — Spark's bare asc is NULLS FIRST while DuckDB defaults to
    // NULLS LAST, so an ascending gate over a NULL-able score would
    // otherwise keep different rows per engine.
    val order =
      if (ascending) col(scoreCol).asc_nulls_last
      else col(scoreCol).desc_nulls_last
    val ranked = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(order, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    // ceil(n·p/1000) via integral `div` — exact for any group size
    // (double division would wobble at 2^53-scale products)
    ranked
      .filter(col("__rn") <= expr(s"(__n * $permille + 999) div 1000"))
      .drop("__rn", "__n")
  }
}
