package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column (north-star EXT surface; SURVEY §2.8).
  *
  * Numeric discipline: every dot product is a sequential left-to-right
  * fold over float-widened-to-double elements, so results are
  * bit-reproducible across engines (the DuckDB oracle computes the same
  * fold); ranking uses micro-rounded similarity with an id tie-break so
  * the top-k set is stable.
  *
  * Scale paths:
  *   - [[bruteTopK]]: broadcast the (small) query set, stream the corpus —
  *     O(|corpus|·|queries|) FLOPs, no shuffle of the corpus, the right
  *     plan when queries ≪ corpus (the common "probe set" case).
  *   - [[ivfTopK]]: coarse-quantize the corpus to deterministic centroids
  *     (IVF); queries probe only their own cell — O(|corpus|·k_centroids)
  *     assignment (one broadcast pass) + per-cell joins. At 100 TB the
  *     cell assignment is the only corpus-wide pass and the candidate
  *     join shuffles on `cell`, not all-pairs.
  */
object Similarity {

  /** Sequential fold dot product of two float-array columns in double —
    * dispatched to the native codegen expression
    * [[graft.functions.DotProductFP64]] (registered by every operator
    * entry point below); semantics identical to the HOF fold
    * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0d, +)`.
    */
  def dot(a: Column, b: Column): Column =
    call_function(graft.functions.GraftFunctions.DotName, a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Micro-rounded cosine for stable cross-engine ordering. */
  def simE6(a: Column, b: Column): Column =
    round(cosine(a, b) * 1e6).cast("long")

  /** Micro-rounded Euclidean distance via the dot expansion
    * ‖a−b‖² = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩ — three shared sequential folds
    * instead of an elementwise-difference pass, so the DuckDB twin
    * replays the exact IEEE op sequence (constants stay symbolic).
    * Near-duplicate vectors can round the expansion a hair NEGATIVE —
    * clamped to 0 on BOTH engines before the sqrt (DuckDB's sqrt errors
    * on negatives where Spark would yield NaN).
    */
  def distE6(a: Column, b: Column): Column =
    round(sqrt(greatest(dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b),
      lit(0.0))) * 1e6).cast("long")

  /** Micro-rounded inner product (maximum-inner-product search). */
  def dotE6(a: Column, b: Column): Column =
    round(dot(a, b) * 1e6).cast("long")

  /** Top-k selection from (q_id, n_id, sim_e6) scored rows through the
    * bounded [[graft.functions.TopKBySim]] aggregator: partial buffers
    * are capped at k, so map-side combine collapses every upstream
    * partition to ≤ k candidates per query BEFORE the exchange — the
    * shuffle carries O(queries · k · partitions) rows. The window
    * `row_number()` formulation this replaces shuffled and sorted ALL
    * n·q scored rows, which is the part of a brute-force kNN that
    * actually dies at 100 TB. Order (sim desc, id asc) matches the
    * window tie-break exactly, so results are identical.
    */
  private def topKRows(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKBySim(k))
    scored
      // a corrupt embedding (null / null element / dim mismatch) yields a
      // NULL sim; it can never be a meaningful neighbor, so drop it before
      // the non-nullable aggregator input. Consequence: a query whose
      // candidates are ALL corrupt is absent from the result (the old
      // window form emitted it with null-sim placeholder rows) — absence
      // is the contract here, not padding
      .filter(col("sim_e6").isNotNull && col("n_id").isNotNull)
      .groupBy("q_id")
      .agg(topk(col("sim_e6"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.n_id").as("n_id"),
        (col("pos") + 1).as("rank"), col("s.sim_e6").as("sim_e6"))
  }

  /** Exact top-k neighbors of each query vector, brute force.
    * `queries` must be small enough to broadcast. `metric` picks the
    * score: `cosine` (default) and `dot` rank by similarity descending
    * (`sim_e6`); `l2` ranks by Euclidean distance ascending and emits
    * `dist_e6` instead — internally the negated distance rides the same
    * bounded top-k aggregator, so all three metrics share one plan
    * shape (broadcast queries, one narrow corpus pass, capped partial
    * buffers before the exchange).
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = "cosine"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = TextOps.spread(corpus)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val score = metric match {
      case "cosine" => simE6(col("q_vec"), col("n_vec"))
      case "dot"    => dotE6(col("q_vec"), col("n_vec"))
      // distances are non-negative, so the micro-round happens on the
      // positive value and only THEN negates — ordering by sim desc is
      // exactly dist asc with the identical rounding as the oracle
      case "l2"     => -distE6(col("q_vec"), col("n_vec"))
      case other => throw new IllegalArgumentException(
        s"unknown metric '$other' (cosine | dot | l2)")
    }
    val scored = c
      .crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim_e6", score)
    val top = topKRows(scored, k)
    if (metric == "l2")
      top.select(col("q_id"), col("n_id"), col("rank"),
        (-col("sim_e6")).as("dist_e6"))
    else top
  }

  /** Deterministic coarse centroids: every `stride`-th vector by id.
    * (Production would k-means; the plan shape downstream is identical.)
    */
  def centroids(corpus: DataFrame, stride: Long, idCol: String, vecCol: String): DataFrame =
    corpus
      .filter(col(idCol) % stride === 0)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))

  /** Fixed-size centroid seed: `k` is independent of the corpus size
    * (stride = ceil(n/k) over the id space), which bounds the centroid
    * broadcast at k·dim·4 bytes — k=32, dim=64 is 8 KiB; even k=4096,
    * dim=1024 is 16 MiB — no matter how large the corpus grows, and keeps
    * the assignment pass at O(n·k) FLOPs with a single broadcast. (The
    * earlier every-16th-vector seeding grew k linearly with n, so the
    * broadcast itself would die around ~10M vectors.) Seeding by id
    * modulo assumes roughly uniform ids; [[kmeansCentroids]] layers Lloyd
    * refinement on top for data-adapted cells.
    */
  def centroidsK(
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    require(k > 0, "centroid count must be positive")
    // the stride needs the corpus size before the query can be built; a
    // caller-supplied hint (or a footer-metadata count via
    // [[graft.io.ParquetMeta.rowCount]]) removes the extra count job the
    // fallback schedules per IVF query
    val n = rowCountHint.getOrElse(corpus.count())
    val stride = math.max(1L, math.ceil(n.toDouble / k).toLong)
    centroids(corpus, stride, idCol, vecCol)
  }

  /** Localize a centroid frame to the id-sorted driver-side array every
    * literal-centroid plan builds from — ONE collect job. Internal
    * pipelines thread this array through training, assignment and
    * residualization instead of re-collecting a centroid DataFrame per
    * stage: each avoided collect was a whole extra Spark job (plan +
    * schedule + run), a fixed cost every retrieval query paid 2-5 times.
    */
  private[ext] def collectCentroidArr(cents: DataFrame): Array[(Long, Array[Float])] =
    cents
      .select(col("c_id").cast("long"), col("c_vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Spread + pin a corpus that a multi-pass training pipeline will
    * re-read (Lloyd iterations, codebook seeds, the final encode): ONE
    * parquet decode + ONE parallelizing exchange back every pass,
    * instead of a fresh scan + repartition per pass. Same
    * corpus-sized-block budget and Scratch lifecycle as the IVF-PQ
    * residual pin (consume results before `Scratch.drain()`).
    *
    * Fault-tolerance posture (r18 recorded decision, VERDICT item 9):
    * localCheckpoint truncates lineage with non-replicated blocks, so
    * at cluster scale an executor loss during the training passes fails
    * the query instead of recomputing. KEPT, for three measured/
    * structural reasons: (1) the lineage-preserving alternative
    * (`persist(DISK_ONLY)` + materialize) measured slower on every
    * kmeans path same-window (mins: knn_ivfpq_kmeans 3.45 vs 3.06,
    * knn_pq_adc_kmeans 1.73 vs 1.55, knn_ivf_kmeans 1.42 vs 1.37 —
    * forced disk write plus per-pass disk reads); (2) the pin
    * lives only for the duration of one training pipeline and is
    * released by `Scratch.drain()` — the blast radius of a lost block
    * is one retriable query, not a session; (3) at 100 TB the
    * multi-pass training entry points are the wrong tool anyway — the
    * persisted [[AnnIndex]] lifecycle trains once and serves many
    * searches, so the pin's exposure window is a bounded build job.
    */
  private[graft] def pinSpread(df: DataFrame): DataFrame = {
    val pinned = TextOps.spread(df).localCheckpoint(eager = true)
    Scratch.register(pinned)
    pinned
  }

  /** [[centroidsK]] localized ([[collectCentroidArr]]) in one job. */
  private[ext] def centroidArraysK(
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): Array[(Long, Array[Float])] =
    collectCentroidArr(centroidsK(corpus, k, idCol, vecCol, rowCountHint))

  /** A centroid array re-expressed as the (local-relation) DataFrame the
    * public centroid APIs return — no scan, no job behind it.
    */
  private[ext] def centArrToDf(
      spark: org.apache.spark.sql.SparkSession,
      arr: Array[(Long, Array[Float])]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = arr.toIndexedSeq.map { case (id, v) =>
      org.apache.spark.sql.Row(id, v.toIndexedSeq)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("c_id", LongType, nullable = true),
        StructField("c_vec", ArrayType(FloatType, containsNull = true),
          nullable = true))))
  }

  /** Sequential-fold L2 norm on the driver — bit-identical to
    * `sqrt(dot(v, v))` through [[graft.functions.DotProductFP64]] (same
    * left-to-right double fold), so centroid norms can be baked into the
    * plan as literals without changing a single output bit.
    */
  private def foldNorm(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Cell assignment: the `nprobe` nearest centroids per vector.
    *
    * The centroid set is tiny by contract (k is fixed, independent of
    * corpus size — see [[centroidsK]]), so it is localized once and baked
    * into the plan as a literal array. Assignment is then a pure per-row
    * projection: transform over the centroid literal → sort → slice →
    * explode. NO crossJoin, NO window, NO shuffle — on a 1000-executor
    * cluster the corpus-wide assignment pass stays narrow, where the
    * previous crossJoin+row_number shape shuffled n·k scored rows.
    * `nprobe = 1` is the storage assignment; higher values are the
    * query-side multi-probe that trades compute for recall.
    */
  def assignCells(
      corpus: DataFrame,
      cents: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      /** Also emit `c_sim_e6`, the micro-rounded cosine to the chosen
        * centroid the assignment already computed — callers that rank
        * by centrality ([[clusterBalancedSelect]]) reuse it instead of
        * re-joining centroids and re-evaluating the dot product.
        * `-nsim` is bit-identical to [[simE6]] by construction (the
        * literal c_norm is the driver-side [[foldNorm]] of the same
        * doubles `norm` folds).
        */
      keepSim: Boolean = false,
      /** Rank cells by raw DOT instead of cosine — the inner-product
        * coarse quantizer for MIPS ([[ivfIpTopK]]); with `keepSim` the
        * emitted score is then the rounded dot, not the cosine.
        */
      byDot: Boolean = false): DataFrame =
    assignCellsArr(corpus, collectCentroidArr(cents), idCol, vecCol,
      nprobe, keepSim, byDot)

  /** [[assignCells]] against an already-localized centroid array — the
    * internal form every Similarity pipeline uses so one query collects
    * its centroids exactly once. `spreadInput = false` skips the
    * parallelizing round-robin repartition: query-side assignments are
    * tiny-by-contract and immediately broadcast, so the exchange bought
    * nothing (one whole shuffle per retrieval query).
    */
  private[graft] def assignCellsArr(
      corpus: DataFrame,
      centRows: Array[(Long, Array[Float])],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      keepSim: Boolean = false,
      byDot: Boolean = false,
      spreadInput: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    if (centRows.isEmpty)
      return corpus.select(col(idCol), col(vecCol)).limit(0)
        .withColumn("cell", lit(0L))
    val centArr = array(centRows.map { case (id, vec) =>
      struct(lit(id).as("c_id"), typedLit(vec).as("c_vec"),
        lit(foldNorm(vec)).as("c_norm"))
    }.toIndexedSeq: _*)
    // same arithmetic as simE6 (dot / (norm_q · norm_c) · 1e6, rounded):
    // norm_c comes from the literal, norm_q is re-evaluated per centroid
    // exactly as the crossJoin shape did — identical doubles in, identical
    // longs out, so downstream hashes are unchanged
    val qNorm = norm(col(vecCol))
    val scored = transform(centArr, c =>
      struct((-round(
        (if (byDot) dot(col(vecCol), c("c_vec"))
         else dot(col(vecCol), c("c_vec")) / (qNorm * c("c_norm"))) * 1e6)
        .cast("long")).as("nsim"),
        c("c_id").as("c_id")))
    // ascending struct sort = sim desc, c_id asc — the old tie-break
    val base = if (spreadInput) TextOps.spread(corpus) else corpus
    val probed = base
      .select(col(idCol), col(vecCol))
      .withColumn("__probe", explode(slice(sort_array(scored), 1, nprobe)))
    if (keepSim)
      probed.select(col(idCol), col(vecCol),
        col("__probe.c_id").as("cell"),
        (-col("__probe.nsim")).as("c_sim_e6"))
    else
      probed.select(col(idCol), col(vecCol), col("__probe.c_id").as("cell"))
  }

  /** Cluster-balanced corpus selection — the embedding-space diversity
    * curation step (SemDeDup / prototype-pruning family): assign every
    * vector to its nearest coarse cell, then keep at most `perCell`
    * per cell ranked by similarity-to-centroid ASCENDING (the cell's
    * most prototypical near-duplicates are what over-represented
    * clusters shed first), id tie-break. A dominant cluster contributes
    * `perCell` rows like every other — the kept corpus is balanced
    * across embedding-space regions instead of mirroring the raw
    * distribution.
    *
    * Plan shape at 100 TB: centroids are plan literals (narrow
    * assignment pass, no shuffle), the centroid re-join is a broadcast
    * of k rows, and the per-cell ranking is ONE shuffle on `cell` —
    * never vector×vector.
    *
    * Output: (idCol, cell, c_sim_e6, rank_in_cell).
    */
  def clusterBalancedSelect(
      corpus: DataFrame,
      numCells: Int,
      perCell: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    require(perCell > 0, "perCell must be positive")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cents = centroidsK(corpus, numCells, idCol, vecCol, rowCountHint)
    // the assignment pass already computed each row's centroid cosine —
    // keepSim reuses it (no centroid re-join, no second dot product)
    val assigned = assignCells(corpus, cents, idCol, vecCol, keepSim = true)
    assigned
      .withColumn("rank_in_cell", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("c_sim_e6").asc, col(idCol).asc)).cast("long"))
      .filter(col("rank_in_cell") <= perCell)
      .select(col(idCol), col("cell"), col("c_sim_e6"), col("rank_in_cell"))
  }

  /** Lloyd (k-means) refinement of the coarse IVF centroids: assign to
    * the nearest centroid, recompute each cell's element-wise mean,
    * repeat. The mean runs through the exact fixed-point
    * [[graft.functions.VecSumE6]] aggregator (sum_e6 / 1e6 / n, cast to
    * float), so every iteration is deterministic and cross-engine
    * reproducible. Per iteration: one broadcast assignment pass + one
    * partial-aggregated shuffle on `cell` — linear in corpus size.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      numCentroids: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      /** Lloyd assignment by rounded-DOT argmax instead of cosine — the
        * inner-product coarse quantizer's training loop ([[ivfIpTopK]]
        * with refinement): cells adapt to where the MIPS candidates
        * live, which for unnormalized corpora differs from the cosine
        * cells (magnitude carries signal). The mean recompute is
        * metric-independent (same fixed-point arithmetic).
        */
      byDot: Boolean = false): DataFrame = {
    if (iters <= 0)
      return centroidsK(corpus, numCentroids, idCol, vecCol, rowCountHint)
    centArrToDf(corpus.sparkSession,
      kmeansCentroidArrays(corpus, numCentroids, iters, idCol, vecCol,
        rowCountHint, byDot))
  }

  /** [[kmeansCentroids]] keeping the centroids as driver arrays between
    * iterations: the seed collect plus ONE heavy job per Lloyd pass is
    * the minimum the algorithm admits — the DataFrame round trips the
    * old loop paid (a collect job inside every assignment, another to
    * localize each `next`) were pure per-query fixed cost.
    */
  private[graft] def kmeansCentroidArrays(
      corpus: DataFrame,
      numCentroids: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      byDot: Boolean = false): Array[(Long, Array[Float])] = {
    val vecsum = udaf(new graft.functions.VecSumE6())
    var cents = centroidArraysK(corpus, numCentroids, idCol, vecCol, rowCountHint)
    for (_ <- 1 to iters) {
      val assigned = assignCellsArr(corpus, cents, idCol, vecCol, byDot = byDot)
      // one job per iteration: the assignment pass + fixed-point mean,
      // collected straight into the next iteration's literal array (a
      // cell that loses every member drops, exactly as before)
      cents = assigned
        .groupBy(col("cell").as("c_id"))
        .agg(vecsum(col(vecCol)).as("agg"))
        .select(col("c_id"),
          transform(col("agg.sums"),
            s => (s.cast("double") / lit(1e6) / col("agg.n")).cast("float"))
            .as("c_vec"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
    }
    cents
  }

  /** IVF top-k against an explicit centroid set (e.g. k-means-refined).
    * Queries probe their `nprobe` nearest cells (corpus rows stay in
    * exactly one cell, so candidates are distinct by construction).
    *
    * ==Query-side size contract==
    * `queryPred` must select a query set SMALL ENOUGH TO BROADCAST (a
    * probe set — thousands to low millions of rows, comfortably under
    * `spark.sql.autoBroadcastJoinThreshold`-scale budgets and Spark's
    * hard 8 GB broadcast cap). The cell join deliberately pins the
    * build side to the query side instead of trusting size estimates:
    * left to the planner, an estimate accident built the hash relation
    * from the CORPUS side (fatal at real scale) or degraded to
    * shuffling corpus vectors by cell. The trade (r17, kept after r18
    * review): a caller passing a corpus-sized `queryPred` now fails on
    * broadcast memory instead of silently degrading — at 100 TB the
    * "degraded" plan was never viable anyway. This contract applies to
    * every retrieval entry point taking `queryPred` (the brute / PQ /
    * IVF-PQ / IP families and [[AnnIndex.search]]'s `queries` frame).
    */
  def ivfTopKWith(
      corpus: DataFrame,
      cents: DataFrame,
      queryPred: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1): DataFrame =
    ivfTopKWithArr(corpus, collectCentroidArr(cents), queryPred, k,
      idCol, vecCol, nprobe)

  /** [[ivfTopKWith]] with localized centroids: ONE centroid collect per
    * query (not one per assignment pass), no repartition of the
    * tiny-by-contract query side, and the query side EXPLICITLY
    * broadcast — left to size estimates, the planner was building the
    * hash relation from the CORPUS side (fatal at real scale) and could
    * fall back to shuffling corpus vectors by cell.
    */
  private[graft] def ivfTopKWithArr(
      corpus: DataFrame,
      centArr: Array[(Long, Array[Float])],
      queryPred: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1): DataFrame = {
    val cells = assignCellsArr(corpus, centArr, idCol, vecCol)
    val q = broadcast(
      assignCellsArr(corpus.filter(queryPred), centArr, idCol, vecCol,
        nprobe, spreadInput = false)
        .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("cell")))
    val c = cells
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("cell"))
    val scored = q
      .join(c, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim_e6", simE6(col("q_vec"), col("n_vec")))
    topKRows(scored, k)
  }

  /** Embedding-cosine near-duplicate candidate pairs, blocked by IVF
    * cell: vectors in the same coarse cell whose cosine exceeds the
    * threshold. The all-pairs compare is confined to cells (like LSH
    * bands for text) — the shuffle keys on `cell`, never all-pairs.
    *
    * Scale posture (the two knobs that keep this off the O(n²) cliff):
    *   - `numCentroids = 0` (default) scales the cell count with the
    *     corpus: k = max(32, ⌈√n⌉), so the assignment pass (O(n·k)) and
    *     the within-cell compare (O(Σ cell²) ≈ n²/k) balance at O(n^1.5)
    *     total FLOPs instead of the fixed-k n²/32. Callers wanting finer
    *     blocking pass an explicit k.
    *   - `maxCell` hard-bounds degenerate corpora: a cell hotter than
    *     `maxCell` is dropped before the self-join (same posture as
    *     [[TextOps.simhashPairs]]'s hot-bucket guard — a cell that hot
    *     means the centroid set is uninformative for this corpus; raise
    *     `numCentroids` rather than brute-forcing the cell). Worst-case
    *     work is therefore ≤ #cells · maxCell² no matter the data.
    */
  def cosineDupPairs(
      corpus: DataFrame,
      minSimE6: Long,
      numCentroids: Int = 0,
      maxCell: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    require(maxCell > 0, "maxCell must be positive")
    val n = rowCountHint.getOrElse(corpus.count())
    val k =
      if (numCentroids > 0) numCentroids
      else math.max(32, math.ceil(math.sqrt(n.toDouble)).toInt)
    // the capped cell relation is SELF-JOINED below — pin it once
    // (eager localCheckpoint, the minhashPairs/components lifecycle) or
    // each join side replays the whole assignment pass + hot-cell window
    // (a second corpus-wide pass at 100 TB; Exchange reuse is not
    // trusted across self-joins of expensive pipelines — see NOTES)
    val cells = {
      val raw = assignCellsArr(corpus,
        centroidArraysK(corpus, k, idCol, vecCol, Some(n)), idCol, vecCol)
        .withColumn("__cn", count(lit(1)).over(Window.partitionBy("cell")))
        .filter(col("__cn") <= maxCell)
        .drop("__cn")
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    val a = cells.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("cell"))
    val b = cells.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim_e6", simE6(col("va"), col("vb")))
      .filter(col("sim_e6") >= minSimE6)
      .select("id_a", "id_b", "sim_e6")
  }

  /** Unit-normalize the embedding column (L2): the standard prep before
    * cosine retrieval (dot of unit vectors = cosine). Pure per-row
    * codegen'd arithmetic — no shuffle; the norm is the exact sequential
    * double fold, so results are bit-reproducible cross-engine.
    * Zero vectors pass through unchanged.
    */
  def normalize(
      corpus: DataFrame,
      vecCol: String = "embedding",
      outCol: String = "unit"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = norm(col(vecCol))
    corpus.withColumn(outCol,
      when(n > 0,
        transform(col(vecCol), x => (x.cast("double") / n).cast("float")))
        .otherwise(col(vecCol)))
  }

  /** Symmetric per-vector int8 quantization: scale = max |x|, q[i] =
    * floor(x·127/scale + 0.5) ∈ [-127, 127] — the usual storage/compute
    * shrink for retrieval corpora (4× smaller than float32). floor(+0.5)
    * instead of round() keeps half-way cases engine-independent. Returns
    * the quantized array plus `scale_e6` for dequantization. One codegen
    * pass per row ([[graft.functions.QuantizeInt8]]) — the declarative
    * HOF formulation re-evaluates the scale per element (O(d²)/row).
    */
  def quantizeInt8(
      corpus: DataFrame,
      vecCol: String = "embedding",
      outCol: String = "q8"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    corpus
      .withColumn("__qz",
        call_function(graft.functions.GraftFunctions.QuantizeName, col(vecCol)))
      .withColumn(outCol, col("__qz.q8"))
      .withColumn("scale_e6", col("__qz.scale_e6"))
      .drop("__qz")
  }

  // ---------- Product quantization (PQ) ----------

  /** Sequential-fold self dot product on the driver — bit-identical to
    * `dot(v, v)` through [[graft.functions.DotProductFP64]].
    */
  private[ext] def foldSelfDot(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    s
  }

  /** Driver-side PQ codebooks: the `ksub` stride-seeded centroids (same
    * deterministic seeding contract as [[centroidsK]] — production would
    * k-means per subspace; the plan shape downstream is identical),
    * sliced into `m` equal subspaces. Per subspace: (idx, subvector,
    * self-dot) sorted by centroid id, idx = dense 0-based code. Size is
    * ksub·dim·4 bytes regardless of corpus size, so the codebooks bake
    * into the plan as literals — assignment and ADC scoring are pure
    * per-row projections, no shuffle, no broadcast join.
    */
  private[ext] def pqCodebooks(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      idCol: String,
      vecCol: String,
      rowCountHint: Option[Long]): (Int, Array[Array[(Int, Array[Float], Double)]]) = {
    require(m > 0 && ksub > 0, "m and ksub must be positive")
    val cents = centroidArraysK(corpus, ksub, idCol, vecCol, rowCountHint)
    require(cents.nonEmpty, "PQ codebooks need a non-empty corpus")
    val dim = cents.head._2.length
    require(dim % m == 0, s"embedding dim $dim is not divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { j =>
      cents.zipWithIndex.map { case ((_, v), idx) =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        (idx, sub, foldSelfDot(sub))
      }
    }
    (dsub, books)
  }

  /** Per-subspace Lloyd (k-means) refinement of the PQ codebooks:
    * stride seeds as init, then per iteration ONE corpus pass encodes
    * every vector through the current books (the native
    * [[graft.functions.PqEncode]] kernel — all m subspaces in one
    * projection), explodes to (subspace, code, subvector) and
    * recomputes each sub-centroid as the fixed-point elementwise mean
    * of its members ([[graft.functions.VecSumE6]]: sum of
    * round(x·1e6) bigints / 1e6 / n, cast to float — deterministic and
    * cross-engine reproducible, same arithmetic as [[kmeansCentroids]]).
    * A code with no members keeps its previous sub-centroid.
    *
    * Scale: per iteration one narrow encode pass + one partial-agg
    * shuffle keyed on (m·ksub) groups; the collected means are
    * m·ksub·dsub floats (the codebook itself) — corpus vectors never
    * reach the driver. Stride seeds bound the RECALL floor this lifts:
    * id-order seeding ignores the data distribution, Lloyd adapts the
    * cells to it.
    */
  private[ext] def pqCodebooksKmeans(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      idCol: String,
      vecCol: String,
      rowCountHint: Option[Long]): (Int, Array[Array[(Int, Array[Float], Double)]]) = {
    val (dsub, books0) = pqCodebooks(corpus, m, ksub, idCol, vecCol, rowCountHint)
    var books = books0
    val vecsum = udaf(new graft.functions.VecSumE6())
    val base = TextOps.spread(corpus)
    for (_ <- 1 to iters) {
      val means = base
        .select(col(vecCol).as("__v"), pqCodesExpr(vecCol, dsub, books).as("__codes"))
        .select(col("__v"), posexplode(col("__codes")).as(Seq("j", "code")))
        .select(col("j").cast("int").as("j"), col("code").cast("int").as("code"),
          slice(col("__v"), col("j") * lit(dsub) + lit(1), lit(dsub)).as("sub"))
        .groupBy("j", "code")
        .agg(vecsum(col("sub")).as("agg"))
        .select(col("j"), col("code"),
          transform(col("agg.sums"), s =>
            (s.cast("double") / lit(1e6) / col("agg.n")).cast("float")).as("sub"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      books = Array.tabulate(m)(j => books(j).map { case (idx, old, _) =>
        val v = means.getOrElse((j, idx), old)
        (idx, v, foldSelfDot(v))
      })
    }
    (dsub, books)
  }

  /** PQ encoding through k-means-refined codebooks (see
    * [[pqCodebooksKmeans]]); output shape identical to [[pqEncode]].
    */
  def pqEncodeKmeans(
      corpus: DataFrame,
      m: Int = 16,
      ksub: Int = 16,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // seed scan + `iters` Lloyd passes + the final encode all re-read
    // the corpus — pin it once ([[pinSpread]])
    val pinned = pinSpread(corpus)
    val (dsub, books) = pqCodebooksKmeans(pinned, m, ksub, iters, idCol, vecCol, rowCountHint)
    pinned
      .select(col(idCol), pqCodesExpr(vecCol, dsub, books).as("codes"))
  }

  /** ADC top-k through k-means-refined codebooks; plan shape identical
    * to [[pqTopK]] (codes-only corpus, broadcast query tables).
    */
  def pqTopKKmeans(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      m: Int = 16,
      ksub: Int = 16,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // seed scan + `iters` Lloyd passes + the final ADC scan all re-read
    // the corpus — pin it once ([[pinSpread]])
    val pinned = pinSpread(corpus)
    val (dsub, books) = pqCodebooksKmeans(pinned, m, ksub, iters, idCol, vecCol, rowCountHint)
    pqTopKWith(pinned, queryPred, k, dsub, books, idCol, vecCol)
  }

  /** Mean squared quantization distortion of a codebook set over the
    * corpus (driver-side over a collected sample — diagnostics/tests
    * only): Σ_j ‖x_sub − book_j[code]‖² averaged over vectors, using
    * the same micro-rounded metric as encoding. The collect is
    * hard-capped at `maxSample` rows (deterministic id-order prefix) so
    * reaching for this diagnostic on a real corpus can never pull the
    * corpus onto the driver — past the cap it measures a sample, which
    * is all a mean distortion needs.
    */
  private[graft] def pqDistortion(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      idCol: String,
      vecCol: String,
      maxSample: Int = 100000): Double = {
    val (dsub, books) =
      if (iters == 0) pqCodebooks(corpus, m, ksub, idCol, vecCol, None)
      else pqCodebooksKmeans(corpus, m, ksub, iters, idCol, vecCol, None)
    val vecs = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(maxSample)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    var total = 0.0
    vecs.foreach { v =>
      var j = 0
      while (j < m) {
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        var best = Double.MaxValue
        books(j).foreach { case (_, c, _) =>
          var d = 0.0; var i = 0
          while (i < dsub) {
            val t = sub(i).toDouble - c(i).toDouble; d += t * t; i += 1
          }
          if (d < best) best = d
        }
        total += best
        j += 1
      }
    }
    total / math.max(1, vecs.length)
  }

  /** Codes column via the native [[graft.functions.PqEncode]] kernel:
    * one codegen'd loop per row. The declarative equivalent (m·ksub
    * [[dot]] calls in nested array/sort exprs) is value-identical but
    * overflows whole-stage codegen's method budget and allocates m·ksub
    * structs per row — ~3x slower at sf0.1 and worse at scale.
    */
  private[ext] def pqCodesExpr(
      vecCol: String, dsub: Int, books: Array[Array[(Int, Array[Float], Double)]]): Column =
    org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(vecCol),
        books.map(_.map(_._2))))

  /** Product-quantization encoding: each vector becomes `m` codebook
    * indices (its nearest sub-centroid per subspace, squared-L2,
    * micro-rounded with idx tie-break). The 100 TB shape: codebooks are
    * plan literals, encoding is one narrow per-row pass — the corpus
    * shrinks from dim·4 bytes to m codes per vector for ADC scoring.
    */
  def pqEncode(
      corpus: DataFrame,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val (dsub, books) = pqCodebooks(corpus, m, ksub, idCol, vecCol, rowCountHint)
    TextOps.spread(corpus)
      .select(col(idCol), pqCodesExpr(vecCol, dsub, books).as("codes"))
  }

  /** PQ top-k by asymmetric distance computation (ADC): queries keep
    * full precision and precompute a per-subspace distance table to
    * every sub-centroid (a literal-arithmetic projection on the
    * broadcast query side); corpus vectors are scored through their
    * codes alone — m table lookups + adds per pair instead of a
    * dim-length float loop, and the corpus never ships its vectors to
    * the join. Ranking is (adist asc, n_id asc) through the bounded
    * top-k aggregator, so the shuffle carries O(q·k·partitions) rows.
    */
  def pqTopK(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val (dsub, books) = pqCodebooks(corpus, m, ksub, idCol, vecCol, rowCountHint)
    pqTopKWith(corpus, queryPred, k, dsub, books, idCol, vecCol)
  }

  /** Maximum-inner-product PQ retrieval: same codes (L2-nearest
    * codeword — the standard encoding for MIPS too), but the query-side
    * ADC table holds per-subspace INNER PRODUCTS and ranking is by the
    * summed table DESCENDING (`asim_e6` — larger is closer). This is
    * the retrieval mode for embeddings whose magnitude carries signal
    * (unnormalized two-tower models), where cosine/L2 would distort the
    * ranking. Same plan shape as [[pqTopK]]: codes-only corpus side,
    * broadcast query tables, bounded top-k aggregator.
    */
  def pqTopKIp(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val (dsub, books) = pqCodebooks(corpus, m, ksub, idCol, vecCol, rowCountHint)
    pqTopKWith(corpus, queryPred, k, dsub, books, idCol, vecCol, ip = true)
  }

  /** Cell-confined maximum-inner-product retrieval (IVF-IP): the MIPS
    * analog of [[ivfpqTopK]]. Coarse cells are assigned by raw DOT
    * (FAISS's inner-product coarse quantizer), PQ books train on the
    * RAW vectors — no residual encoding, the standard IP posture
    * (dot doesn't linearize over the residual decomposition the way
    * squared-L2 does) — queries probe their `nprobe` best-dot cells
    * with inner-product ADC tables, and ranking is by summed table
    * DESCENDING. Plan shape matches the L2 family: centroids/books as
    * plan literals, codes-only corpus side, the one shuffle keyed on
    * `cell`, bounded top-k. Output: (q_id, n_id, rank, asim_e6).
    */
  def ivfIpTopK(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      nprobe: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      /** > 0 = Lloyd-refine the coarse centroids with dot-argmax
        * assignment inside the loop ([[kmeansCentroids]] `byDot`) —
        * stride seeds bound the recall floor exactly as in the L2
        * family. The PQ books are UNAFFECTED by coarse refinement here:
        * with no residual stage they train on the raw vectors either
        * way, so refinement buys better candidate confinement without
        * re-deriving the codes' codebooks.
        */
      coarseIters: Int = 0,
      /** Filtered MIPS over the SHARED index (the [[ivfpqTopK]]
        * contract): cells and books still train on the FULL corpus,
        * only rows satisfying the predicate become candidates — a
        * broadcast-friendly semi-join on the predicate's id set narrows
        * the codes side; nothing retrains per filter.
        */
      corpusPred: Option[Column] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = rowCountHint.getOrElse(corpus.count())
    // Lloyd refinement re-reads the corpus per pass — pin it once
    // ([[pinSpread]]); the stride path reads it only thrice (cell seed,
    // book seed, codes pass), below the pin's break-even
    val base = if (coarseIters > 0) pinSpread(corpus) else corpus
    // centroids live as ONE driver array threaded through both
    // assignment passes — the per-pass centroid collect jobs are gone
    val centArr =
      if (coarseIters > 0)
        kmeansCentroidArrays(base, numCells, coarseIters, idCol, vecCol,
          Some(n), byDot = true)
      else centroidArraysK(base, numCells, idCol, vecCol, Some(n))
    val assigned0 = assignCellsArr(base, centArr, idCol, vecCol,
      nprobe = 1, byDot = true)
    // the predicate's columns are gone after assignment — narrow with a
    // semi-join on the qualifying ids (reads only (id, predicate cols))
    val assigned = corpusPred match {
      case Some(p) =>
        assigned0.join(corpus.filter(p).select(col(idCol)), Seq(idCol),
          "left_semi")
      case None => assigned0
    }
    val (dsub, books) = pqCodebooks(base, m, ksub, idCol, vecCol, Some(n))
    val codes = assigned.select(col(idCol).as("n_id"), col("cell"),
      pqCodesExpr(vecCol, dsub, books).as("codes"))
    // query side: no repartition (tiny by contract, broadcast right after)
    val q = broadcast(
      assignCellsArr(base.filter(queryPred), centArr, idCol, vecCol,
        nprobe = nprobe, byDot = true, spreadInput = false)
        .select(col(idCol).as("q_id"), col("cell"),
          pqQueryTabExpr(vecCol, books, ip = true).as("qtab")))
    adcScoreTopK(codes, q, k, ip = true)
  }

  /** [[ivfIpTopK]] with an exact-DOT rerank stage — two-stage MIPS:
    * the inner-product ADC shortlist keeps `shortlistFactor`·k
    * candidates per query; their full vectors decide the final top-k by
    * exact rounded dot. Buys back ADC quantization error exactly as the
    * cosine family's [[ivfpqTopKRerank]] does. Output: (q_id, n_id,
    * rank, sim_e6) with sim_e6 = the exact rounded inner product.
    */
  def ivfIpTopKRerank(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      shortlistFactor: Int = 4,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      nprobe: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      coarseIters: Int = 0): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    rerankExact(corpus,
      ivfIpTopK(corpus, queryPred, k * shortlistFactor, numCells, m, ksub,
        nprobe, idCol, vecCol, rowCountHint, coarseIters),
      k, idCol, vecCol, metric = "ip")
  }

  /** [[pqTopKIp]] with an exact-DOT rerank stage (flat MIPS two-stage
    * retrieval — no cell confinement). Output shape as
    * [[ivfIpTopKRerank]].
    */
  def pqTopKIpRerank(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      shortlistFactor: Int = 4,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    rerankExact(corpus,
      pqTopKIp(corpus, queryPred, k * shortlistFactor, m, ksub,
        idCol, vecCol, rowCountHint),
      k, idCol, vecCol, metric = "ip")
  }

  /** ADC top-k against explicit codebooks (shared by the stride-seeded,
    * k-means, and inner-product paths — `ip` flips the table metric and
    * the ranking direction, nothing else about the plan changes).
    */
  private def pqTopKWith(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      dsub: Int,
      books: Array[Array[(Int, Array[Float], Double)]],
      idCol: String,
      vecCol: String,
      ip: Boolean = false): DataFrame = {
    val codes = TextOps.spread(corpus)
      .select(col(idCol).as("n_id"), pqCodesExpr(vecCol, dsub, books).as("codes"))
    val qtab = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.PqQueryTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(vecCol),
        books.map(_.map(_._2)), ip = ip))
    val q = broadcast(corpus.filter(queryPred)
      .select(col(idCol).as("q_id"), qtab.as("qtab")))
    val adc = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.PqAdcDistance(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("qtab"),
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("codes")))
    val scored = codes
      .crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      // top-k keeps "larger is closer": a summed dot table already is;
      // a summed distance table negates in and flips back on output
      .withColumn("sim_e6", if (ip) adc else -adc)
    topKRows(scored, k)
      .select(col("q_id"), col("n_id"), col("rank"),
        (if (ip) col("sim_e6").as("asim_e6")
         else (-col("sim_e6")).as("adist_e6")))
  }

  // ---------- IVF-PQ with residual encoding ----------

  /** IVF-PQ top-k with RESIDUAL encoding — the billion-vector ANN
    * layout (IVF confines candidates to probed cells; PQ shrinks each
    * candidate to `m` codes; encoding the residual `v − centroid(cell)`
    * instead of `v` concentrates the PQ books on the within-cell
    * distribution, which is what makes m·ksub codes usable at scale):
    *
    *   1. coarse cells: stride-seeded centroids ([[centroidsK]]),
    *      assignment is the narrow literal-centroid projection of
    *      [[assignCells]] — no shuffle;
    *   2. residuals: one broadcast join to the (tiny) centroid set +
    *      one codegen'd [[graft.functions.VecSub]] per row;
    *   3. PQ books are trained on the residuals (same deterministic
    *      stride seeding as [[pqEncode]]) and baked into the plan;
    *      the corpus side carries only (id, cell, m codes);
    *   4. queries compute one ADC table per PROBED cell from their
    *      residual to THAT cell's centroid (asymmetric: queries stay
    *      full precision) and broadcast; scoring joins on `cell` — the
    *      only shuffle keys on cell, candidates never leave their
    *      cells, and ranking rides the bounded top-k aggregator.
    *
    * Output: (q_id, n_id, rank, adist_e6) — ranked by approximate
    * squared-L2 of residuals, ascending, id tie-break.
    */
  def ivfpqTopK(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      nprobe: Int = 1,
      /** Filtered search over the SHARED index: the coarse cells and PQ
        * books still train on the FULL corpus (the index is one build,
        * many filtered searches), but only rows satisfying the predicate
        * become candidates — "nearest neighbors among label=X" without
        * retraining per filter.
        */
      corpusPred: Option[Column] = None): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = rowCountHint.getOrElse(corpus.count())
    ivfpqWith(corpus,
      centroidArraysK(corpus, numCells, idCol, vecCol, Some(n)),
      queryPred, k, m, ksub, pqIters = 0, n, idCol, vecCol, nprobe,
      corpusPred)
  }

  /** [[ivfpqTopK]] with BOTH quantizers k-means-refined: Lloyd coarse
    * cells ([[kmeansCentroids]]) and per-subspace Lloyd PQ books over
    * the RESIDUALS — the production IVF-PQ training recipe (stride
    * seeding bounds the recall floor; Lloyd adapts cells and books to
    * the data's distribution). Same deterministic fixed-point training
    * arithmetic as the individually-oracled k-means paths, so the whole
    * composition stays oracle-checkable. Output shape identical to
    * [[ivfpqTopK]].
    *
    * Lifecycle caveat (same contract as the [[TextOps]] pair
    * generators): training runs EAGERLY at call time (the Lloyd passes
    * materialize a [[Scratch]]-pinned residual checkpoint backing the
    * returned frame), so consume the result before calling
    * `Scratch.drain()` — and DO call drain between pipelines, or each
    * call pins a corpus-sized block for the session's lifetime. A
    * drained result must not be re-executed.
    */
  def ivfpqTopKKmeans(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      coarseIters: Int = 2,
      pqIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      nprobe: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = rowCountHint.getOrElse(corpus.count())
    // coarse seed + `coarseIters` Lloyd passes + the residualize pass
    // all re-read the corpus — pin it once ([[pinSpread]]; the residuals
    // get their own pin below for the PQ Lloyd passes)
    val pinned = pinSpread(corpus)
    ivfpqWith(pinned,
      kmeansCentroidArrays(pinned, numCells, coarseIters, idCol, vecCol,
        Some(n)),
      queryPred, k, m, ksub, pqIters, n, idCol, vecCol, nprobe)
  }

  private def ivfpqWith(
      corpus: DataFrame,
      coarse: Array[(Long, Array[Float])],
      queryPred: Column,
      k: Int,
      m: Int,
      ksub: Int,
      /** 0 = stride-seeded PQ books over the residuals; >0 = that many
        * per-subspace Lloyd refinement passes.
        */
      pqIters: Int,
      n: Long,
      idCol: String,
      vecCol: String,
      nprobe: Int,
      corpusPred: Option[Column] = None): DataFrame = {
    // one local centroid-join frame per query, shared by both
    // residualize sites (corpus + queries) — zero collect jobs behind it
    val centLocal = broadcast(centArrToDf(corpus.sparkSession, coarse)
      .select(col("c_id").as("cell"), col("c_vec")))
    def residualize(df: DataFrame, probes: Int, spreadInput: Boolean): DataFrame =
      residualizeArr(df, coarse, centLocal, idCol, vecCol, probes, spreadInput)

    val resid0 = residualize(corpus, probes = 1, spreadInput = true)
    // the Lloyd PQ training rescans the residuals once per pass (seed
    // collect + one per iteration) and the ADC scan reads them again —
    // pin them once (same Scratch lifecycle as the pair-generators;
    // Bench/Verify drain between queries) instead of recomputing the
    // assignment+join per pass. The stride path reads them only twice;
    // not worth a corpus-sized block there (r17 measured the always-pin
    // variant: executor CPU halves but wall time is flat-to-worse — the
    // saved evaluation was parallel while the checkpoint job is serial
    // latency) — EXCEPT under a filtered
    // search, where the pin is what lets the candidate side reuse the
    // training residuals instead of re-residualizing (below).
    val resid =
      if (pqIters <= 0 && corpusPred.isEmpty) resid0
      else {
        val pinned = resid0.localCheckpoint(eager = true)
        Scratch.register(pinned)
        pinned
      }
    // PQ books trained on the residuals — stride-seeded by id (plus
    // optional per-subspace Lloyd), so the whole pipeline stays
    // deterministic and oracle-expressible
    val (dsub, books) =
      if (pqIters <= 0) pqCodebooks(resid, m, ksub, idCol, "__resid", Some(n))
      else pqCodebooksKmeans(resid, m, ksub, pqIters, idCol, "__resid", Some(n))
    // filtered search: training above used the FULL corpus; only the
    // candidate side narrows. The candidate residuals at probes=1 ARE
    // the (pinned) training residuals, so narrow them with a semi-join
    // against the predicate's id set instead of re-residualizing — the
    // second corpus pass reads only (id, predicate cols), never the
    // embedding column, and recomputes no cell assignment.
    val residCand = corpusPred match {
      case Some(p) =>
        resid.join(corpus.filter(p).select(col(idCol)), Seq(idCol), "left_semi")
      case None => resid
    }
    val codes = residCand
      .select(col(idCol).as("n_id"), col("cell"),
        pqCodesExpr("__resid", dsub, books).as("codes"))
    // query side: no repartition (tiny by contract, broadcast right after)
    val q = broadcast(
      residualize(corpus.filter(queryPred), probes = nprobe,
        spreadInput = false)
        .select(col(idCol).as("q_id"), col("cell"),
          pqQueryTabExpr("__resid", books).as("qtab")))
    adcScoreTopK(codes, q, k)
  }

  /** Residual computation shared by the inline IVF-PQ paths and the
    * persisted-index lifecycle ([[AnnIndex]]): assign each vector to its
    * `probes` nearest coarse cells, then subtract the cell centroid.
    * One narrow literal-centroid assignment pass + one broadcast join to
    * the (tiny) centroid set + one codegen'd [[graft.functions.VecSub]]
    * per row. Output: (idCol, cell, __resid).
    */
  private[ext] def residualizeWith(
      df: DataFrame,
      coarse: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Int): DataFrame = {
    val centLocal = broadcast(
      coarse.select(col("c_id").as("cell"), col("c_vec")))
    residualizeArr(df, collectCentroidArr(coarse), centLocal, idCol, vecCol,
      probes, spreadInput = true)
  }

  /** [[residualizeWith]] against localized centroids and a shared
    * centroid-join frame — assignment reads the array, never collects.
    */
  private[graft] def residualizeArr(
      df: DataFrame,
      centArr: Array[(Long, Array[Float])],
      centLocal: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Int,
      spreadInput: Boolean): DataFrame =
    assignCellsArr(df, centArr, idCol, vecCol, probes,
      spreadInput = spreadInput)
      .join(centLocal, "cell")
      .withColumn("__resid", org.apache.spark.sql.graft.GraftInternal.column(
        graft.functions.VecSub(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(vecCol),
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("c_vec"))))
      .select(col(idCol), col("cell"), col("__resid"))

  /** Per-query ADC lookup table over residuals (see [[pqTopK]]); `ip`
    * flips the per-subspace entries from squared-L2 to inner products
    * ([[pqTopKIp]] / [[ivfIpTopK]]).
    */
  private[ext] def pqQueryTabExpr(
      residCol: String, books: Array[Array[(Int, Array[Float], Double)]],
      ip: Boolean = false): Column =
    org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.PqQueryTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(residCol),
        books.map(_.map(_._2)), ip = ip))

  /** The ADC scoring + ranking stage shared by [[ivfpqTopK]] /
    * [[ivfIpTopK]] (inline) and [[AnnIndex.search]] (persisted, both
    * metrics): join the codes-only corpus side to the broadcast query
    * tables on `cell`, score each pair with m table lookups, and rank
    * through the bounded top-k aggregator. `codes` = (n_id, cell,
    * codes); `q` = (q_id, cell, qtab), already broadcast by the caller.
    *
    * Both metrics rank WITHOUT a per-(q, n) dedup aggregate: corpus
    * rows live in exactly ONE cell (nprobe = 1 on the codes side) and a
    * query emits at most one probe row per DISTINCT cell
    * ([[assignCellsArr]] slices a sorted array of distinct c_ids), so a
    * pair joins at most once at ANY query-side nprobe and the top-k
    * aggregation stays the plan's only exchange (ExplainAudit §R). The
    * residual family carried a defensive min-per-pair aggregate here
    * through r17 — a whole extra Exchange + two HashAggregates on every
    * IVF-PQ query for a dedup that is a no-op by construction (r18;
    * oracle hashes unchanged across knn_ivfpq_* and knn_index_*).
    */
  private[ext] def adcScoreTopK(
      codes: DataFrame, q: DataFrame, k: Int, ip: Boolean = false): DataFrame = {
    val adc = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.PqAdcDistance(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("qtab"),
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("codes")))
    val joined = codes
      .join(q, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
    val scored =
      if (ip) joined.withColumn("sim_e6", adc)
      else joined.withColumn("sim_e6", -adc)
    topKRows(scored, k)
      .select(col("q_id"), col("n_id"), col("rank"),
        (if (ip) col("sim_e6").as("asim_e6")
         else (-col("sim_e6")).as("adist_e6")))
  }

  // ---------- exact rerank over ANN shortlists ----------

  /** Exact-cosine rerank of an ANN shortlist — stage two of the
    * standard two-stage retrieval: the approximate stage (ADC) returns
    * k′ = factor·k candidates per query; their ids join back to the
    * full vectors and the FINAL ranking is exact cosine. Recall
    * recovers because ADC's quantization error only has to keep the
    * true neighbors inside the (cheap, generous) shortlist, not rank
    * them perfectly.
    *
    * Scale shape: the shortlist is O(q·k′) rows — broadcast it to the
    * corpus scan (one narrow pass picks up neighbor vectors, no corpus
    * shuffle); query vectors are a second broadcast semi-join. The
    * rerank itself touches only |shortlist| pairs.
    *
    * Output: (q_id, n_id, rank, sim_e6) — same shape and metric as
    * [[bruteTopK]], so recall is directly comparable.
    */
  def rerankExact(
      corpus: DataFrame,
      shortlist: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      /** Exact scorer for the final ranking: `cosine` (default) or `ip`
        * (rounded dot, descending — the MIPS rerank). One expression
        * swap; the plan shape is identical.
        */
      metric: String = "cosine"): DataFrame =
    rerankExactWith(corpus, corpus, shortlist, k, idCol, vecCol, metric)

  /** [[rerankExact]] with the query vectors drawn from their own frame —
    * the shape the persisted-index path needs, where queries are not
    * rows of the indexed corpus.
    */
  private[ext] def rerankExactWith(
      corpus: DataFrame,
      queryVecs: DataFrame,
      shortlist: DataFrame,
      k: Int,
      idCol: String,
      vecCol: String,
      metric: String = "cosine"): DataFrame = {
    val exact = metric match {
      case "cosine" => simE6(col("q_vec"), col("n_vec"))
      case "ip"     => dotE6(col("q_vec"), col("n_vec"))
      case other => throw new IllegalArgumentException(
        s"unknown rerank metric '$other' (cosine | ip)")
    }
    val pairs = broadcast(shortlist.select(col("q_id"), col("n_id")))
    val qv = broadcast(
      queryVecs.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
        .join(broadcast(pairs.select("q_id").distinct()), Seq("q_id")))
    val scored = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .join(pairs, Seq("n_id"))
      .join(qv, Seq("q_id"))
      .withColumn("sim_e6", exact)
      .select("q_id", "n_id", "sim_e6")
    topKRows(scored, k)
  }

  /** [[pqTopK]] with an exact rerank stage: ADC shortlist of
    * `shortlistFactor`·k per query, exact-cosine final top-k.
    */
  def pqTopKRerank(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      shortlistFactor: Int = 4,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    rerankExact(corpus,
      pqTopK(corpus, queryPred, k * shortlistFactor, m, ksub,
        idCol, vecCol, rowCountHint),
      k, idCol, vecCol)
  }

  /** [[ivfpqTopK]] with an exact rerank stage — the full production
    * retrieval pipeline: IVF confines, residual-PQ ADC shortlists,
    * exact cosine ranks the survivors.
    */
  def ivfpqTopKRerank(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      shortlistFactor: Int = 4,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      nprobe: Int = 1): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    rerankExact(corpus,
      ivfpqTopK(corpus, queryPred, k * shortlistFactor, numCells, m, ksub,
        idCol, vecCol, rowCountHint, nprobe),
      k, idCol, vecCol)
  }

  /** IVF top-k: each query probes its `nprobe` nearest cells. nprobe=1
    * trades recall for a |cell|/|corpus| reduction in comparisons;
    * higher values recover the boundary-vector misses (a query sitting
    * between two cells whose true neighbor landed on the other side)
    * at nprobe× the candidate volume — still confined to cells, never
    * all-pairs.
    */
  def ivfTopK(
      corpus: DataFrame,
      queryPred: Column,
      k: Int,
      numCentroids: Int = 32,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None,
      nprobe: Int = 1): DataFrame =
    ivfTopKWith(corpus,
      centroidsK(corpus, numCentroids, idCol, vecCol, rowCountHint),
      queryPred, k, idCol, vecCol, nprobe)
}
