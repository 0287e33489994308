package graft.ext

import java.nio.ByteBuffer
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}
import graft.merge.{Delete, InsertValues, MergeClausesExecutor, UpdateSet}

/** Persisted IVF-PQ index lifecycle: build ONCE, search MANY, maintain
  * INCREMENTALLY — the artifact shape that makes similarity search
  * viable at 100 TB. The inline [[Similarity.ivfpqTopK]] family trains
  * centroids + codebooks and re-encodes the whole corpus on EVERY call;
  * this module commits those artifacts instead:
  *
  *   - the CODES table — one graft-table row per corpus vector:
  *     `(n_id, cell, codes[m])`, partitioned by `cell`, so a search's
  *     probed cells prune to their own files before any bytes move;
  *   - the QUANTIZERS — coarse centroids and PQ codebooks, base64-packed
  *     into carried table properties (k·dim + m·ksub·dsub floats —
  *     kilobytes by construction, independent of corpus size; see
  *     [[Similarity.centroidsK]]);
  *   - the WATERMARK — the source-table version the codes reflect, the
  *     same exactly-once contract as [[MaterializedAgg]]: it rides the
  *     refresh's merge commit, so a crashed refresh can neither skip nor
  *     double-apply a change range.
  *
  * [[search]] plans against the STORED codes with the stored quantizers
  * as plan literals, sharing the residualization and ADC stages with the
  * inline path ([[Similarity.residualizeWith]] /
  * [[Similarity.adcScoreTopK]]) — so a search over a fresh index is
  * bit-identical to [[Similarity.ivfpqTopK]] on the same corpus (the
  * AnnIndexSpec invariant, and the `knn_index_search` oracle row).
  *
  * [[refresh]] encodes ONLY the rows the source change feed reports —
  * work scales with changed rows, never corpus size. The quantizers stay
  * FROZEN across refreshes (the standard ANN maintenance posture:
  * centroid drift degrades recall slowly; re-training re-encodes the
  * world, so it is an explicit [[build]], not a side effect of append).
  * Staleness is first-class: [[status]] reports indexed vs current
  * source version, and `search(requireFresh = true)` refuses a stale
  * index loudly instead of silently serving pre-append neighbors.
  */
object AnnIndex {

  private val P = graft.log.CommitLog.ReservedPrefix + "ann."
  /** Qualified source-table path the index was built from. */
  val SourcePathKey: String = P + "sourcePath"
  /** Source version the codes reflect (carried; rides refresh commits). */
  val SourceVersionKey: String = P + "sourceVersion"
  /** Base64 [k][dim] + k×(c_id:long, dim floats) coarse centroids. */
  val CentroidsKey: String = P + "centroids"
  /** Base64 [m][ksub][dsub] + m·ksub·dsub floats PQ codebooks. */
  val BooksKey: String = P + "books"
  /** `m=..,ksub=..,numCells=..,idCol=..,vecCol=..,metric=..` build
    * parameters (`metric` absent on pre-MIPS indexes → `l2`).
    */
  val ParamsKey: String = P + "params"
  /** e6-fixed mean squared ADC distortion of a bounded id-ordered
    * sample at BUILD time — the drift probe's baseline.
    */
  val DistortionKey: String = P + "buildDistortionE6"

  /** current/build distortion ratio above which [[status]] recommends a
    * rebuild: refreshes encode through FROZEN quantizers, so on a
    * shifting corpus the codes' reconstruction error creeps up and
    * recall degrades silently — 1.5× mean distortion is the documented
    * "retrain now" line (conservative; recall loss is gradual).
    */
  val DriftRebuildThreshold: Double = 1.5

  /** Absolute floor (e6-fixed MSE) below which drift is never flagged:
    * with a near-perfectly-quantizable build corpus the baseline rounds
    * to ~0 and ANY later noise would otherwise read as infinite
    * relative drift — 1e-4 mean squared error is recall-irrelevant at
    * unit-norm embedding scale.
    */
  val MinDriftDistortionE6: Long = 100L

  final case class Status(
      indexedVersion: Long,
      sourceVersion: Long,
      /** Build-time baseline ([[DistortionKey]]); None on pre-probe
        * indexes.
        */
      buildDistortionE6: Option[Long] = None,
      /** Same probe over the CURRENT source through the frozen
        * quantizers; None unless `status(probeDrift = true)`.
        */
      currentDistortionE6: Option[Long] = None) {
    def stale: Boolean = sourceVersion > indexedVersion
    /** current/build mean-distortion ratio (None without a probe). */
    def driftRatio: Option[Double] = for {
      b <- buildDistortionE6
      c <- currentDistortionE6
    } yield if (b > 0) c.toDouble / b
      else if (c == 0) 1.0 else Double.PositiveInfinity
    /** Quantizer drift passed [[DriftRebuildThreshold]] AND the current
      * distortion is materially nonzero ([[MinDriftDistortionE6]]) —
      * refreshes are still exact about membership, but ADC ranking
      * quality has drifted from the build-time baseline; prefer
      * [[build]].
      */
    def rebuildRecommended: Boolean =
      driftRatio.exists(_ > DriftRebuildThreshold) &&
        currentDistortionE6.exists(_ >= AnnIndex.MinDriftDistortionE6)
  }

  /** Train the quantizers on the corpus at `sourcePath` and commit the
    * index table at `indexPath`: codes as rows (partitioned by `cell`),
    * centroids/books/params/watermark as carried properties in the
    * creating commit. `coarseIters`/`pqIters` = 0 keeps the
    * deterministic stride seeding ([[Similarity.centroidsK]]); > 0 adds
    * Lloyd refinement ([[Similarity.kmeansCentroids]] /
    * [[Similarity.pqCodebooksKmeans]]).
    *
    * Scale shape: training is the same bounded-artifact recipe as the
    * inline path (centroids and books never exceed kilobytes); the
    * corpus-sized work is ONE narrow encode pass writing (n_id, cell,
    * m codes) — after which searches never touch the vectors again.
    */
  def build(
      spark: SparkSession,
      sourcePath: String,
      indexPath: String,
      numCells: Int = 32,
      m: Int = 16,
      ksub: Int = 16,
      coarseIters: Int = 0,
      pqIters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      /** `l2` (default) = residual IVF-PQ, cosine-assigned cells, ADC
        * squared-L2 ascending — the cosine/L2 retrieval family. `ip` =
        * the MIPS posture ([[Similarity.ivfIpTopK]]'s exact quantizer
        * choices): cells assigned by raw DOT, PQ books trained on the
        * RAW vectors (no residual stage — dot doesn't linearize over
        * the residual decomposition the way squared-L2 does), search
        * ranks inner-product ADC tables DESCENDING. Amortizes the
        * training the inline MIPS entry points pay per call.
        */
      metric: String = "l2"): Long = {
    require(metric == "l2" || metric == "ip",
      s"unknown index metric '$metric' (l2 | ip)")
    graft.functions.GraftFunctions.register(spark)
    val src = GraftTable(spark, sourcePath)
    val srcV = src.version()
    val corpus = src.toDf(versionAsOf = Some(srcV))
    val n = corpus.count()
    val ip = metric == "ip"
    // centroids live as ONE driver array (the batch-1 r17 pattern):
    // training hands the array straight to assignment/residualization —
    // no per-stage centroid-DataFrame collect jobs
    val centRows =
      if (coarseIters > 0)
        Similarity.kmeansCentroidArrays(corpus, numCells, coarseIters,
          idCol, vecCol, Some(n), byDot = ip)
      else Similarity.centroidArraysK(corpus, numCells, idCol, vecCol, Some(n))
    require(centRows.nonEmpty, "ANN index build needs a non-empty corpus")
    val (books, codes) =
      if (ip) {
        // raw-vector books + dot-assigned cells; no residual stage, so
        // no corpus-sized pin is ever needed (Lloyd passes rescan the
        // source table, not a derived pipeline)
        val (dsub, books) =
          if (pqIters > 0)
            Similarity.pqCodebooksKmeans(corpus, m, ksub, pqIters, idCol, vecCol, Some(n))
          else Similarity.pqCodebooks(corpus, m, ksub, idCol, vecCol, Some(n))
        val assigned = Similarity.assignCellsArr(
          corpus, centRows, idCol, vecCol, nprobe = 1, byDot = true)
        (books, assigned.select(
          col(idCol).cast("long").as("n_id"), col("cell"),
          Similarity.pqCodesExpr(vecCol, dsub, books).as("codes")))
      } else {
        val resid0 = residualizeArr(spark, corpus, centRows, idCol, vecCol,
          probes = 1)
        // Lloyd PQ training rescans the residuals per pass and the encode
        // pass reads them again — pin once (same Scratch lifecycle as the
        // inline path); the stride path reads them only twice
        val resid =
          if (pqIters <= 0) resid0
          else {
            val pinned = resid0.localCheckpoint(eager = true)
            Scratch.register(pinned)
            pinned
          }
        val (dsub, books) =
          if (pqIters > 0)
            Similarity.pqCodebooksKmeans(resid, m, ksub, pqIters, idCol, "__resid", Some(n))
          else Similarity.pqCodebooks(resid, m, ksub, idCol, "__resid", Some(n))
        (books, resid.select(
          col(idCol).cast("long").as("n_id"), col("cell"),
          Similarity.pqCodesExpr("__resid", dsub, books).as("codes")))
      }
    // drift baseline: the same bounded probe status() re-runs later —
    // hash-ordered sample, frozen quantizers, driver-side inner loop
    val buildDist = frozenDistortionE6(
      corpus, centRows, books.map(_.map(_._2)), idCol, vecCol,
      residual = !ip)
    GraftWriter.write(spark, codes, indexPath,
      WriteOptions(
        mode = WriteMode.ErrorIfExists,
        partitionBy = Seq("cell"),
        metadata = Map(
          SourcePathKey -> qualify(spark, sourcePath),
          SourceVersionKey -> srcV.toString,
          CentroidsKey -> packCentroids(centRows),
          BooksKey -> packBooks(books.map(_.map(_._2))),
          DistortionKey -> buildDist.toString,
          ParamsKey -> (s"m=$m,ksub=$ksub,numCells=$numCells," +
            s"idCol=$idCol,vecCol=$vecCol,metric=$metric"),
          // the codes table is engine-managed: every refresh merge adds a
          // small file per touched cell, so bounded maintenance is the
          // right DEFAULT here (compaction never changes search results
          // — spec'd) rather than an opt-in the user must remember
          GraftWriter.AutoCompactKey -> "true")))
  }

  /** Top-k ADC search against the persisted index: quantizers load from
    * table properties into plan literals, the query side residualizes
    * through them ([[Similarity.residualizeWith]] — narrow), and scoring
    * joins the broadcast query tables to the STORED codes on `cell`
    * through the shared [[Similarity.adcScoreTopK]] stage. The probed
    * cells additionally push a partition filter into the codes scan —
    * with C cells and nprobe probes, a search reads ~nprobe/C of the
    * index's files, which is the point of partitioning codes by cell.
    *
    * `queries` must be SMALL ENOUGH TO BROADCAST (a probe set; the
    * [[Similarity.ivfTopKWith]] query-side size contract) — the scoring
    * stage pins the broadcast to the query side by design, so a
    * corpus-sized `queries` frame fails on broadcast memory rather than
    * silently shuffling the stored codes by cell.
    * `queries` needs the index's (idCol, vecCol) columns; `corpusPred`
    * narrows the candidate side over the index's payload columns
    * (`n_id`/`cell`) — the quantizers are shared, nothing retrains.
    * Output on `l2` indexes: (q_id, n_id, rank, adist_e6) —
    * bit-identical to [[Similarity.ivfpqTopK]] on the corpus the index
    * was built from. On `ip` indexes: (q_id, n_id, rank, asim_e6),
    * ranked DESCENDING — bit-identical to [[Similarity.ivfIpTopK]].
    */
  def search(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 1,
      corpusPred: Option[Column] = None,
      /** Refuse to serve from an index whose source has newer commits. */
      requireFresh: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = GraftTable(spark, indexPath)
    val props = idx.log.tableProperties()
    val p = params(props)
    val centRows = unpackCentroids(prop(props, CentroidsKey))
    val books = withSelfDots(unpackBooks(prop(props, BooksKey)))
    if (requireFresh) {
      val st = status(spark, indexPath)
      if (st.stale) {
        // about to refuse anyway — spend the bounded drift probe so the
        // remedy can say WHICH kind of refresh is due (the happy path
        // pays nothing)
        val drifted = try status(spark, indexPath, probeDrift = true)
          .rebuildRecommended
        catch { case _: Exception => false }
        throw new IllegalArgumentException(
          s"ANN index $indexPath is STALE: codes reflect source version " +
            s"${st.indexedVersion} but the source is at ${st.sourceVersion} — " +
            "run AnnIndex.refresh (or rebuild) before searching with " +
            "requireFresh = true" + (if (drifted)
              "; NOTE: quantizer drift exceeds the rebuild threshold " +
                s"(status().rebuildRecommended) — prefer AnnIndex.build: " +
                "refresh keeps the FROZEN quantizers and recall will keep " +
                "degrading" else ""))
      }
    }
    // metric picks the query-side preparation (residualize vs dot-assign
    // + IP tables) and the scoring stage's ranking direction; the codes
    // scan, partition pruning, and broadcast shape are identical. The
    // query side is tiny by contract and broadcast right after — no
    // centroid collect job, no parallelizing exchange (r17).
    val q = broadcast(
      if (p.ip)
        Similarity.assignCellsArr(queries, centRows, p.idCol, p.vecCol,
          nprobe = nprobe, byDot = true, spreadInput = false)
          .select(col(p.idCol).cast("long").as("q_id"), col("cell"),
            Similarity.pqQueryTabExpr(p.vecCol, books, ip = true).as("qtab"))
      else
        residualizeArr(spark, queries, centRows, p.idCol, p.vecCol, nprobe,
          spreadInput = false)
          .select(col(p.idCol).cast("long").as("q_id"), col("cell"),
            Similarity.pqQueryTabExpr("__resid", books).as("qtab")))
    // the query side is small by contract (it broadcasts); collecting its
    // probed cells costs one tiny job and buys partition pruning on the
    // codes scan — only the probed cells' files are read
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val codes0 = idx.toDf()
      .filter(col("cell").isin(probed.map(Long.box): _*))
      .select(col("n_id"), col("cell"), col("codes"))
    val codes = corpusPred.fold(codes0)(codes0.filter)
    Similarity.adcScoreTopK(codes, q, k, ip = p.ip)
  }

  /** Two-stage retrieval against the persisted index: [[search]]'s ADC
    * stage shortlists `shortlistFactor`·k candidates per query from the
    * STORED codes, then an exact-cosine rerank reads the survivors'
    * full vectors from the SOURCE table — pinned at the version the
    * codes reflect, so even a deliberately stale search stays
    * self-consistent (codes and vectors from the same snapshot). The
    * exact stage touches only the O(q·k′) shortlist: vectors arrive via
    * broadcast joins into one narrow source pass, never a corpus
    * shuffle. Output: (q_id, n_id, rank, sim_e6) — bit-identical to
    * [[Similarity.ivfpqTopKRerank]] on the corpus the index was built
    * from.
    */
  def searchRerank(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int,
      shortlistFactor: Int = 4,
      nprobe: Int = 1,
      corpusPred: Option[Column] = None,
      requireFresh: Boolean = false): DataFrame = {
    require(shortlistFactor >= 1, "shortlistFactor must be >= 1")
    val shortlist = search(spark, indexPath, queries, k * shortlistFactor,
      nprobe, corpusPred, requireFresh)
    val props = GraftTable(spark, indexPath).log.tableProperties()
    val p = params(props)
    val indexedV = prop(props, SourceVersionKey).toLong
    val corpus = GraftTable(spark, prop(props, SourcePathKey))
      .toDf(versionAsOf = Some(indexedV))
    Similarity.rerankExactWith(
      corpus, queries, shortlist, k, p.idCol, p.vecCol,
      metric = if (p.ip) "ip" else "cosine")
  }

  /** Encode an arbitrary frame through the index's FROZEN quantizers —
    * the row-level primitive [[refresh]] applies to changed rows, and
    * the recompute oracle AnnIndexSpec checks refresh against.
    * Output: (n_id, cell, codes).
    */
  def encodeWith(
      spark: SparkSession,
      indexPath: String,
      df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val props = GraftTable(spark, indexPath).log.tableProperties()
    val p = params(props)
    val centRows = unpackCentroids(prop(props, CentroidsKey))
    val books = withSelfDots(unpackBooks(prop(props, BooksKey)))
    val dsub = books.head.head._2.length
    if (p.ip)
      Similarity.assignCellsArr(df, centRows, p.idCol, p.vecCol,
        nprobe = 1, byDot = true)
        .select(col(p.idCol).cast("long").as("n_id"), col("cell"),
          Similarity.pqCodesExpr(p.vecCol, dsub, books).as("codes"))
    else
      residualizeArr(spark, df, centRows, p.idCol, p.vecCol, probes = 1)
        .select(col(p.idCol).cast("long").as("n_id"), col("cell"),
          Similarity.pqCodesExpr("__resid", dsub, books).as("codes"))
  }

  /** Incrementally fold the source's change feed into the codes table:
    * per changed id, the NET effect over the unapplied range (last
    * change wins) is either a delete or an upsert of the re-encoded
    * row. One merge commit; the watermark rides it (exactly-once, the
    * [[MaterializedAgg]] pattern). Work is O(changed rows): the change
    * scan, one narrow encode pass over the survivors, and a key-equi
    * merge into the codes table — the source is never rescanned.
    * Returns the newly applied source version, or None when current.
    */
  def refresh(spark: SparkSession, indexPath: String): Option[Long] = {
    graft.functions.GraftFunctions.register(spark)
    val idx = GraftTable(spark, indexPath)
    val props = idx.log.tableProperties()
    val sourcePath = prop(props, SourcePathKey)
    val lastV = prop(props, SourceVersionKey).toLong
    val p = params(props)
    val idColName = p.idCol; val vecColName = p.vecCol
    val src = GraftTable(spark, sourcePath)
    val curV = src.version()
    if (curV <= lastV) return None

    val changes =
      try src.tableChanges(lastV, curV) // EXCLUSIVE from
      catch {
        case e: IllegalStateException
            if e.getMessage != null && e.getMessage.contains("log retention") =>
          throw new IllegalStateException(
            s"cannot incrementally refresh the ANN index $indexPath: the " +
              s"source log at $sourcePath no longer covers versions " +
              s"($lastV, $curV] (log retention pruned part of the range). " +
              "Remedy: REBUILD the index with AnnIndex.build — refresh " +
              "cannot recover a pruned change range.", e)
      }
    // net effect per id across the range: keep the latest change by
    // commit version. Removal-shaped rows (delete AND update_preimage)
    // rank BELOW any same-version insert/postimage of the same id: a
    // normal UPDATE's postimage outranks its preimage twin, but an
    // UPDATE that changes the ID COLUMN leaves the old id with only a
    // preimage as its latest change — which must purge the old id's
    // codes (dropping preimages outright left phantom neighbors behind)
    val priority = when(col(graft.io.Cdc.ChangeCol)
      .isin("delete", "update_preimage"), 0L).otherwise(1L)
    val latest = changes
      .withColumn("__pri", priority)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idColName))
          .orderBy(col(graft.io.Cdc.VersionCol).desc, col("__pri").desc)))
      .filter(col("__rn") === 1)
    val survivors = latest.filter(col("__pri") === 1L)
      .select(col(idColName), col(vecColName))
    val deletes = latest.filter(col("__pri") === 0L)
      .select(col(idColName).cast("long").as("n_id"),
        lit(null).cast("long").as("cell"),
        lit(null).cast("array<int>").as("codes"),
        lit("D").as("__op"))
    val upserts = encodeWith(spark, indexPath, survivors)
      .withColumn("__op", lit("U"))
    MergeClausesExecutor.merge(spark, upserts.unionByName(deletes), indexPath,
      "s.n_id = t.n_id",
      matched = Seq(
        Delete(Some(col("s.__op") === "D")),
        UpdateSet(Map(
          "cell" -> col("s.cell"),
          "codes" -> col("s.codes")))),
      notMatched = Seq(InsertValues(
        Map("n_id" -> col("s.n_id"), "cell" -> col("s.cell"),
          "codes" -> col("s.codes")),
        Some(col("s.__op") =!= "D"))),
      extraMetadata = Map(SourceVersionKey -> curV.toString))
    Some(curV)
  }

  /** Continuous index maintenance: a change-feed stream on the SOURCE
    * whose every micro-batch triggers one [[refresh]]. The stream is
    * the TRIGGER, not the data path — refresh reads `tableChanges`
    * against the index's own committed watermark, so a replayed
    * micro-batch applies nothing (exactly-once without coupling to
    * Spark's batch ids; the [[MaterializedAgg.maintainStream]]
    * pattern). Searches against the index stay fresh to within one
    * trigger interval. Call `processAllAvailable()` /
    * `awaitTermination()` on the returned query.
    */
  def maintainStream(
      spark: SparkSession,
      indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sourcePath = prop(
      GraftTable(spark, indexPath).log.tableProperties(), SourcePathKey)
    graft.streaming.Streams.readChangeFeed(spark, sourcePath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, indexPath)
        ()
      }
      .start()
  }

  /** Indexed vs current source version — the staleness probe `search`'s
    * `requireFresh` gate consults. With `probeDrift = true`, also
    * re-runs the build-time distortion probe over a bounded id-ordered
    * sample of the CURRENT source through the FROZEN quantizers:
    * `rebuildRecommended` flips when mean distortion exceeds the
    * build-time figure by [[DriftRebuildThreshold]] — the signal that
    * incremental [[refresh]] (which never retrains) has quietly
    * outlived its quantizers and an explicit [[build]] is due. The
    * probe costs one `limit(probeSample)` scan of the source —
    * metadata-cheap, never corpus-sized.
    */
  def status(
      spark: SparkSession,
      indexPath: String,
      probeDrift: Boolean = false,
      probeSample: Int = 10000): Status = {
    val props = GraftTable(spark, indexPath).log.tableProperties()
    val sourcePath = prop(props, SourcePathKey)
    val buildDist = props.get(DistortionKey).map(_.toLong)
    val curDist =
      if (!probeDrift) None
      else buildDist.map { _ =>
        val p = params(props)
        frozenDistortionE6(
          GraftTable(spark, sourcePath).toDf(),
          unpackCentroids(prop(props, CentroidsKey)),
          unpackBooks(prop(props, BooksKey)),
          p.idCol, p.vecCol, residual = !p.ip, probeSample)
      }
    Status(
      indexedVersion = prop(props, SourceVersionKey).toLong,
      sourceVersion = GraftTable(spark, sourcePath).version(),
      buildDistortionE6 = buildDist,
      currentDistortionE6 = curDist)
  }

  /** Mean squared reconstruction distortion (e6 fixed point) of a
    * bounded deterministic sample through FROZEN quantizers: residualize
    * against the given coarse centroids (`residual = true`, the L2
    * family) or measure the RAW vectors (`residual = false`, the IP
    * family — its books train on raw vectors, and by Cauchy–Schwarz the
    * per-subspace IP-table error |⟨q_sub, v_sub − v̂_sub⟩| is bounded by
    * ‖q_sub‖·‖v_sub − v̂_sub‖, so rising raw reconstruction MSE IS
    * rising inner-product ranking error), then per subspace take the
    * nearest codeword's squared error (the driver-side inner loop of
    * [[Similarity.pqDistortion]], against supplied books instead of
    * freshly trained ones). The bounded `limit` keeps the probe
    * O(maxSample) rows on any corpus size.
    */
  private def frozenDistortionE6(
      corpus: DataFrame,
      centRows: Array[(Long, Array[Float])],
      books: Array[Array[Array[Float]]],
      idCol: String,
      vecCol: String,
      residual: Boolean,
      maxSample: Int = 10000): Long = {
    val spark = corpus.sparkSession
    val dsub = books.head.head.length
    // HASH-ordered sample (deterministic, id tie-break): an id-ordered
    // prefix would re-measure only the oldest rows forever — on an
    // append-mostly corpus the probe would never see the drifted data
    // it exists to detect. xxhash64 is stable across sessions, so the
    // build-time and status-time probes of identical data agree exactly.
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(maxSample)
    val vecs =
      if (residual)
        Similarity.residualizeWith(
          sample, centsDf(spark, centRows), idCol, vecCol, probes = 1)
          .select(col("__resid")).collect()
          .map(_.getSeq[Float](0).toArray)
      else
        sample.select(col(vecCol)).collect()
          .map(_.getSeq[Float](0).toArray)
    var total = 0.0
    vecs.foreach { v =>
      var j = 0
      while (j < books.length) {
        val off = j * dsub
        var best = Double.MaxValue
        books(j).foreach { c =>
          var d = 0.0; var i = 0
          while (i < dsub) {
            val t = v(off + i).toDouble - c(i).toDouble; d += t * t; i += 1
          }
          if (d < best) best = d
        }
        total += best
        j += 1
      }
    }
    math.round(total / math.max(1, vecs.length) * 1e6)
  }

  // ---------- artifact packing ----------

  private def prop(props: Map[String, String], key: String): String =
    props.getOrElse(key,
      throw new IllegalStateException(
        s"not an ANN index table (missing $key) — build with AnnIndex.build"))

  private[graft] final case class Params(
      m: Int, ksub: Int, idCol: String, vecCol: String, metric: String) {
    def ip: Boolean = metric == "ip"
  }

  private[graft] def params(props: Map[String, String]): Params = {
    val kv = prop(props, ParamsKey).split(',')
      .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    // pre-MIPS indexes carry no metric — they are all residual-L2
    Params(kv("m").toInt, kv("ksub").toInt, kv("idCol"), kv("vecCol"),
      kv.getOrElse("metric", "l2"))
  }

  private def centsDf(
      spark: SparkSession, rows: Array[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("c_id", "c_vec")
  }

  /** [[Similarity.residualizeArr]] against a centroid array already in
    * hand (stored quantizers / fresh training) — assignment reads the
    * array, the subtract joins one local centroid frame; no collect.
    */
  private def residualizeArr(
      spark: SparkSession,
      df: DataFrame,
      centRows: Array[(Long, Array[Float])],
      idCol: String,
      vecCol: String,
      probes: Int,
      spreadInput: Boolean = true): DataFrame = {
    val centLocal = broadcast(
      centsDf(spark, centRows).select(col("c_id").as("cell"), col("c_vec")))
    Similarity.residualizeArr(df, centRows, centLocal, idCol, vecCol,
      probes, spreadInput)
  }

  private def withSelfDots(
      books: Array[Array[Array[Float]]]): Array[Array[(Int, Array[Float], Double)]] =
    books.map(_.zipWithIndex.map { case (sub, idx) =>
      (idx, sub, Similarity.foldSelfDot(sub))
    })

  private[ext] def packCentroids(rows: Array[(Long, Array[Float])]): String = {
    val dim = rows.head._2.length
    val buf = ByteBuffer.allocate(8 + rows.length * (8 + 4 * dim))
    buf.putInt(rows.length).putInt(dim)
    rows.foreach { case (id, v) =>
      buf.putLong(id); v.foreach(buf.putFloat)
    }
    Base64.getEncoder.encodeToString(buf.array())
  }

  private[ext] def unpackCentroids(s: String): Array[(Long, Array[Float])] = {
    val buf = ByteBuffer.wrap(Base64.getDecoder.decode(s))
    val k = buf.getInt; val dim = buf.getInt
    Array.fill(k) {
      val id = buf.getLong
      (id, Array.fill(dim)(buf.getFloat))
    }
  }

  private[ext] def packBooks(books: Array[Array[Array[Float]]]): String = {
    val m = books.length; val ksub = books.head.length
    val dsub = books.head.head.length
    val buf = ByteBuffer.allocate(12 + m * ksub * dsub * 4)
    buf.putInt(m).putInt(ksub).putInt(dsub)
    books.foreach(_.foreach(_.foreach(buf.putFloat)))
    Base64.getEncoder.encodeToString(buf.array())
  }

  private[ext] def unpackBooks(s: String): Array[Array[Array[Float]]] = {
    val buf = ByteBuffer.wrap(Base64.getDecoder.decode(s))
    val m = buf.getInt; val ksub = buf.getInt; val dsub = buf.getInt
    Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(buf.getFloat)))
  }

  private def qualify(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p).toString
  }
}
