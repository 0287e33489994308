package graft

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}
import graft.io._
import graft.merge.Dml

/** Persisted ANN index lifecycle: build once / search many /
  * CDF-incremental refresh. The core invariants:
  *   - a search over a fresh index is BIT-identical to the inline
  *     [[Similarity.ivfpqTopK]] on the same corpus (shared residualize +
  *     ADC stages, quantizers round-tripped through table properties);
  *   - refresh applies only the change feed, and afterwards the codes
  *     table equals re-encoding the full current corpus through the
  *     FROZEN quantizers;
  *   - staleness is first-class: detectable via status, refusable via
  *     requireFresh.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  private def vec(i: Long): Array[Float] =
    Array.tabulate(Dim)(d => (((i * 31 + d * 7) % 13) - 6).toFloat / 3f)

  private def embDf(rows: Seq[(Long, Array[Float], Long)]) =
    rows.toDF("vec_id", "embedding", "label")
      // parquet round-trip reads arrays as containsNull = true; match it
      .withColumn("embedding", col("embedding").cast("array<float>"))

  private def mkCorpus(path: String, ids: Seq[Long]): Unit =
    GraftWriter.write(spark, embDf(ids.map(i => (i, vec(i), i % 3))),
      path, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))

  private def codesOf(indexPath: String): Set[(Long, Long, Seq[Int])] =
    GraftTable(spark, indexPath).toDf()
      .select("n_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet

  private def frozenRecompute(indexPath: String, corpusPath: String): Set[(Long, Long, Seq[Int])] =
    AnnIndex.encodeWith(spark, indexPath, GraftTable(spark, corpusPath).toDf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Long)] =
    df.select("q_id", "n_id", "rank", "adist_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("fresh-index search is bit-identical to the inline IVF-PQ path") {
    val src = tmpDir("ann_src"); val idx = tmpDir("ann_idx") + "/ix"
    mkCorpus(src, 0L until 120L)
    AnnIndex.build(spark, src, idx, numCells = 6, m = 4, ksub = 8)
    val corpus = GraftTable(spark, src).toDf()
    val inline = Similarity.ivfpqTopK(corpus, col("vec_id") < 8, k = 4,
      numCells = 6, m = 4, ksub = 8, rowCountHint = Some(120L))
    val stored = AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4)
    assert(ranked(stored) == ranked(inline))
    assert(ranked(stored).nonEmpty)
    // multi-probe parity too (query-side nprobe only — same stored codes)
    val inlineP = Similarity.ivfpqTopK(corpus, col("vec_id") < 8, k = 4,
      numCells = 6, m = 4, ksub = 8, rowCountHint = Some(120L), nprobe = 2)
    val storedP = AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4, nprobe = 2)
    assert(ranked(storedP) == ranked(inlineP))
  }

  test("persisted-index rerank is bit-identical to the inline two-stage path") {
    val src = tmpDir("ann_rr_src"); val idx = tmpDir("ann_rr_idx") + "/ix"
    mkCorpus(src, 0L until 120L)
    AnnIndex.build(spark, src, idx, numCells = 6, m = 4, ksub = 8)
    val corpus = GraftTable(spark, src).toDf()
    val inline = Similarity.ivfpqTopKRerank(corpus, col("vec_id") < 8, k = 4,
      shortlistFactor = 3, numCells = 6, m = 4, ksub = 8,
      rowCountHint = Some(120L))
      .select("q_id", "n_id", "rank", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val stored = AnnIndex.searchRerank(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4, shortlistFactor = 3)
      .select("q_id", "n_id", "rank", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(stored == inline)
    // a stale index reranks against the SOURCE VERSION its codes
    // reflect: appending rows changes nothing until a refresh
    val before = AnnIndex.searchRerank(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4, shortlistFactor = 3)
      .collect().map(_.toSeq).toSet
    GraftWriter.write(spark, embDf(Seq((500L, vec(500L), 0L))), src,
      WriteOptions(mode = WriteMode.Append))
    val afterStale = AnnIndex.searchRerank(spark, idx,
      GraftTable(spark, src).toDf().filter(col("vec_id") < 8), k = 4,
      shortlistFactor = 3)
      .collect().map(_.toSeq).toSet
    assert(afterStale == before,
      "stale rerank must stay self-consistent with the indexed snapshot")
    intercept[Exception] {
      AnnIndex.searchRerank(spark, idx,
        GraftTable(spark, src).toDf().filter(col("vec_id") < 8), k = 4,
        requireFresh = true)
    }
  }

  test("filtered search narrows candidates without retraining") {
    val src = tmpDir("ann_fsrc"); val idx = tmpDir("ann_fidx") + "/ix"
    mkCorpus(src, 0L until 90L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    val corpus = GraftTable(spark, src).toDf()
    val res = AnnIndex.search(spark, idx, corpus.filter(col("vec_id") < 5),
      k = 3, corpusPred = Some(col("n_id") % 3 === 0))
    assert(ranked(res).nonEmpty)
    assert(ranked(res).forall(_._2 % 3 == 0))
  }

  test("refresh folds append/update/delete; codes equal a frozen-quantizer recompute") {
    val src = tmpDir("ann_rsrc"); val idx = tmpDir("ann_ridx") + "/ix"
    mkCorpus(src, 0L until 80L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    assert(AnnIndex.refresh(spark, idx).isEmpty) // already current
    assert(codesOf(idx) == frozenRecompute(idx, src))

    // append new vectors, re-point one embedding, delete a few rows
    GraftWriter.write(spark,
      embDf((200L until 210L).map(i => (i, vec(i + 3), i % 3))),
      src, WriteOptions(mode = WriteMode.Append))
    Dml.update(spark, src, col("vec_id") === 7L,
      Map("embedding" -> typedLit(vec(999L))))
    Dml.delete(spark, src, col("vec_id").isin(3L, 5L, 203L))
    val applied = AnnIndex.refresh(spark, idx)
    assert(applied.contains(GraftTable(spark, src).version()))

    val after = codesOf(idx)
    assert(after == frozenRecompute(idx, src))
    assert(!after.exists(_._1 == 3L) && !after.exists(_._1 == 203L))
    assert(after.exists(_._1 == 207L))
    // the updated vector re-encoded: its codes differ from the original
    val before = AnnIndex.encodeWith(spark, idx,
      Seq((7L, vec(7L), 1L)).toDF("vec_id", "embedding", "label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).head
    val cur = after.find(_._1 == 7L).get
    assert((cur._2, cur._3) != ((before._2, before._3)))
    // idempotent: nothing left to apply
    assert(AnnIndex.refresh(spark, idx).isEmpty)
    // searches after refresh serve the maintained codes (fresh gate on)
    val q = GraftTable(spark, src).toDf().filter(col("vec_id") < 4)
    assert(ranked(AnnIndex.search(spark, idx, q, k = 3,
      requireFresh = true)).nonEmpty)

    // an UPDATE that changes the ID COLUMN leaves the old id with only
    // an update_preimage in the range — refresh must purge its codes
    // (a dropped preimage would leave a phantom neighbor forever)
    Dml.update(spark, src, col("vec_id") === 9L,
      Map("vec_id" -> lit(900L)))
    assert(AnnIndex.refresh(spark, idx)
      .contains(GraftTable(spark, src).version()))
    val moved = codesOf(idx)
    assert(!moved.exists(_._1 == 9L), "old id's codes must be purged")
    assert(moved.exists(_._1 == 900L))
    assert(moved == frozenRecompute(idx, src))
  }

  test("streaming maintenance keeps the index fresh, exactly-once") {
    val src = tmpDir("ann_stream_src"); val idx = tmpDir("ann_stream_idx") + "/ix"
    val ckpt = tmpDir("ann_stream_ckpt")
    mkCorpus(src, 0L until 60L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    val q = AnnIndex.maintainStream(spark, idx, ckpt)
    try {
      GraftWriter.write(spark, embDf(Seq((400L, vec(400L), 0L))), src,
        WriteOptions(mode = WriteMode.Append))
      Dml.delete(spark, src, col("vec_id") === 2L)
      q.processAllAvailable()
      assert(!AnnIndex.status(spark, idx).stale)
      val codes = codesOf(idx)
      assert(codes.exists(_._1 == 400L) && !codes.exists(_._1 == 2L))
      assert(codes == frozenRecompute(idx, src))
    } finally q.stop()
  }

  test("staleness is detectable and requireFresh refuses a stale index") {
    val src = tmpDir("ann_ssrc"); val idx = tmpDir("ann_sidx") + "/ix"
    mkCorpus(src, 0L until 60L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    assert(!AnnIndex.status(spark, idx).stale)
    GraftWriter.write(spark, embDf(Seq((300L, vec(300L), 0L))), src,
      WriteOptions(mode = WriteMode.Append))
    val st = AnnIndex.status(spark, idx)
    assert(st.stale && st.sourceVersion > st.indexedVersion)
    val q = GraftTable(spark, src).toDf().filter(col("vec_id") < 4)
    // default: stale index still serves (documented; status is the probe)
    assert(ranked(AnnIndex.search(spark, idx, q, k = 3)).nonEmpty)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, idx, q, k = 3, requireFresh = true)
    }
    assert(e.getMessage.contains("STALE"))
    AnnIndex.refresh(spark, idx)
    assert(!AnnIndex.status(spark, idx).stale)
    assert(ranked(AnnIndex.search(spark, idx, q, k = 3,
      requireFresh = true)).nonEmpty)
  }

  test("compacting the codes table never changes search results") {
    val src = tmpDir("ann_opt_src"); val idx = tmpDir("ann_opt_idx") + "/ix"
    mkCorpus(src, 0L until 80L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    // several refreshes fragment the codes table with small merge files
    (0 until 3).foreach { r =>
      GraftWriter.write(spark,
        embDf(Seq((500L + r, vec(500L + r), 0L))), src,
        WriteOptions(mode = WriteMode.Append))
      AnnIndex.refresh(spark, idx)
    }
    val q = GraftTable(spark, src).toDf().filter(col("vec_id") < 6)
    val before = ranked(AnnIndex.search(spark, idx, q, k = 4,
      requireFresh = true))
    // the index is an ordinary graft table: routine OPTIMIZE compacts it
    // (cell partitioning and properties survive), searches bit-match
    GraftWriter.optimize(spark, idx)
    assert(codesOf(idx) == frozenRecompute(idx, src))
    assert(ranked(AnnIndex.search(spark, idx, q, k = 4,
      requireFresh = true)) == before)
  }

  test("SQL DDL drives the index lifecycle: CREATE / REFRESH / DROP VECTOR INDEX") {
    val src = tmpDir("ann_sql_src"); val idx = tmpDir("ann_sql_idx") + "/ix"
    mkCorpus(src, 0L until 120L)
    val created = spark.sql(
      s"CREATE VECTOR INDEX graft.`$idx` ON graft.`$src` (embedding) " +
        "ID vec_id OPTIONS ('numCells' = '6', 'm' = '4', 'ksub' = '8')")
      .head().getLong(0)
    assert(created == GraftTable(spark, src).version())
    // SQL-created index searches bit-identically to the Scala build
    val corpus = GraftTable(spark, src).toDf()
    val inline = Similarity.ivfpqTopK(corpus, col("vec_id") < 8, k = 4,
      numCells = 6, m = 4, ksub = 8, rowCountHint = Some(120L))
    assert(ranked(AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4)) == ranked(inline))
    // already current -> NULL; after a source append -> the new version
    assert(spark.sql(s"REFRESH VECTOR INDEX graft.`$idx`").head().isNullAt(0))
    GraftWriter.write(spark, embDf(Seq((300L, vec(3), 0L))), src,
      WriteOptions(mode = WriteMode.Append))
    assert(spark.sql(s"REFRESH VECTOR INDEX graft.`$idx`").head().getLong(0) ==
      GraftTable(spark, src).version())
    assert(codesOf(idx) == frozenRecompute(idx, src))
    // DESCRIBE surfaces staleness + the drift advisory in one row
    val d = spark.sql(s"DESCRIBE VECTOR INDEX graft.`$idx`").head()
    assert(!d.getBoolean(d.fieldIndex("stale")))
    assert(!d.getBoolean(d.fieldIndex("rebuild_recommended")))
    assert(!d.isNullAt(d.fieldIndex("build_distortion_e6")))
    GraftWriter.write(spark, embDf(Seq((301L, vec(5), 0L))), src,
      WriteOptions(mode = WriteMode.Append))
    val d2 = spark.sql(s"DESCRIBE VECTOR INDEX graft.`$idx`").head()
    assert(d2.getBoolean(d2.fieldIndex("stale")), "DESCRIBE must flag staleness")
    assert(d2.getString(d2.fieldIndex("metric")) == "l2")
    spark.sql(s"REFRESH VECTOR INDEX graft.`$idx`").collect()
    // unknown OPTIONS refused
    val eOpt = intercept[Exception] {
      spark.sql(s"CREATE VECTOR INDEX graft.`${tmpDir("ann_sql_bad")}/ix` " +
        s"ON graft.`$src` (embedding) OPTIONS ('nprobe' = '2')")
    }
    assert(eOpt.getMessage.contains("unknown vector-index OPTIONS"))
    // DROP refuses a data table, removes a real index
    val eDrop = intercept[Exception] {
      spark.sql(s"DROP VECTOR INDEX graft.`$src`")
    }
    assert(eDrop.getMessage.contains("not a vector index"), eDrop.getMessage)
    spark.sql(s"DROP VECTOR INDEX graft.`$idx`")
    assert(!GraftTable.exists(spark, idx))
  }

  test("retention past the index watermark fails refresh with the rebuild remedy") {
    val src = tmpDir("ann_ret_src"); val idx = tmpDir("ann_ret_idx") + "/ix"
    mkCorpus(src, 0L until 60L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    // enough appends to pass a checkpoint boundary, then prune the log
    // past the index's watermark
    (1 to 15).foreach { i =>
      GraftWriter.write(spark, embDf(Seq((100L + i, vec(i), 0L))), src,
        WriteOptions(mode = WriteMode.Append))
    }
    val log = GraftTable(spark, src).log
    val future = System.currentTimeMillis() + 30L * 24 * 3600 * 1000
    assert(log.cleanOldLogs(1000L, nowMs = future).nonEmpty)
    assert(log.versions().head > 1L)
    val e = intercept[IllegalStateException] { AnnIndex.refresh(spark, idx) }
    assert(e.getMessage.contains("AnnIndex.build"), e.getMessage)
  }

  test("quantizer drift: refresh with shifted vectors flips rebuildRecommended") {
    val src = tmpDir("ann_drift_src"); val idx = tmpDir("ann_drift_idx") + "/ix"
    mkCorpus(src, 0L until 120L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8)
    val st0 = AnnIndex.status(spark, idx, probeDrift = true)
    assert(st0.buildDistortionE6.isDefined)
    assert(st0.currentDistortionE6 == st0.buildDistortionE6,
      "same corpus, same probe — distortion must reproduce exactly")
    assert(!st0.rebuildRecommended)

    // corpus shifts far outside the trained distribution (an equal-size
    // append of 50×-scaled vectors); refresh encodes the new rows
    // through the FROZEN quantizers
    GraftWriter.write(spark,
      embDf((200L until 320L).map(i => (i, vec(i).map(_ * 50f), i % 3))),
      src, WriteOptions(mode = WriteMode.Append))
    assert(AnnIndex.refresh(spark, idx).isDefined)
    val st1 = AnnIndex.status(spark, idx, probeDrift = true)
    assert(!st1.stale, "refresh caught the index up")
    assert(st1.rebuildRecommended,
      s"50x-scaled corpus must trip the drift threshold: $st1")
    // the probe's sample is HASH-ordered, so a bounded sample smaller
    // than the corpus still sees the APPENDED (high-id) drifted rows —
    // an id-ordered prefix would re-measure only the build-time docs
    // and never flag
    assert(AnnIndex.status(spark, idx, probeDrift = true, probeSample = 60)
      .rebuildRecommended,
      "a small hash-ordered sample must still include appended rows")

    // a stale + drifted index names BOTH problems in the refusal
    GraftWriter.write(spark, embDf(Seq((500L, vec(1).map(_ * 50f), 0L))),
      src, WriteOptions(mode = WriteMode.Append))
    val q = embDf(Seq((0L, vec(0), 0L)))
    val e = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, idx, q, k = 2, requireFresh = true)
    }
    assert(e.getMessage.contains("STALE"))
    assert(e.getMessage.contains("rebuildRecommended"),
      s"refusal must mention drift: ${e.getMessage}")

    // an explicit rebuild on the shifted corpus clears the flag
    val idx2 = tmpDir("ann_drift_idx2") + "/ix"
    AnnIndex.build(spark, src, idx2, numCells = 4, m = 4, ksub = 8)
    assert(!AnnIndex.status(spark, idx2, probeDrift = true).rebuildRecommended)
  }

  private def rankedIp(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Long)] =
    df.select("q_id", "n_id", "rank", "asim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  private def rankedSim(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Long)] =
    df.select("q_id", "n_id", "rank", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("ip index: search + rerank bit-match the inline MIPS paths; DESCRIBE reports the metric") {
    val src = tmpDir("annip_src"); val idx = tmpDir("annip_idx") + "/ix"
    mkCorpus(src, 0L until 120L)
    AnnIndex.build(spark, src, idx, numCells = 6, m = 4, ksub = 8,
      metric = "ip")
    val corpus = GraftTable(spark, src).toDf()
    val inline = Similarity.ivfIpTopK(corpus, col("vec_id") < 8, k = 4,
      numCells = 6, m = 4, ksub = 8, rowCountHint = Some(120L))
    val stored = AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4)
    assert(rankedIp(stored) == rankedIp(inline))
    assert(rankedIp(stored).nonEmpty)
    // multi-probe parity (query-side nprobe only — same stored codes)
    assert(rankedIp(AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4, nprobe = 2)) ==
      rankedIp(Similarity.ivfIpTopK(corpus, col("vec_id") < 8, k = 4,
        numCells = 6, m = 4, ksub = 8, nprobe = 2, rowCountHint = Some(120L))))
    // two-stage parity: the exact stage scores by rounded DOT on both
    assert(rankedSim(AnnIndex.searchRerank(spark, idx,
      corpus.filter(col("vec_id") < 8), k = 4, shortlistFactor = 3)) ==
      rankedSim(Similarity.ivfIpTopKRerank(corpus, col("vec_id") < 8, k = 4,
        shortlistFactor = 3, numCells = 6, m = 4, ksub = 8,
        rowCountHint = Some(120L))))
    // DESCRIBE surfaces the metric next to staleness/drift
    val d = spark.sql(s"DESCRIBE VECTOR INDEX graft.`$idx`").head()
    assert(d.getString(d.fieldIndex("metric")) == "ip")
    assert(!d.getBoolean(d.fieldIndex("stale")))
    // Lloyd-refined coarse cells round-trip too (dot-argmax inside the
    // loop on both sides; books unaffected — no residual stage)
    val idxK = tmpDir("annip_kidx") + "/ix"
    AnnIndex.build(spark, src, idxK, numCells = 6, m = 4, ksub = 8,
      coarseIters = 2, metric = "ip")
    assert(rankedIp(AnnIndex.search(spark, idxK,
      corpus.filter(col("vec_id") < 8), k = 4)) ==
      rankedIp(Similarity.ivfIpTopK(corpus, col("vec_id") < 8, k = 4,
        numCells = 6, m = 4, ksub = 8, rowCountHint = Some(120L),
        coarseIters = 2)))
    // the SQL route creates the same artifact
    val idxS = tmpDir("annip_sidx") + "/ix"
    spark.sql(s"CREATE VECTOR INDEX graft.`$idxS` ON graft.`$src` " +
      "(embedding) ID vec_id OPTIONS ('numCells' = '6', 'm' = '4', " +
      "'ksub' = '8', 'metric' = 'ip')")
    assert(rankedIp(AnnIndex.search(spark, idxS,
      corpus.filter(col("vec_id") < 8), k = 4)) == rankedIp(inline))
    val eM = intercept[Exception] {
      AnnIndex.build(spark, src, tmpDir("annip_bad") + "/ix",
        metric = "cosine")
    }
    assert(eM.getMessage.contains("unknown index metric"))
  }

  test("ip index: refresh encodes through the FROZEN dot-cell/raw-book quantizers") {
    val src = tmpDir("annip_rsrc"); val idx = tmpDir("annip_ridx") + "/ix"
    mkCorpus(src, 0L until 80L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8,
      metric = "ip")
    assert(codesOf(idx) == frozenRecompute(idx, src))
    // the raw-vector drift probe reproduces exactly on an unchanged corpus
    val st0 = AnnIndex.status(spark, idx, probeDrift = true)
    assert(st0.currentDistortionE6 == st0.buildDistortionE6)
    assert(!st0.rebuildRecommended)

    GraftWriter.write(spark,
      embDf((200L until 210L).map(i => (i, vec(i + 3), i % 3))),
      src, WriteOptions(mode = WriteMode.Append))
    Dml.update(spark, src, col("vec_id") === 7L,
      Map("embedding" -> typedLit(vec(999L))))
    Dml.delete(spark, src, col("vec_id").isin(3L, 5L, 203L))
    assert(AnnIndex.refresh(spark, idx)
      .contains(GraftTable(spark, src).version()))
    val after = codesOf(idx)
    assert(after == frozenRecompute(idx, src))
    assert(!after.exists(_._1 == 3L) && after.exists(_._1 == 207L))
    assert(AnnIndex.refresh(spark, idx).isEmpty)
    // searches after refresh serve the maintained codes, fresh gate on
    assert(rankedIp(AnnIndex.search(spark, idx,
      GraftTable(spark, src).toDf().filter(col("vec_id") < 4), k = 3,
      requireFresh = true)).nonEmpty)
  }

  test("k-means build round-trips its refined quantizers through the properties") {
    val src = tmpDir("ann_ksrc"); val idx = tmpDir("ann_kidx") + "/ix"
    mkCorpus(src, 0L until 100L)
    AnnIndex.build(spark, src, idx, numCells = 4, m = 4, ksub = 8,
      coarseIters = 1, pqIters = 1)
    graft.ext.Scratch.drain()
    val corpus = GraftTable(spark, src).toDf()
    val inline = Similarity.ivfpqTopKKmeans(corpus, col("vec_id") < 6, k = 3,
      numCells = 4, m = 4, ksub = 8, coarseIters = 1, pqIters = 1,
      rowCountHint = Some(100L))
    val inlineRows = ranked(inline)
    graft.ext.Scratch.drain()
    val stored = AnnIndex.search(spark, idx,
      corpus.filter(col("vec_id") < 6), k = 3)
    assert(ranked(stored) == inlineRows)
  }
}
