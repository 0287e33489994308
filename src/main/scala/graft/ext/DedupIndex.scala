package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}

/** Persisted near-duplicate FINGERPRINT STORE — the incremental
  * counterpart of the one-shot [[Dedup.minhashPairs]] sweep, and the
  * dedup analog of [[AnnIndex]]'s build/search/refresh lifecycle:
  *
  *   - [[build]] computes MinHash LSH band rows `(doc_id, band_id,
  *     band_key)` for a seed corpus ONCE and commits them as a graft
  *     table (with the banding parameters as carried properties);
  *   - [[ingest]] dedups a NEW batch against everything ever ingested
  *     without rescanning any document text: two narrow column-pruned
  *     store passes (band-key probe + doc-id presence) joined against
  *     the (broadcast-sized) batch side, then ONE append commit of the
  *     survivors' fingerprints.
  *
  * This is the shape a 100 TB training-data pipeline actually needs:
  * the crawl's daily increment is deduped against the full historical
  * corpus at the cost of one store scan + O(batch) work — the corpus
  * text is never touched again, and the store grows only by surviving
  * docs' band rows (≈ perms/rowsPerBand longs per doc).
  *
  * Survivor semantics (deterministic, oracle-checked): a batch doc
  * survives iff (a) none of its bands matches a stored fingerprint,
  * (b) none of its bands matches a SMALLER-id doc of the same batch,
  * and (c) its doc ID is not already fingerprinted — ids are
  * identities, so re-ingesting an id (crash replay, re-crawl) never
  * double-emits and never updates the stored fingerprints (a
  * re-crawled id with NEW text needs a [[buildFromTable]]-coupled
  * store, whose [[refresh]] mirrors text changes).
  * Within-batch matching is against ALL batch docs (not just survivors)
  * — one relational pass, no transitive chasing; a batch doc beaten by
  * an (itself beaten) smaller sibling is still dropped, which is the
  * conservative direction for dedup. Re-ingesting an already-ingested
  * batch returns ZERO survivors (its docs are now fingerprinted), so a
  * replayed pipeline step cannot double-insert. Every doc carries
  * bands (short texts shingle to their whole text — [[TextOps.shingles]]),
  * so the fingerprint coverage is total.
  */
object DedupIndex {

  /** `perms=..,rowsPerBand=..,idCol=..,textCol=..,maxDocsPerBand=..`
    * banding parameters (carried property of the store table).
    */
  val ParamsKey: String =
    graft.log.CommitLog.ReservedPrefix + "dedup.params"

  /** Source-coupled stores ([[buildFromTable]]): qualified source table
    * path + the source version the fingerprints reflect (carried; rides
    * each refresh's merge commit — the [[AnnIndex]] watermark pattern).
    */
  val SourcePathKey: String =
    graft.log.CommitLog.ReservedPrefix + "dedup.sourcePath"
  val SourceVersionKey: String =
    graft.log.CommitLog.ReservedPrefix + "dedup.sourceVersion"

  /** Create the fingerprint store at `indexPath` from a seed corpus.
    * Band keys degenerate across more than `maxDocsPerBand` seed docs
    * (web boilerplate) are dropped from the store — they carry
    * near-zero LSH signal and would otherwise make every future batch
    * doc sharing the boilerplate band a false duplicate. Same default
    * and rationale as [[Dedup.minhashPairs]]'s hot-band cap.
    */
  def build(
      spark: SparkSession,
      indexPath: String,
      docs: DataFrame,
      perms: Int = 16,
      rowsPerBand: Int = 4,
      maxDocsPerBand: Int = 500,
      idCol: String = "doc_id",
      textCol: String = "text",
      /** Extra creating-commit properties ([[buildFromTable]]'s source
        * coupling); empty for a free-standing gatekeeper store.
        */
      extraProps: Map[String, String] = Map.empty): Long = {
    require(perms % rowsPerBand == 0, "perms must divide into bands")
    // NULL text bands like empty text (coalesce): a NULL-text doc must
    // still be fingerprintable, or it would survive EVERY re-ingest and
    // break the replay-returns-zero-survivors guarantee
    val bands = Dedup.minhashBands(
      nullSafeText(docs, textCol), perms, rowsPerBand, idCol, textCol)
      .localCheckpoint(eager = true)
    val hot = bands.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxDocsPerBand)
      .select("band_id", "band_key")
    val kept = bands.join(broadcast(hot), Seq("band_id", "band_key"), "left_anti")
      .select(col(idCol).cast("long").as("doc_id"),
        col("band_id").cast("long").as("band_id"), col("band_key"))
    val v = GraftWriter.write(spark, kept, indexPath,
      WriteOptions(
        mode = WriteMode.ErrorIfExists,
        metadata = extraProps ++ Map(
          ParamsKey -> (s"perms=$perms,rowsPerBand=$rowsPerBand," +
            s"idCol=$idCol,textCol=$textCol,maxDocsPerBand=$maxDocsPerBand"),
          // ingest appends one small file set per batch — bounded
          // maintenance is the right default for an engine-managed table
          GraftWriter.AutoCompactKey -> "true")))
    Scratch.release(bands)
    v
  }

  /** [[build]] from a graft TABLE, recording the source coupling so
    * [[refresh]] / [[maintainStream]] can keep the fingerprints
    * MIRRORING the source through its change feed. A mirrored store is
    * the decontamination primitive: [[probe]] answers "does this batch
    * near-dup anything in the corpus" without ever rescanning corpus
    * text — e.g. eval-set screening against a live 100 TB training set.
    */
  def buildFromTable(
      spark: SparkSession,
      sourcePath: String,
      indexPath: String,
      perms: Int = 16,
      rowsPerBand: Int = 4,
      maxDocsPerBand: Int = 500,
      idCol: String = "doc_id",
      textCol: String = "text"): Long = {
    val src = GraftTable(spark, sourcePath)
    val v = src.version()
    build(spark, indexPath, src.toDf(versionAsOf = Some(v)),
      perms, rowsPerBand, maxDocsPerBand, idCol, textCol,
      extraProps = Map(
        SourcePathKey -> sourcePath,
        SourceVersionKey -> v.toString))
  }

  /** The batch rows that HAVE a near-duplicate in the store (any banded
    * match) — the read-only complement of [[ingest]]: nothing is
    * appended, so this is the decontamination / membership probe. Same
    * one-store-scan shape as ingest.
    */
  def probe(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame): DataFrame = {
    val table = GraftTable(spark, indexPath)
    val kv = paramsOf(table)
    val idCol = kv("idCol")
    // pinned like ingest's: the band pipeline feeds both the key probe
    // and the id projection — without the checkpoint it would run twice
    val bands = batchBands(batch, kv).localCheckpoint(eager = true)
    val hitKeys = hitKeysOf(table.toDf(), bands, kv("maxDocsPerBand").toInt)
    val hitIds = bands
      .join(broadcast(hitKeys), Seq("band_id", "band_key"), "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
      .localCheckpoint(eager = true)
    Scratch.register(hitIds)
    Scratch.release(bands)
    batch.join(hitIds, Seq(idCol), "left_semi")
  }

  /** Fold the SOURCE's change feed into a [[buildFromTable]] store —
    * MIRROR semantics (the store follows the source; no gatekeeping):
    * per changed id, last change wins — a delete purges the id's band
    * rows, an insert/update re-encodes them. One merge commit carrying
    * the watermark (exactly-once, the [[AnnIndex.refresh]] pattern);
    * work is O(changed rows). Band ids are dense 0..n-1 per doc, so the
    * (doc_id, band_id) equi-merge updates in place, inserts
    * build-capped or brand-new rows, and deletes removals.
    */
  def refresh(spark: SparkSession, indexPath: String): Option[Long] = {
    import graft.merge.{Delete, InsertValues, MergeClausesExecutor, UpdateSet}
    val table = GraftTable(spark, indexPath)
    val props = table.log.tableProperties()
    val kv = paramsOf(table)
    val sourcePath = props.getOrElse(SourcePathKey,
      throw new IllegalStateException(
        s"$indexPath is not source-coupled (missing $SourcePathKey) — " +
          "create with DedupIndex.buildFromTable to refresh from a " +
          "change feed; free-standing stores grow via ingest only"))
    val lastV = props(SourceVersionKey).toLong
    val src = GraftTable(spark, sourcePath)
    val curV = src.version()
    if (curV <= lastV) return None
    val (idCol, textCol) = (kv("idCol"), kv("textCol"))
    val nBands = kv("perms").toInt / kv("rowsPerBand").toInt

    val changes =
      try src.tableChanges(lastV, curV)
      catch {
        case e: IllegalStateException
            if e.getMessage != null && e.getMessage.contains("log retention") =>
          throw new IllegalStateException(
            s"cannot incrementally refresh the dedup store $indexPath: " +
              s"the source log at $sourcePath no longer covers versions " +
              s"($lastV, $curV]. Remedy: REBUILD the store with " +
              "DedupIndex.buildFromTable — a pruned change range is " +
              "unrecoverable incrementally.", e)
      }
    // net effect per id: removal-shaped rows rank below same-version
    // insert/postimage twins (id-changing UPDATEs purge the old id)
    val priority = when(col(graft.io.Cdc.ChangeCol)
      .isin("delete", "update_preimage"), 0L).otherwise(1L)
    // pinned: the change scan + its window shuffle feed BOTH the upsert
    // and the delete branches of the merge source — without the
    // checkpoint the feed would execute twice (narrowed to the columns
    // both branches need before pinning)
    val latest = {
      val l = changes
        .withColumn("__pri", priority)
        .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
            .orderBy(col(graft.io.Cdc.VersionCol).desc, col("__pri").desc)))
        .filter(col("__rn") === 1)
        .select(col(idCol), col(textCol), col("__pri"))
        .localCheckpoint(eager = true)
      Scratch.register(l)
      l
    }
    // re-encode the survivors, applying the SAME hot-band cap as build
    // WITHIN this refresh batch: a degenerate key must not re-enter the
    // store through maintenance (an updated doc's now-hot band converts
    // to a delete so no stale key lingers); keys that creep hot ACROSS
    // refreshes are neutralized at query time by hitKeysOf's cap
    val cap = kv("maxDocsPerBand").toInt
    val upBands = batchBands(
      latest.filter(col("__pri") === 1L).select(col(idCol), col(textCol)), kv)
      .localCheckpoint(eager = true)
    val hotNew = upBands.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > cap)
      .select("band_id", "band_key")
    val upserts = upBands
      .join(broadcast(hotNew), Seq("band_id", "band_key"), "left_anti")
      .withColumn("__op", lit("U"))
    val cappedAway = upBands
      .join(broadcast(hotNew), Seq("band_id", "band_key"), "left_semi")
      .select(col("doc_id"), col("band_id"),
        lit(null).cast("string").as("band_key"))
      .withColumn("__op", lit("D"))
    val deletes = latest.filter(col("__pri") === 0L)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(sequence(lit(0L), lit(nBands - 1L))).as("band_id"),
        lit(null).cast("string").as("band_key"))
      .withColumn("__op", lit("D"))
      .unionByName(cappedAway)
    MergeClausesExecutor.merge(spark, upserts.unionByName(deletes), indexPath,
      "s.doc_id = t.doc_id AND s.band_id = t.band_id",
      matched = Seq(
        Delete(Some(col("s.__op") === "D")),
        UpdateSet(Map("band_key" -> col("s.band_key")), None)),
      notMatched = Seq(InsertValues(
        Map("doc_id" -> col("s.doc_id"), "band_id" -> col("s.band_id"),
          "band_key" -> col("s.band_key")),
        Some(col("s.__op") =!= "D"))),
      extraMetadata = Map(SourceVersionKey -> curV.toString))
    Scratch.release(upBands)
    Scratch.release(latest)
    Some(curV)
  }

  /** Continuous mirror maintenance: a change-feed stream on the source
    * triggers one [[refresh]] per micro-batch — the stream is the
    * trigger, not the data path, so a replayed batch applies nothing
    * (watermark-guarded, exactly-once).
    */
  def maintainStream(
      spark: SparkSession,
      indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sourcePath = GraftTable(spark, indexPath).log.tableProperties()
      .getOrElse(SourcePathKey, throw new IllegalStateException(
        s"$indexPath is not source-coupled — maintainStream needs a " +
          "DedupIndex.buildFromTable store"))
    graft.streaming.Streams.readChangeFeed(spark, sourcePath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, indexPath)
        ()
      }
      .start()
  }

  /** Banding parameters of a store table, or a loud non-store error. */
  private[graft] def paramsOf(table: GraftTable): Map[String, String] =
    table.log.tableProperties().getOrElse(ParamsKey,
      throw new IllegalStateException(
        s"not a dedup fingerprint store (missing $ParamsKey) — create " +
          "with DedupIndex.build")).split(',')
      .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap

  /** A batch's typed band rows under the store's recorded parameters
    * (NULL text banded as empty — see [[build]]).
    */
  private def batchBands(
      batch: DataFrame, kv: Map[String, String]): DataFrame =
    Dedup.minhashBands(nullSafeText(batch, kv("textCol")),
      kv("perms").toInt, kv("rowsPerBand").toInt,
      kv("idCol"), kv("textCol"))
      .select(col(kv("idCol")).cast("long").as("doc_id"),
        col("band_id").cast("long").as("band_id"), col("band_key"))

  /** NULL text fingerprints like empty text — every doc must band, or
    * NULL-text docs would be invisible to the store forever.
    */
  private def nullSafeText(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, coalesce(col(textCol), lit("")))

  /** Dedup `batch` against the store and fold the survivors in: returns
    * the surviving batch rows (all input columns) and atomically appends
    * their band rows. The batch is small by contract (a crawl increment,
    * not a corpus) — its band relation broadcasts; the store-sized work
    * is TWO column-pruned passes (the band-key probe and the doc-id
    * presence check, each a broadcast join + partial aggregation), so
    * ingest cost stays narrow at any store size.
    */
  def ingest(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame): DataFrame = {
    val table = GraftTable(spark, indexPath)
    val kv = paramsOf(table)
    val idCol = kv("idCol")

    // batch bands: pinned once — referenced by the store probe, the
    // within-batch join, the survivor filter, and the append
    val bands = batchBands(batch, kv).localCheckpoint(eager = true)

    // 1. store probe (see [[hitKeysOf]]) — plus a doc_id-level presence
    // check: a doc whose EVERY band key is over the hot cap would match
    // nothing by key, so without the id check a crashed-and-replayed
    // ingest would emit it (and append its bands) twice. The id probe
    // is a second pass over the store but column-pruned to doc_id with
    // a broadcast semi — still narrow at any store size.
    val hitKeys = hitKeysOf(table.toDf(), bands, kv("maxDocsPerBand").toInt)
    val alreadyIngested = table.toDf().select("doc_id")
      .join(broadcast(batch.select(col(idCol).cast("long").as("doc_id"))
        .distinct()), Seq("doc_id"), "left_semi")
      .distinct()
    val storeBeaten = bands
      .join(broadcast(hitKeys), Seq("band_id", "band_key"), "left_semi")
      .select("doc_id")
      .union(alreadyIngested)

    // 2. within-batch: beaten by any smaller-id batch doc sharing a
    // band (columns renamed apart — self-join of one checkpoint)
    val a = bands.select(col("band_id").as("__ba_id"),
      col("band_key").as("__ba_key"), col("doc_id").as("__a"))
    val b = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("__b"))
    val batchBeaten = a.join(b,
      col("__ba_id") === col("band_id") && col("__ba_key") === col("band_key") &&
        col("__b") < col("__a"))
      .select(col("__a").as("doc_id"))

    // survivors = batch ids minus the beaten ones. Pinned BEFORE the
    // append so the returned frame can never recompute against the
    // post-append store.
    val survivorIds = batch.select(col(idCol).cast("long").as("doc_id"))
      .distinct()
      .join(storeBeaten.union(batchBeaten).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true)
    Scratch.register(survivorIds)

    val newRows = bands.join(survivorIds, Seq("doc_id"), "left_semi")
    if (!newRows.isEmpty)
      GraftWriter.write(spark, newRows, indexPath,
        WriteOptions(mode = WriteMode.Append,
          metadata = Map("operation" -> "DEDUP_INGEST")))
    // the append above was the last consumer of the band relation; the
    // returned frame references only the batch and the pinned ids
    Scratch.release(bands)

    batch.join(
      survivorIds.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
  }

  /** The store-sized part of an ingest/probe, isolated so its plan
    * shape is auditable: ONE store scan, the batch's distinct keys
    * broadcast into the join, then a partial-aggregated per-key count
    * (per-task output bounded by the batch's key count — a degenerate
    * store band never materializes its member list). The count enforces
    * the hot-band cap at QUERY time too: a key that crept past
    * `maxDocsPerBand` through post-build appends/refreshes carries no
    * LSH signal and is ignored, so it can never flood ingest/probe with
    * false duplicates no matter how it accumulated.
    */
  private[graft] def hitKeysOf(
      store: DataFrame, bands: DataFrame, maxDocsPerBand: Int): DataFrame = {
    val batchKeys = bands.select("band_id", "band_key").distinct()
    store.select("band_id", "band_key")
      .join(broadcast(batchKeys), Seq("band_id", "band_key"))
      .groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxDocsPerBand)
      .select("band_id", "band_key")
  }
}
