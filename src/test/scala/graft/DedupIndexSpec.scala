package graft

import org.apache.spark.sql.functions._

import graft.ext.DedupIndex
import graft.io._

/** Persisted dedup fingerprint store: build once, ingest batches against
  * the full history without rescanning any text.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, text: String) = (i, text)

  private val storeDocs = Seq(
    doc(1L, "alpha beta gamma delta epsilon zeta"),
    doc(2L, "one two three four five six seven eight"),
    doc(3L, "the quick brown fox jumps over the lazy dog"))

  test("ingest drops store matches and within-batch dupes; survivors append") {
    val idx = tmpDir("dedup_idx")
    DedupIndex.build(spark, idx, storeDocs.toDF("doc_id", "text"))
    val storeRows0 = GraftTable(spark, idx).toDf().count()
    assert(storeRows0 > 0)

    val batch = Seq(
      doc(10L, "the quick brown fox jumps over the lazy dog"), // = store 3
      doc(11L, "completely novel sentence about spark physical plans"),
      doc(12L, "twin texts inside one batch keep the smaller id"),
      doc(13L, "twin texts inside one batch keep the smaller id"), // = 12
      doc(14L, "xy")) // < 3 tokens: shingles to its whole text
      .toDF("doc_id", "text")
    val survivors = DedupIndex.ingest(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(11L, 12L, 14L), s"got $survivors")

    // the store grew by exactly the survivors' band rows
    val stored = GraftTable(spark, idx).toDf()
    val newIds = stored.filter(col("doc_id") >= 10L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(newIds == Set(11L, 12L, 14L))

    // replaying the same batch finds everything fingerprinted: zero
    // survivors, zero store growth — a replayed step cannot double-insert
    val replay = DedupIndex.ingest(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay == Set.empty[Long], s"got $replay")
    assert(GraftTable(spark, idx).toDf().count() ==
      stored.count(), "replay must not grow the store")
  }

  test("build caps degenerate bands; ingest against them is not a false dup") {
    val idx = tmpDir("dedup_idx_hot")
    // 600 seed docs share ONE boilerplate text -> every band is hot (>500)
    val boiler = (0L until 600L).map(i =>
      doc(100L + i, "shared boilerplate text repeated across the whole corpus"))
    DedupIndex.build(spark, idx, boiler.toDF("doc_id", "text"))
    assert(GraftTable(spark, idx).toDf().count() == 0,
      "hot bands must be dropped from the store")
    // a batch doc with the SAME boilerplate is not beaten by the store
    // (the degenerate fingerprints were never stored)
    val s = DedupIndex.ingest(spark, idx,
      Seq(doc(1L, "shared boilerplate text repeated across the whole corpus"))
        .toDF("doc_id", "text"))
    assert(s.count() == 1)
  }

  test("mirror store: buildFromTable + refresh follow the source; probe decontaminates") {
    val srcP = tmpDir("dedup_mirror_src")
    val idx = tmpDir("dedup_mirror_idx") + "/ix"
    GraftWriter.write(spark, storeDocs.toDF("doc_id", "text"), srcP,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))
    DedupIndex.buildFromTable(spark, srcP, idx)

    // probe = read-only membership: the store-dup hits, the novel doesn't
    val probeBatch = Seq(
      doc(20L, "alpha beta gamma delta epsilon zeta"), // = source doc 1
      doc(21L, "genuinely new content nowhere else")).toDF("doc_id", "text")
    val hits = DedupIndex.probe(spark, idx, probeBatch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(20L), s"got $hits")
    assert(GraftTable(spark, idx).toDf()
      .filter(col("doc_id") >= 20L).count() == 0, "probe must not append")

    // source churns: append, text update, delete — refresh mirrors all
    GraftWriter.write(spark,
      Seq(doc(4L, "fresh document appended after the build")).toDF("doc_id", "text"),
      srcP, WriteOptions(mode = WriteMode.Append))
    graft.merge.Dml.update(spark, srcP, col("doc_id") === 2L,
      Map("text" -> lit("rewritten body with entirely different words")))
    graft.merge.Dml.delete(spark, srcP, col("doc_id") === 1L)
    assert(DedupIndex.refresh(spark, idx).isDefined)
    assert(DedupIndex.refresh(spark, idx).isEmpty, "already current")

    // the mirrored fingerprints equal a from-scratch banding of the
    // CURRENT source
    val expect = graft.ext.Dedup.minhashBands(GraftTable(spark, srcP).toDf())
      .selectExpr("CAST(doc_id AS LONG) doc_id", "CAST(band_id AS LONG) band_id", "band_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val got = GraftTable(spark, idx).toDf()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expect, "refresh diverged from a recompute")

    // probing the old text of the deleted doc no longer hits
    val after = DedupIndex.probe(spark, idx,
      Seq(doc(30L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"))
    assert(after.count() == 0, "deleted doc's fingerprints must purge")
  }

  test("maintainStream keeps the mirror fresh per micro-batch") {
    val srcP = tmpDir("dedup_stream_src")
    val idx = tmpDir("dedup_stream_idx") + "/ix"
    val ckpt = tmpDir("dedup_stream_ckpt")
    GraftWriter.write(spark, storeDocs.toDF("doc_id", "text"), srcP,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))
    DedupIndex.buildFromTable(spark, srcP, idx)
    val q = DedupIndex.maintainStream(spark, idx, ckpt)
    try {
      GraftWriter.write(spark,
        Seq(doc(50L, "streamed-in document body for the mirror")).toDF("doc_id", "text"),
        srcP, WriteOptions(mode = WriteMode.Append))
      q.processAllAvailable()
      assert(GraftTable(spark, idx).toDf()
        .filter(col("doc_id") === 50L).count() > 0)
    } finally q.stop()
  }

  test("NULL-text docs fingerprint like empty text (replay stays empty)") {
    val idx = tmpDir("dedup_idx_null")
    DedupIndex.build(spark, idx, storeDocs.toDF("doc_id", "text"))
    val batch = Seq((40L, null.asInstanceOf[String]), (41L, ""))
      .toDF("doc_id", "text")
    val s1 = DedupIndex.ingest(spark, idx, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // NULL and "" band identically: the smaller id survives, the other
    // is a within-batch dup
    assert(s1 == Set(40L), s"got $s1")
    // replay: both now fingerprinted -> zero survivors (the guarantee)
    assert(DedupIndex.ingest(spark, idx, batch).count() == 0)
  }

  test("keys that creep past the cap via refresh go inert at query time") {
    val srcP = tmpDir("dedup_hot_src")
    val idx = tmpDir("dedup_hot_idx") + "/ix"
    val boiler = "identical boilerplate body shared by every doc here"
    GraftWriter.write(spark,
      Seq(doc(1L, boiler), doc(2L, boiler)).toDF("doc_id", "text"), srcP,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))
    // cap = 2: the build keeps the key (count 2 <= cap)...
    DedupIndex.buildFromTable(spark, srcP, idx, maxDocsPerBand = 2)
    assert(DedupIndex.probe(spark, idx,
      Seq(doc(90L, boiler)).toDF("doc_id", "text")).count() == 1)
    // ...one more refreshed copy pushes the stored count to 3 > cap:
    // the key still sits in the store, but hitKeysOf ignores it — no
    // false-duplicate flood from a degenerate band, however it formed
    GraftWriter.write(spark, Seq(doc(3L, boiler)).toDF("doc_id", "text"),
      srcP, WriteOptions(mode = WriteMode.Append))
    assert(DedupIndex.refresh(spark, idx).isDefined)
    assert(GraftTable(spark, idx).toDf()
      .groupBy("band_id", "band_key").count()
      .filter(col("count") > 2).count() > 0, "the key must have crept hot")
    assert(DedupIndex.probe(spark, idx,
      Seq(doc(91L, boiler)).toDF("doc_id", "text")).count() == 0,
      "a hot key must be ignored at query time")
  }

  test("DESCRIBE band health: bands AT the cap read as hot") {
    val srcP = tmpDir("dedup_hot_src")
    val store = tmpDir("dedup_hot_store") + "/st"
    val same = "identical boilerplate footer text shared by every crawled page"
    GraftWriter.write(spark,
      Seq(doc(1L, same), doc(2L, same),
        doc(3L, "a genuinely unique document about catalyst plan shapes"))
        .toDF("doc_id", "text"),
      srcP, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))
    // cap = 2: the duplicated text's bands sit exactly AT the cap —
    // kept by the build (only > cap is dropped) but saturated, which is
    // precisely where candidate recall starts truncating
    spark.sql(s"CREATE DEDUP STORE graft.`$store` ON graft.`$srcP` " +
      "(text) ID doc_id OPTIONS ('maxDocsPerBand' = '2')")
    val d = spark.sql(s"DESCRIBE DEDUP STORE graft.`$store` WITH STATS").head()
    assert(d.getLong(d.fieldIndex("hot_bands")) > 0L, d.toString)
    assert(d.getLong(d.fieldIndex("max_band_docs")) == 2L)
    assert(d.getLong(d.fieldIndex("distinct_bands")) >
      d.getLong(d.fieldIndex("hot_bands")),
      "the unique doc's bands must stay cold")
  }

  test("SQL DDL drives the store lifecycle: CREATE / REFRESH / DROP DEDUP STORE") {
    val srcP = tmpDir("dedup_sql_src")
    val store = tmpDir("dedup_sql_store") + "/st"
    GraftWriter.write(spark, storeDocs.toDF("doc_id", "text"), srcP,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(Cdc.PropKey -> "true")))
    val v = spark.sql(s"CREATE DEDUP STORE graft.`$store` ON graft.`$srcP` " +
      "(text) ID doc_id OPTIONS ('perms' = '16', 'rowsPerBand' = '4')")
      .head().getLong(0)
    assert(v == GraftTable(spark, srcP).version())
    assert(DedupIndex.probe(spark, store,
      Seq(doc(70L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"))
      .count() == 1)
    // already current -> NULL; after source churn -> the new version
    assert(spark.sql(s"REFRESH DEDUP STORE graft.`$store`").head().isNullAt(0))
    GraftWriter.write(spark,
      Seq(doc(5L, "added after the SQL build")).toDF("doc_id", "text"),
      srcP, WriteOptions(mode = WriteMode.Append))
    assert(spark.sql(s"REFRESH DEDUP STORE graft.`$store`").head().getLong(0) ==
      GraftTable(spark, srcP).version())
    // DESCRIBE: coupling, watermark, staleness, fingerprint count —
    // metadata-only by default (stat columns NULL, no store scan)
    val d = spark.sql(s"DESCRIBE DEDUP STORE graft.`$store`").head()
    assert(d.getString(d.fieldIndex("source_path")) == srcP)
    assert(!d.getBoolean(d.fieldIndex("stale")))
    assert(d.getLong(d.fieldIndex("fingerprints")) > 0L)
    assert(d.isNullAt(d.fieldIndex("distinct_bands")))
    assert(d.isNullAt(d.fieldIndex("hot_bands")))
    // WITH STATS opts into the band-health scan; distinct seed texts
    // saturate nothing
    val ds = spark.sql(s"DESCRIBE DEDUP STORE graft.`$store` WITH STATS").head()
    assert(ds.getLong(ds.fieldIndex("distinct_bands")) > 0L)
    assert(ds.getLong(ds.fieldIndex("hot_bands")) == 0L)
    assert(ds.getLong(ds.fieldIndex("max_band_docs")) >= 1L)
    GraftWriter.write(spark,
      Seq(doc(6L, "one more appended for the describe check")).toDF("doc_id", "text"),
      srcP, WriteOptions(mode = WriteMode.Append))
    assert(spark.sql(s"DESCRIBE DEDUP STORE graft.`$store`")
      .head().getBoolean(3), "DESCRIBE must flag staleness")
    spark.sql(s"REFRESH DEDUP STORE graft.`$store`").collect()
    // unknown OPTIONS refused; DROP refuses a data table, removes a store
    val eOpt = intercept[Exception] {
      spark.sql(s"CREATE DEDUP STORE graft.`${tmpDir("dedup_sql_bad")}/st` " +
        s"ON graft.`$srcP` (text) OPTIONS ('bands' = '8')")
    }
    assert(eOpt.getMessage.contains("unknown dedup-store OPTIONS"))
    val eDrop = intercept[Exception] {
      spark.sql(s"DROP DEDUP STORE graft.`$srcP`")
    }
    assert(eDrop.getMessage.contains("not a dedup store"), eDrop.getMessage)
    spark.sql(s"DROP DEDUP STORE graft.`$store`")
    assert(!GraftTable.exists(spark, store))
  }

  test("ingest refuses a table that is not a fingerprint store") {
    val p = tmpDir("dedup_idx_notidx")
    GraftWriter.write(spark, Seq((1L, "x")).toDF("doc_id", "text"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val e = intercept[IllegalStateException] {
      DedupIndex.ingest(spark, p, Seq(doc(1L, "a b c d")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("DedupIndex.build"))
  }
}
