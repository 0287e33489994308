package graft

import org.apache.spark.sql.functions._

import graft.io._

/** COPY INTO — idempotent foreign-file ingestion. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def seedSource(dir: String, ids: Range): Unit =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(2).write.mode("overwrite").parquet(dir)

  test("re-running COPY INTO is an exact no-op (no commit)") {
    val src = tmpDir("ci_src")
    val p = tmpDir("ci_tbl")
    seedSource(src, 0 until 100)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val r1 = CopyInto.copyInto(spark, p, src)
    assert(r1.version.isDefined && r1.ingestedFiles > 0 && r1.skippedFiles == 0)
    val vAfter = GraftTable(spark, p).version()
    val r2 = CopyInto.copyInto(spark, p, src)
    assert(r2.version.isEmpty && r2.ingestedFiles == 0, r2)
    assert(r2.skippedFiles == r1.ingestedFiles)
    // version did NOT advance — the no-op left no commit behind
    assert(GraftTable(spark, p).version() == vAfter)
    assert(GraftTable(spark, p).toDf().count() == 100)
  }

  test("new and re-uploaded source files ingest incrementally") {
    val src = tmpDir("ci_incr_src")
    val p = tmpDir("ci_incr_tbl")
    seedSource(src, 0 until 50)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    CopyInto.copyInto(spark, p, src)
    // drop NEW files beside the old ones -> only they ingest
    (50 until 80).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(src + "/batch2")
    val r = CopyInto.copyInto(spark, p, src)
    assert(r.version.isDefined && r.ingestedFiles == 1, r)
    assert(GraftTable(spark, p).toDf().count() == 80)
    // a re-uploaded file (same path, different size/mtime) is a NEW
    // identity and ingests again — Delta's COPY INTO contract
    val fs = GraftTable(spark, p).log.fs
    val batch2 = new org.apache.hadoop.fs.Path(src + "/batch2")
    val oldFile = fs.listStatus(batch2).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    (80 until 95).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(src + "/batch2_tmp")
    val newFile = fs.listStatus(new org.apache.hadoop.fs.Path(src + "/batch2_tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.delete(oldFile, false)
    fs.rename(newFile, oldFile)
    val r3 = CopyInto.copyInto(spark, p, src)
    assert(r3.version.isDefined && r3.ingestedFiles == 1, r3)
    // rows 50..79 came from the replaced file's FIRST upload and stay;
    // the re-upload adds its own rows (append semantics, like Delta)
    assert(GraftTable(spark, p).toDf().filter(col("id") >= 80).count() == 15)
  }

  test("COPY INTO works from SQL (path target), no-op on re-run") {
    val src = tmpDir("ci_sql_src")
    val p = tmpDir("ci_sql_tbl")
    seedSource(src, 0 until 30)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val r1 = spark.sql(
      s"COPY INTO graft.`$p` FROM '$src' FILEFORMAT = PARQUET").head()
    assert(!r1.isNullAt(0) && r1.getLong(1) > 0 && r1.getLong(2) == 0, r1)
    val r2 = spark.sql(s"COPY INTO graft.`$p` FROM '$src'").head()
    assert(r2.isNullAt(0) && r2.getLong(1) == 0 && r2.getLong(2) == r1.getLong(1))
    assert(GraftTable(spark, p).toDf().count() == 30)
    // MERGE SCHEMA clause reaches the evolve path
    (30 until 40).map(i => (i.toLong, s"r$i", i * 1.5)).toDF("id", "s", "x")
      .coalesce(1).write.mode("overwrite").parquet(src + "/wide")
    val r3 = spark.sql(
      s"COPY INTO graft.`$p` FROM '$src' MERGE SCHEMA").head()
    assert(!r3.isNullAt(0) && r3.getLong(1) == 1, r3)
    assert(GraftTable(spark, p).toDf().columns.contains("x"))
  }

  test("a many-entry source dir lists on executors and still ingests exactly") {
    val src = tmpDir("ci_fanout_src")
    val p = tmpDir("ci_fanout_tbl")
    // one seed parquet file, byte-copied into 70 subdirs (> the driver
    // listing limit) — forces the executor fan-out path
    seedSource(src + "/seed", 0 until 1)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val seedFile = fs.listStatus(new org.apache.hadoop.fs.Path(src + "/seed"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    (1 to 69).foreach { i =>
      org.apache.hadoop.fs.FileUtil.copy(fs, seedFile, fs,
        new org.apache.hadoop.fs.Path(s"$src/d$i/part.parquet"),
        false, spark.sessionState.newHadoopConf())
    }
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val r1 = CopyInto.copyInto(spark, p, src)
    assert(r1.ingestedFiles == 70, r1)
    assert(GraftTable(spark, p).toDf().count() == 70)
    // the fan-out listing produces the same identities: re-run no-op
    val r2 = CopyInto.copyInto(spark, p, src)
    assert(r2.version.isEmpty && r2.skippedFiles == 70, r2)
  }

  test("dedup state is split across commits: each records only ITS new files") {
    val src = tmpDir("ci_split_src")
    val p = tmpDir("ci_split_tbl")
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    // three incremental ingests
    seedSource(src + "/b1", 0 until 10)
    val v1 = CopyInto.copyInto(spark, p, src).version.get
    seedSource(src + "/b2", 10 until 20)
    val v2 = CopyInto.copyInto(spark, p, src).version.get
    seedSource(src + "/b3", 20 until 30)
    val v3 = CopyInto.copyInto(spark, p, src).version.get
    assert(GraftTable(spark, p).toDf().count() == 30)
    // re-run is still an exact no-op — the seen-set is the UNION of the
    // three per-commit records
    val r = CopyInto.copyInto(spark, p, src)
    assert(r.version.isEmpty && r.skippedFiles == 6, r)
    // commit N's metadata records ONLY its own files — N-1's identities
    // must not be re-serialized (bounded per-commit state)
    val log = GraftTable(spark, p).log
    def ids(v: Long): Set[String] =
      log.readCommit(v).metadata(CopyInto.SourcesKey)
        .split("\n").filter(_.nonEmpty).toSet
    assert(ids(v1).size == 2 && ids(v2).size == 2 && ids(v3).size == 2)
    assert((ids(v2) intersect ids(v1)).isEmpty,
      "commit 2 re-serialized commit 1's identities")
    assert((ids(v3) intersect (ids(v1) ++ ids(v2))).isEmpty,
      "commit 3 re-serialized earlier identities")
    assert(ids(v1).forall(_.contains("/b1/")))
    assert(ids(v3).forall(_.contains("/b3/")))
  }

  test("PATTERN restricts the listing; FILES ingests an explicit list") {
    val src = tmpDir("ci_pat_src")
    val p = tmpDir("ci_pat_tbl")
    seedSource(src + "/keep", 0 until 10)
    seedSource(src + "/skip", 10 until 20)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    // PATTERN: only keep/ files match
    val r1 = CopyInto.copyInto(spark, p, src, pattern = Some("keep/*.parquet"))
    assert(r1.version.isDefined && r1.ingestedFiles == 2, r1)
    assert(GraftTable(spark, p).toDf().count() == 10)
    assert(GraftTable(spark, p).toDf().agg(max(col("id"))).head().getLong(0) == 9)
    // widening the pattern ingests the remainder; already-seen skip
    val r2 = CopyInto.copyInto(spark, p, src, pattern = Some("**.parquet"))
    assert(r2.ingestedFiles == 2 && r2.skippedFiles == 2, r2)
    assert(GraftTable(spark, p).toDf().count() == 20)
    // FILES: exactly one named file; dedup still applies on re-run
    val p2 = tmpDir("ci_files_tbl")
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p2,
      WriteOptions(mode = WriteMode.Overwrite))
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val one = fs.listStatus(new org.apache.hadoop.fs.Path(src + "/keep"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted.head
    val r3 = CopyInto.copyInto(spark, p2, src, files = Some(Seq(s"keep/$one")))
    assert(r3.version.isDefined && r3.ingestedFiles == 1, r3)
    val r4 = CopyInto.copyInto(spark, p2, src, files = Some(Seq(s"keep/$one")))
    assert(r4.version.isEmpty && r4.skippedFiles == 1, r4)
    // a named file that does not exist fails loudly
    val eMissing = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, p2, src, files = Some(Seq("keep/nope.parquet")))
    }
    assert(eMissing.getMessage.contains("not found"), eMissing.getMessage)
    // PATTERN and FILES together are refused
    val eBoth = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, p2, src,
        pattern = Some("*.parquet"), files = Some(Seq(s"keep/$one")))
    }
    assert(eBoth.getMessage.contains("not both"), eBoth.getMessage)
    // unsupported FILEFORMAT is refused with the supported list
    // (csv/json are supported since round 14 — avro is not)
    val eFmt = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, p2, src, format = "avro")
    }
    assert(eFmt.getMessage.contains("PARQUET"), eFmt.getMessage)
    // the SQL route carries PATTERN and FILES through
    val p3 = tmpDir("ci_sqlpat_tbl")
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p3,
      WriteOptions(mode = WriteMode.Overwrite))
    val rs = spark.sql(s"COPY INTO graft.`$p3` FROM '$src' " +
      "FILEFORMAT = PARQUET PATTERN = 'keep/*.parquet'").head()
    assert(rs.getLong(1) == 2, rs)
    val oneSkip = fs.listStatus(new org.apache.hadoop.fs.Path(src + "/skip"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted.head
    val rf = spark.sql(s"COPY INTO graft.`$p3` FROM '$src' " +
      s"FILES = ('skip/$oneSkip')").head()
    assert(!rf.isNullAt(0) && rf.getLong(1) == 1, rf)
    assert(GraftTable(spark, p3).toDf().count() > 10)
  }

  test("a FILES entry the data-file filter would drop fails loudly") {
    val src = tmpDir("ci_badfiles_src")
    val p = tmpDir("ci_badfiles_tbl")
    seedSource(src, 0 until 10)
    // a real file that is NOT an ingestible data file (underscore name)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new org.apache.hadoop.fs.Path(src, "_staged.parquet")
    val out = fs.create(staged, true); out.write(1); out.close()
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, p, src,
        files = Some(Seq("_staged.parquet")))
    }
    assert(e.getMessage.contains("not an ingestible"), e.getMessage)
    // the directory walk still skips it silently (listing semantics)
    assert(CopyInto.copyInto(spark, p, src).version.isDefined)
    assert(GraftTable(spark, p).toDf().count() == 10)
  }

  test("log retention folds ingested identities forward — no re-ingest") {
    val src = tmpDir("ci_ret_src")
    val p = tmpDir("ci_ret_tbl")
    seedSource(src, 0 until 30)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    assert(CopyInto.copyInto(spark, p, src).version.isDefined)
    // later activity + a checkpoint boundary ABOVE the COPY commit,
    // then retention prunes it (retain 0ms, clock in the future)
    GraftWriter.write(spark, Seq((1000L, "y")).toDF("id", "s"), p,
      WriteOptions(mode = WriteMode.Append))
    val log = GraftTable(spark, p).log
    log.writeCheckpoint(log.latestVersion().get)
    val removed = log.cleanOldLogs(0L,
      nowMs = System.currentTimeMillis() + 120000L)
    assert(removed.nonEmpty, "retention must actually prune commits")
    // the COPY INTO commit is gone from the log…
    assert(log.versions().forall(v =>
      log.readCommit(v).metadata.get(CopyInto.SourcesKey).isEmpty))
    // …but its identities survived the fold: the re-run is a no-op
    val rerun = CopyInto.copyInto(spark, p, src)
    assert(rerun.version.isEmpty && rerun.ingestedFiles == 0, rerun)
    assert(rerun.skippedFiles > 0)
    assert(GraftTable(spark, p).toDf().count() == 31)
    // genuinely new files still ingest after the fold
    (30 until 40).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(src)
    val more = CopyInto.copyInto(spark, p, src)
    assert(more.version.isDefined && more.ingestedFiles == 1, more)
    assert(GraftTable(spark, p).toDf().count() == 41)
  }

  test("schema mismatch is loud unless mergeSchema; state key is not carried forward") {
    val src = tmpDir("ci_schema_src")
    val p = tmpDir("ci_schema_tbl")
    seedSource(src, 0 until 10)
    GraftWriter.write(spark, Seq((0L, "x")).toDF("id", "s").limit(0), p,
      WriteOptions(mode = WriteMode.Overwrite))
    CopyInto.copyInto(spark, p, src)
    (10 until 20).map(i => (i.toLong, s"row$i", i * 2.0)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("overwrite").parquet(src + "/wide")
    val e = intercept[Exception] { CopyInto.copyInto(spark, p, src) }
    assert(e.getMessage.contains("schema"), e.getMessage)
    val r = CopyInto.copyInto(spark, p, src, mergeSchema = true)
    assert(r.version.isDefined)
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 20)
    assert(t.toDf().columns.contains("extra"))
    // the ingested-set record lives in the COPY INTO commit only; an
    // unrelated later commit must NOT carry (and re-serialize) it
    GraftWriter.write(spark, Seq((99L, "z", 1.0)).toDF("id", "s", "extra"), p,
      WriteOptions(mode = WriteMode.Append))
    val last = t.log.readCommit(t.log.latestVersion().get)
    assert(!last.metadata.contains(CopyInto.SourcesKey),
      "per-commit COPY INTO state leaked into a later commit")
  }

  test("CSV and JSON landing zones read with the target schema; idempotent") {
    val data = (0 until 40).map(i => (i.toLong, s"s$i"))
    val tgtSchema = data.toDF("id", "s").schema

    val csvSrc = tmpDir("ci_csv_src")
    val csvTbl = tmpDir("ci_csv_tbl")
    data.toDF("id", "s").coalesce(2).write.mode("overwrite")
      .option("header", "true").csv(csvSrc)
    GraftWriter.write(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgtSchema),
      csvTbl, WriteOptions(mode = WriteMode.Overwrite))
    val c1 = CopyInto.copyInto(spark, csvTbl, csvSrc, format = "csv")
    assert(c1.version.isDefined && c1.ingestedFiles > 0)
    // target schema wins: id comes back LONG even though every text
    // value also parses as int
    val got = GraftTable(spark, csvTbl).toDf()
    assert(got.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.count() == 40)
    assert(got.as[(Long, String)].collect().toSet == data.toSet)
    val c2 = CopyInto.copyInto(spark, csvTbl, csvSrc, format = "csv")
    assert(c2.version.isEmpty && c2.skippedFiles == c1.ingestedFiles)

    val jsonSrc = tmpDir("ci_json_src")
    val jsonTbl = tmpDir("ci_json_tbl")
    data.toDF("id", "s").coalesce(2).write.mode("overwrite").json(jsonSrc)
    GraftWriter.write(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgtSchema),
      jsonTbl, WriteOptions(mode = WriteMode.Overwrite))
    val j1 = CopyInto.copyInto(spark, jsonTbl, jsonSrc, format = "json")
    assert(j1.version.isDefined && j1.ingestedFiles > 0)
    val gotJ = GraftTable(spark, jsonTbl).toDf()
    assert(gotJ.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(gotJ.as[(Long, String)].collect().toSet == data.toSet)
    assert(CopyInto.copyInto(spark, jsonTbl, jsonSrc, format = "json")
      .version.isEmpty)

    // the parquet filter must NOT admit CSV files and vice versa: a
    // parquet-format run over the CSV source sees no data files
    val none = CopyInto.copyInto(spark, csvTbl, csvSrc)
    assert(none.version.isEmpty && none.ingestedFiles == 0 &&
      none.skippedFiles == 0)
    // SQL route with the format keyword
    val sqlTbl = tmpDir("ci_csv_sql")
    GraftWriter.write(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgtSchema),
      sqlTbl, WriteOptions(mode = WriteMode.Overwrite))
    val row = spark.sql(
      s"COPY INTO graft.`$sqlTbl` FROM '$csvSrc' FILEFORMAT = CSV").head()
    assert(!row.isNullAt(0) && row.getLong(1) == c1.ingestedFiles)
    assert(GraftTable(spark, sqlTbl).toDf().count() == 40)
    // unsupported format stays loud
    val e = intercept[IllegalArgumentException] {
      CopyInto.copyInto(spark, csvTbl, csvSrc, format = "avro")
    }
    assert(e.getMessage.contains("PARQUET/JSON/CSV"))
  }

  test("text-format hazards are loud: headerless CSV, reordered header, bad JSON") {
    val data = (0 until 20).map(i => (i.toLong, s"s$i"))
    val tgtSchema = data.toDF("id", "s").schema
    def freshTbl(tag: String): String = {
      val p = tmpDir(s"ci_tf_$tag")
      GraftWriter.write(spark, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tgtSchema),
        p, WriteOptions(mode = WriteMode.Overwrite))
      p
    }

    // headerless CSV (Spark's own write default): the header=true
    // default would eat the first row of every file — FORMAT_OPTIONS
    // ('header' = 'false') ingests everything
    val noHead = tmpDir("ci_tf_nohead_src")
    data.toDF("id", "s").coalesce(1).write.mode("overwrite").csv(noHead)
    val p1 = freshTbl("nohead")
    spark.sql(s"COPY INTO graft.`$p1` FROM '$noHead' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'false')").collect()
    assert(GraftTable(spark, p1).toDf().count() == 20,
      "headerless ingest must not drop rows")

    // a malformed (unquoted) option must be REFUSED, not silently
    // dropped — 'header' = false ignored would re-enable the default
    // and eat the first row of every file
    val eOpt = intercept[Exception] {
      spark.sql(s"COPY INTO graft.`${freshTbl("badopt")}` FROM '$noHead' " +
        "FILEFORMAT = CSV FORMAT_OPTIONS ('header' = false)")
    }
    assert(eOpt.getMessage.contains("both quoted"), eOpt.getMessage)

    // reordered header: enforceSchema=false validates NAMES against the
    // target schema instead of silently mapping by position
    val reorder = tmpDir("ci_tf_reorder_src")
    data.toDF("id", "s").select("s", "id").coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(reorder)
    val p2 = freshTbl("reorder")
    val eReorder = intercept[Throwable] {
      CopyInto.copyInto(spark, p2, reorder, format = "csv")
    }
    assert(GraftTable(spark, p2).toDf().count() == 0,
      s"reordered columns must not half-ingest: $eReorder")

    // JSON whose fields don't match the target schema: FAILFAST aborts
    // instead of committing all-NULL rows (the PERMISSIVE hazard)
    val badJson = tmpDir("ci_tf_badjson_src")
    data.toDF("a", "b").coalesce(1).write.mode("overwrite").json(badJson)
    val p3 = freshTbl("badjson")
    intercept[Throwable] {
      CopyInto.copyInto(spark, p3, badJson, format = "json")
    }
    assert(GraftTable(spark, p3).toDf().count() == 0,
      "mismatched JSON must not commit NULL rows")
  }
}
