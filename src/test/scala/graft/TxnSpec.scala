package graft

import org.apache.spark.sql.functions._

import graft.io._

/** Idempotent writer transactions (Delta's `txnAppId`/`txnVersion`
  * SetTransaction pattern): replay no-ops, per-app namespaces,
  * retention survival, and the streaming sink's exactly-once handshake.
  */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong, tag)).toDF("k", "v")

  private def txnOpts(app: String, ver: Long) = WriteOptions(
    mode = WriteMode.Append, txnAppId = Some(app), txnVersion = Some(ver))

  test("same (appId, version) replay is a no-op; higher version applies") {
    val p = tmpDir("txn_replay")
    val v0 = GraftWriter.write(spark, rows(3, "b0"), p, txnOpts("app1", 0L))
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 3)
    assert(t.txnVersion("app1").contains(0L))

    // crashed-writer replay of batch 0: nothing appends, version holds
    val vReplay = GraftWriter.write(spark, rows(3, "b0"), p, txnOpts("app1", 0L))
    assert(vReplay == v0)
    assert(t.toDf().count() == 3)

    // batch 1 applies and advances the marker
    val v1 = GraftWriter.write(spark, rows(2, "b1"), p, txnOpts("app1", 1L))
    assert(v1 == v0 + 1)
    assert(t.toDf().count() == 5)
    assert(t.txnVersion("app1").contains(1L))

    // a LOWER version arriving late (reordered replay) is also a no-op
    assert(GraftWriter.write(spark, rows(9, "b0"), p, txnOpts("app1", 0L)) == v1)
    assert(t.toDf().count() == 5)
  }

  test("appIds are independent namespaces") {
    val p = tmpDir("txn_apps")
    GraftWriter.write(spark, rows(2, "a"), p, txnOpts("appA", 7L))
    // appB has never written: its version 7 applies even though appA's
    // marker is already at 7
    GraftWriter.write(spark, rows(2, "b"), p, txnOpts("appB", 7L))
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 4)
    assert(t.txnVersion("appA").contains(7L))
    assert(t.txnVersion("appB").contains(7L))
    assert(t.txnVersion("appC").isEmpty)
    // replays of both stay no-ops
    GraftWriter.write(spark, rows(2, "a"), p, txnOpts("appA", 7L))
    GraftWriter.write(spark, rows(2, "b"), p, txnOpts("appB", 6L))
    assert(t.toDf().count() == 4)
  }

  test("txn marker survives checkpoints and log retention") {
    val p = tmpDir("txn_retention")
    GraftWriter.write(spark, rows(1, "t"), p, txnOpts("app", 5L))
    // 24 plain appends roll past checkpoint boundaries
    (0 until 24).foreach { i =>
      GraftWriter.write(spark, rows(1, s"x$i"), p,
        WriteOptions(mode = WriteMode.Append))
    }
    val log = new graft.log.CommitLog(p, spark.sessionState.newHadoopConf())
    val future = System.currentTimeMillis() + 30L * 24 * 3600 * 1000
    assert(log.cleanOldLogs(1000L, nowMs = future).nonEmpty)
    // the txn-recording commit is long pruned; the carried property
    // still guards the replay
    val t = GraftTable(spark, p)
    assert(t.txnVersion("app").contains(5L))
    val before = t.toDf().count()
    GraftWriter.write(spark, rows(1, "t"), p, txnOpts("app", 5L))
    assert(t.toDf().count() == before)
  }

  test("invalid txn options are refused; SHOW CREATE omits the markers") {
    val p = tmpDir("txn_invalid")
    intercept[IllegalArgumentException] {
      GraftWriter.write(spark, rows(1, "x"), p,
        WriteOptions(txnAppId = Some("a")))
    }
    intercept[IllegalArgumentException] {
      GraftWriter.write(spark, rows(1, "x"), p,
        WriteOptions(txnVersion = Some(1L)))
    }
    intercept[IllegalArgumentException] {
      GraftWriter.write(spark, rows(1, "x"), p, txnOpts("", 1L))
    }
    GraftWriter.write(spark, rows(1, "x"), p, txnOpts("myapp", 1L))
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$p`")
      .collect().head.getString(0)
    assert(!ddl.contains("graft.txn."), s"txn marker leaked into DDL: $ddl")
    // but DESCRIBE DETAIL (operational view) does surface it
    val props = spark.sql(s"DESCRIBE DETAIL graft.`$p`")
      .collect().head.getAs[String]("properties")
    assert(props.contains("graft.txn.myapp=1"))
  }

  test("txn guards non-append modes too: replayed overwrite is a no-op") {
    val p = tmpDir("txn_overwrite")
    GraftWriter.write(spark, rows(5, "seed"), p,
      WriteOptions(mode = WriteMode.Append))
    val v1 = GraftWriter.write(spark, rows(3, "day1"), p, WriteOptions(
      mode = WriteMode.Overwrite,
      txnAppId = Some("etl"), txnVersion = Some(1L)))
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 3)
    // the crashed-job replay of the SAME overwrite must not run again
    // (a second overwrite would be harmless here, but the guard also
    // proves the marker rode the overwrite commit)
    assert(GraftWriter.write(spark, rows(9, "day1-replay"), p, WriteOptions(
      mode = WriteMode.Overwrite,
      txnAppId = Some("etl"), txnVersion = Some(1L))) == v1)
    assert(t.toDf().count() == 3)
    assert(t.toDf().filter(col("v") === "day1").count() == 3)
  }

  test("commit-level primitive: replayed txn throws TxnAlreadyApplied atomically") {
    val p = tmpDir("txn_primitive")
    GraftWriter.write(spark, rows(1, "x"), p,
      WriteOptions(mode = WriteMode.Append))
    val log = new graft.log.CommitLog(p, spark.sessionState.newHadoopConf())
    val snap = log.snapshot()
    def metaCommit(txn: (String, Long)): Long = log.commit(
      operation = "WRITE", mode = "append", schemaDdl = snap.schema.toDDL,
      partitionColumns = Nil, metadata = Map.empty,
      operationMetrics = Map.empty, add = Nil, remove = Nil,
      txn = Some(txn))
    val v1 = metaCommit("app" -> 3L)
    // the check runs between the head read and the atomic publish: a
    // same-or-lower replay is rejected BEFORE claiming a version
    val e = intercept[graft.log.TxnAlreadyApplied] { metaCommit("app" -> 3L) }
    assert(e.tableVersion == v1)
    intercept[graft.log.TxnAlreadyApplied] { metaCommit("app" -> 2L) }
    assert(log.latestVersion().contains(v1), "rejected replays claim no version")
    assert(metaCommit("app" -> 4L) == v1 + 1)
    assert(log.tableProperties()(graft.log.CommitLog.txnKey("app")) == "4")
  }

  test("streaming sink replays through the txn guard, per-checkpoint appId") {
    val src = tmpDir("txn_sink") + "/src"
    val dst = tmpDir("txn_sink") + "/dst"
    val ckpt = tmpDir("txn_sink_ckpt")
    GraftWriter.write(spark, rows(4, "s"), src,
      WriteOptions(mode = WriteMode.Append))
    def run(): Unit = {
      val q = graft.streaming.Streams.toGraftTable(
        spark.readStream.format("graft").load(src), dst, ckpt)
      q.awaitTermination()
    }
    run()
    val t = GraftTable(spark, dst)
    assert(t.toDf().count() == 4)
    val appId = s"graft-stream-sink:$ckpt"
    val recorded = t.txnVersion(appId)
    assert(recorded.isDefined, "sink must record its txn marker")
    // an idle restart neither duplicates nor drops
    run()
    assert(t.toDf().count() == 4)
    // simulate a crashed writer replaying its last batch OUTSIDE the
    // stream: the atomic guard no-ops it
    GraftWriter.write(spark, rows(4, "s"), dst, WriteOptions(
      mode = WriteMode.Append,
      txnAppId = Some(appId), txnVersion = recorded))
    assert(t.toDf().count() == 4)
  }
}
