package graft

import org.apache.spark.sql.functions._

import graft.io._
import graft.log.{CommitLog, Protocol}
import graft.merge.Dml

/** Reader/writer table-feature gates: DV usage auto-registers the
  * feature, unknown required features fail loudly on read/modify, and
  * pre-feature tables/versions replay unchecked.
  */
class ProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def newLog(p: String) =
    new CommitLog(p, spark.sessionState.newHadoopConf())

  private def writeSmall(p: String, dv: Boolean): Unit = {
    // one file: a partial delete must produce a DV, not a full-file drop
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").coalesce(1)
    val meta = if (dv) Map(DeletionVectors.PropKey -> "true") else Map.empty[String, String]
    GraftWriter.write(spark, df, p,
      WriteOptions(mode = WriteMode.Overwrite, metadata = meta))
  }

  test("DV commit auto-registers deletionVectors reader+writer features") {
    val p = tmpDir("proto_dv")
    writeSmall(p, dv = true)
    val log = newLog(p)
    assert(Protocol.parse(log.tableProperties(), Protocol.ReaderFeaturesKey).isEmpty)
    Dml.delete(spark, p, col("id") === 2L)
    val props = log.tableProperties()
    assert(Protocol.parse(props, Protocol.ReaderFeaturesKey) == Set(Protocol.DeletionVectors))
    assert(Protocol.parse(props, Protocol.WriterFeaturesKey) == Set(Protocol.DeletionVectors))
    // still readable and writable by this build (it supports DVs)
    assert(GraftTable(spark, p).toDf().count() == 2)
    GraftWriter.write(spark, Seq((4L, "d")).toDF("id", "s"), p,
      WriteOptions(mode = WriteMode.Append))
    assert(GraftTable(spark, p).toDf().count() == 3)
    // features carried forward through the unrelated append
    assert(Protocol.parse(newLog(p).tableProperties(),
      Protocol.ReaderFeaturesKey) == Set(Protocol.DeletionVectors))
  }

  test("DROP FEATURE removes deletionVectors only once provably unused") {
    val p = tmpDir("proto_dropfeat")
    writeSmall(p, dv = true)
    Dml.delete(spark, p, col("id") === 2L)
    val log = newLog(p)
    assert(Protocol.parse(log.tableProperties(),
      Protocol.ReaderFeaturesKey) == Set(Protocol.DeletionVectors))
    // retained commits still carry DVs -> refused loudly
    val e1 = intercept[IllegalArgumentException] {
      graft.io.Alter.dropFeature(spark, p, Protocol.DeletionVectors)
    }
    assert(e1.getMessage.contains("deletion vectors"), e1.getMessage)
    // OPTIMIZE purges the live DV, but the DV COMMIT is still in the log
    GraftWriter.optimize(spark, p)
    val e2 = intercept[IllegalArgumentException] {
      graft.io.Alter.dropFeature(spark, p, Protocol.DeletionVectors)
    }
    assert(e2.getMessage.contains("retained commits"), e2.getMessage)
    // age the pre-purge history out; the proof obligation is now met
    newLog(p).writeCheckpoint(newLog(p).latestVersion().get)
    val future = System.currentTimeMillis() + 30L * 24 * 3600 * 1000
    newLog(p).cleanOldLogs(1000L, nowMs = future)
    val v = graft.io.Alter.dropFeature(spark, p, Protocol.DeletionVectors)
    val props = newLog(p).tableProperties()
    assert(Protocol.parse(props, Protocol.ReaderFeaturesKey).isEmpty)
    assert(Protocol.parse(props, Protocol.WriterFeaturesKey).isEmpty)
    assert(!props.contains(graft.log.CommitLog.ReservedPrefix + "dv"))
    assert(GraftTable(spark, p).toDf().count() == 2)
    // a follow-up DELETE goes copy-on-write and re-registers nothing
    Dml.delete(spark, p, col("id") === 1L)
    assert(Protocol.parse(newLog(p).tableProperties(),
      Protocol.ReaderFeaturesKey).isEmpty)
    assert(GraftTable(spark, p).toDf().count() == 1)
    // the SQL surface routes the same way (on a fresh non-DV table the
    // drop is vacuously legal and a no-op on the feature sets)
    val p2 = tmpDir("proto_dropfeat2")
    writeSmall(p2, dv = false)
    assert(spark.sql(
      s"ALTER TABLE graft.`$p2` DROP FEATURE deletionVectors")
      .head().getLong(0) > 0)
    // unsupported feature names are refused
    val e3 = intercept[IllegalArgumentException] {
      graft.io.Alter.dropFeature(spark, p, "typeWidening")
    }
    assert(e3.getMessage.contains("cannot be proven unused"), e3.getMessage)
    assert(v > 0)
  }

  test("DROP FEATURE refused while the live snapshot carries DVs even after log pruning") {
    // Bypass attempt: delete with DVs, do NOT run OPTIMIZE, then age the
    // DV-attaching commits out of the retained log past a checkpoint.
    // The retained-commit scan finds nothing, but the CURRENT snapshot
    // still carries live DVs — the drop must still be refused, or a
    // pre-DV build reading the table resurrects the deleted row.
    val p = tmpDir("proto_dropfeat_live")
    writeSmall(p, dv = true)
    Dml.delete(spark, p, col("id") === 2L)
    // an unrelated append bumps the log past the DV-attaching commit so
    // retention can prune it while the DV'd FILE stays live
    GraftWriter.write(spark, Seq((9L, "z")).toDF("id", "s"), p,
      WriteOptions(mode = WriteMode.Append))
    newLog(p).writeCheckpoint(newLog(p).latestVersion().get)
    val future = System.currentTimeMillis() + 30L * 24 * 3600 * 1000
    newLog(p).cleanOldLogs(1000L, nowMs = future)
    // precondition of the scenario: the DV-attaching commit is gone
    val log = newLog(p)
    assert(!log.versions().exists(v => log.readCommit(v).add.exists(_.dv.isDefined)))
    assert(log.snapshot().files.exists(_.dv.isDefined))
    val e = intercept[IllegalArgumentException] {
      graft.io.Alter.dropFeature(spark, p, Protocol.DeletionVectors)
    }
    assert(e.getMessage.contains("live file"), e.getMessage)
    // deleted row stays deleted (3 original - 1 deleted + 1 appended)
    assert(GraftTable(spark, p).toDf().count() == 3)
    // OPTIMIZE purges the live DV; now the drop is legal
    GraftWriter.optimize(spark, p)
    newLog(p).writeCheckpoint(newLog(p).latestVersion().get)
    newLog(p).cleanOldLogs(1000L, nowMs = future + 1000L)
    assert(graft.io.Alter.dropFeature(spark, p, Protocol.DeletionVectors) > 0)
    assert(GraftTable(spark, p).toDf().count() == 3)
  }

  test("unknown required reader feature fails reads; writer-only feature fails modify but reads fine") {
    val pR = tmpDir("proto_r")
    writeSmall(pR, dv = false)
    newLog(pR).commit(
      operation = "SET FEATURES", mode = "metadata",
      schemaDdl = newLog(pR).snapshot().schema.toDDL,
      partitionColumns = Nil,
      metadata = Map(Protocol.ReaderFeaturesKey -> "futureColumnarV9"),
      operationMetrics = Map.empty, add = Nil, remove = Nil)
    val eR = intercept[UnsupportedOperationException] {
      GraftTable(spark, pR).toDf().count()
    }
    assert(eR.getMessage.contains("futureColumnarV9"))

    val pW = tmpDir("proto_w")
    writeSmall(pW, dv = false)
    newLog(pW).commit(
      operation = "SET FEATURES", mode = "metadata",
      schemaDdl = newLog(pW).snapshot().schema.toDDL,
      partitionColumns = Nil,
      metadata = Map(Protocol.WriterFeaturesKey -> "futureWriterV9"),
      operationMetrics = Map.empty, add = Nil, remove = Nil)
    // reads fine — reader features are unconstrained
    assert(GraftTable(spark, pW).toDf().count() == 3)
    val eW = intercept[UnsupportedOperationException] {
      GraftWriter.write(spark, Seq((9L, "z")).toDF("id", "s"), pW,
        WriteOptions(mode = WriteMode.Append))
    }
    assert(eW.getMessage.contains("futureWriterV9"))
  }

  test("time travel below a feature's introduction stays readable") {
    val p = tmpDir("proto_tt")
    writeSmall(p, dv = false)
    val v0 = GraftTable(spark, p).version()
    newLog(p).commit(
      operation = "SET FEATURES", mode = "metadata",
      schemaDdl = newLog(p).snapshot().schema.toDDL,
      partitionColumns = Nil,
      metadata = Map(Protocol.ReaderFeaturesKey -> "futureColumnarV9"),
      operationMetrics = Map.empty, add = Nil, remove = Nil)
    intercept[UnsupportedOperationException] {
      GraftTable(spark, p).toDf().count()
    }
    // the pre-feature version replays with pre-feature metadata
    assert(GraftTable(spark, p).toDf(Some(v0)).count() == 3)
  }
}
