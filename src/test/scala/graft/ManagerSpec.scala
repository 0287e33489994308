package graft

import java.sql.Timestamp

import graft.core._
import graft.io._
import graft.manager._
import graft.merge._

/** Ports the reference's IO-manager behavioral contracts (SURVEY §5):
  * schema precedence, root_name override, per-output mode override,
  * partitioned materialization (write-pin) + partitioned load (read
  * range), column-pruned input, and merge-through-manager.
  */
class ManagerSpec extends SparkSpec {
  import spark.implicits._
  import TypeHandlers._

  private def mgr(root: String, schema: Option[String] = None) =
    new GraftIOManager(spark, root, schema)

  private def abDf = Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("a", "b")

  test("schema precedence: metadata > manager schema > key prefix > public") {
    val root = tmpDir("mgrp")
    val m = mgr(root)
    // key prefix
    assert(m.resolveSlice(OutputContext(AssetKey(Seq("pre", "t1")))).schema == "pre")
    // bare key -> public
    assert(m.resolveSlice(OutputContext(AssetKey(Seq("t1")))).schema == "public")
    // manager schema beats prefix
    assert(mgr(root, Some("cfg"))
      .resolveSlice(OutputContext(AssetKey(Seq("pre", "t1")))).schema == "cfg")
    // metadata beats everything
    assert(mgr(root, Some("cfg")).resolveSlice(OutputContext(
      AssetKey(Seq("pre", "t1")), Map("schema" -> "meta"))).schema == "meta")
    // root_name overrides table name
    assert(m.resolveSlice(OutputContext(
      AssetKey(Seq("t1")), Map("root_name" -> "real"))).table == "real")
  }

  test("output lands at root/<schema>/<table>; round trip through handler") {
    val root = tmpDir("mgrt")
    val m = mgr(root)
    val ctx = OutputContext(AssetKey(Seq("sch", "tab")))
    m.handleOutput(ctx, abDf)
    assert(new java.io.File(s"$root/sch/tab/_graft_log").exists())
    val back = m.loadInput[org.apache.spark.sql.DataFrame](ctx)
    assert(back.count() == 3)
  }

  test("per-output mode override: append after default overwrite") {
    val root = tmpDir("mgrm")
    val m = mgr(root)
    val key = AssetKey(Seq("s", "t"))
    m.handleOutput(OutputContext(key), abDf)
    m.handleOutput(OutputContext(key, Map("mode" -> "append")), abDf)
    assert(m.loadInput[org.apache.spark.sql.DataFrame](OutputContext(key)).count() == 6)
    // run default (overwrite) again: idempotent re-materialization
    m.handleOutput(OutputContext(key), abDf)
    assert(m.loadInput[org.apache.spark.sql.DataFrame](OutputContext(key)).count() == 3)
  }

  test("partitioned output pins its window; partitioned input loads only the window") {
    val root = tmpDir("mgrw")
    val m = mgr(root)
    val key = AssetKey(Seq("s", "daily"))
    def win(d: String, d2: String) = TimeWindowDimension("time", Seq(TimeWindow(
      Timestamp.valueOf(s"$d 00:00:00"), Timestamp.valueOf(s"$d2 00:00:00"))))
    def day(d: String, v: Long) =
      Seq((Timestamp.valueOf(s"$d 00:00:00"), v)).toDF("time", "b")

    m.handleOutput(OutputContext(key, partitionDimensions = Seq(win("2022-01-01", "2022-01-02"))),
      day("2022-01-01", 1))
    m.handleOutput(OutputContext(key, partitionDimensions = Seq(win("2022-01-02", "2022-01-03"))),
      day("2022-01-02", 2))
    // re-materialize older window with new value: replaces only that window
    m.handleOutput(OutputContext(key, partitionDimensions = Seq(win("2022-01-01", "2022-01-02"))),
      day("2022-01-01", 9))
    val all = m.loadInput[org.apache.spark.sql.DataFrame](OutputContext(key))
    assert(all.orderBy("time").select("b").as[Long].collect().toSeq == Seq(9L, 2L))
    // windowed input: only [01-02, 01-03)
    val slice = OutputContext(key, partitionDimensions = Seq(win("2022-01-02", "2022-01-03")))
    assert(m.loadInput[org.apache.spark.sql.DataFrame](slice)
      .select("b").as[Long].collect().toSeq == Seq(2L))
  }

  test("column-pruned input (columns metadata)") {
    val root = tmpDir("mgrc")
    val m = mgr(root)
    val key = AssetKey(Seq("s", "t"))
    m.handleOutput(OutputContext(key), abDf)
    val pruned = m.loadInput[org.apache.spark.sql.DataFrame](
      OutputContext(key, columns = Some(Seq("a"))))
    assert(pruned.columns.toSeq == Seq("a"))
  }

  test("partitioned asset without partition dimensions is rejected") {
    val m = mgr(tmpDir("mgrpe"))
    val e = intercept[IllegalArgumentException] {
      m.handleOutput(
        OutputContext(AssetKey(Seq("t_parts")), hasAssetPartitions = true), abDf)
    }
    assert(e.getMessage.contains("has partitions"))
    // with dimensions resolved, the same context writes fine
    val dims = Seq(StaticDimension("a", Seq("1", "2", "3")))
    m.handleOutput(OutputContext(AssetKey(Seq("t_parts")),
      hasAssetPartitions = true, partitionDimensions = dims), abDf)
    assert(GraftTable(spark, m.pathFor(
      m.resolveSlice(OutputContext(AssetKey(Seq("t_parts")))))).toDf().count() == 3)
  }

  test("streamed-batch carrier round-trips; reads pull batches lazily") {
    val root = tmpDir("mgrbatch")
    val m = mgr(root)
    implicit val h: TypeHandler[RowBatches] =
      TypeHandlers.rowBatchesHandler(batchRows = 4)
    val ctx = OutputContext(AssetKey(Seq("s", "batched")))
    // write: ten rows arriving as three driver-side batches
    val rows = (1L to 10L).map(i => org.apache.spark.sql.Row(i, i * 2))
    val schema = abDf.schema
    m.handleOutput(ctx, RowBatches(schema, rows.grouped(4)))
    // load: batches stream back (grouped(4) over the local iterator)
    val back = m.loadInput[RowBatches](ctx)
    assert(back.schema.fieldNames.toSeq == Seq("a", "b"))
    val batches = back.batches.toSeq
    assert(batches.forall(_.size <= 4))
    assert(batches.flatten.map(r => (r.getLong(0), r.getLong(1))).sorted ==
      (1L to 10L).map(i => (i, i * 2)))
    // and the carrier composes with the DataFrame surface
    assert(GraftTable(spark, m.pathFor(m.resolveSlice(ctx))).toDf().count() == 10)
  }

  test("per-output compression override reaches the parquet writer") {
    val root = tmpDir("mgrc")
    val m = mgr(root)
    m.handleOutput(OutputContext(AssetKey(Seq("t_snappy")),
      metadata = Map("compression" -> "snappy")), abDf)
    val t = GraftTable(spark, s"$root/public/t_snappy")
    val files = t.snapshot().files.map(_.path)
    assert(files.nonEmpty && files.forall(_.contains("snappy")),
      s"expected snappy-codec files, got $files")
    // and the override is not leaked into commit metadata
    assert(!t.history().head.metadata.contains("compression"))
  }

  test("merge mode through manager with per-output predicate override") {
    val root = tmpDir("mgrg")
    val m = new GraftIOManager(spark, root,
      mergeConfig = Some(MergeConfig(MergeType.Upsert, "s.a = t.a")))
    val key = AssetKey(Seq("s", "t"))
    m.handleOutput(OutputContext(key, Map("mode" -> "overwrite")), abDf)
    m.handleOutput(OutputContext(key, Map("mode" -> "merge")),
      Seq((3L, 99L), (4L, 7L)).toDF("a", "b"))
    val back = m.loadInput[org.apache.spark.sql.DataFrame](OutputContext(key))
    assert(back.orderBy("a").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 4L), (2L, 5L), (3L, 99L), (4L, 7L)))
  }
}
