package graft

import org.apache.spark.sql.functions._

import graft.io._
import graft.merge.Dml

/** Shallow clones: zero-copy creation, independent divergence in both
  * directions, property/constraint/DV inheritance, vacuum safety
  * (external references are never physically deleted), and the SQL
  * `CREATE TABLE ... SHALLOW CLONE` route.
  */
class CloneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def orders = spark.read.parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_orderstatus", "o_totalprice")

  private def parquetCount(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists()) 0
    else {
      val out = scala.collection.mutable.ArrayBuffer[java.io.File]()
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) out += f
      walk(d)
      out.size
    }
  }

  test("shallow clone is zero-copy and pins the source version") {
    val src = tmpDir("clone_src")
    val dst = tmpDir("clone_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus")))
    val srcCount = GraftTable(spark, src).toDf().count()

    val v = Clone.shallow(spark, src, dst)
    assert(v == 0L)
    // no data bytes moved: the clone dir holds only the log
    assert(parquetCount(dst) == 0)
    assert(GraftTable(spark, dst).toDf().count() == srcCount)

    // source commits AFTER the clone point are invisible to the clone
    GraftWriter.write(spark, orders.limit(10), src,
      WriteOptions(mode = WriteMode.Append))
    assert(GraftTable(spark, src).toDf().count() == srcCount + 10)
    assert(GraftTable(spark, dst).toDf().count() == srcCount)

    // filters prune partitions/files through the cloned metadata
    val f = GraftTable(spark, dst).toDf().filter(col("o_orderstatus") === "F")
    assert(f.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("clone at an old version sees that version's data and properties") {
    val src = tmpDir("clone_v_src")
    val dst = tmpDir("clone_v_dst")
    GraftWriter.write(spark, orders.limit(100), src,
      WriteOptions(mode = WriteMode.Overwrite))
    GraftWriter.write(spark, orders.limit(50), src,
      WriteOptions(mode = WriteMode.Append))
    Clone.shallow(spark, src, dst, versionAsOf = Some(0L))
    assert(GraftTable(spark, dst).toDf().count() == 100)
  }

  test("DML on the clone diverges locally; the source is untouched") {
    val src = tmpDir("clone_dml_src")
    val dst = tmpDir("clone_dml_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus")))
    val srcCount = GraftTable(spark, src).toDf().count()
    val srcFiles = parquetCount(src)
    Clone.shallow(spark, src, dst)

    val cut = srcCount -
      orders.filter(!(col("o_totalprice") > 150000.0)).count()
    assert(cut > 0)
    Dml.delete(spark, dst, col("o_totalprice") > 150000.0)
    assert(GraftTable(spark, dst).toDf().count() == srcCount - cut)
    // source rows and physical files are exactly as before
    assert(GraftTable(spark, src).toDf().count() == srcCount)
    assert(parquetCount(src) == srcFiles)

    // OPTIMIZE localizes the clone: rewritten data lands under dst
    GraftWriter.optimize(spark, dst)
    assert(parquetCount(dst) > 0)
    assert(parquetCount(src) == srcFiles)
    assert(GraftTable(spark, dst).snapshot().files.forall(f =>
      !GraftTable.isExternalRef(f.path)))
    assert(GraftTable(spark, dst).toDf().count() == srcCount - cut)
  }

  test("vacuum on a clone never deletes source files") {
    val src = tmpDir("clone_vac_src")
    val dst = tmpDir("clone_vac_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus")))
    val srcFiles = parquetCount(src)
    Clone.shallow(spark, src, dst)
    // rewrite everything locally, tombstoning every absolute reference
    GraftWriter.optimize(spark, dst)
    val deleted = GraftTable(spark, dst).vacuumOlderThan(
      0L, nowMs = System.currentTimeMillis() + 1000L, enforceRetention = false)
    assert(deleted.forall(p => !GraftTable.isExternalRef(p)))
    assert(parquetCount(src) == srcFiles)
    // the source still reads fine
    assert(GraftTable(spark, src).toDf().count() == orders.count())
  }

  test("VACUUM DRY RUN on a shallow clone surfaces the source-vacuum hazard") {
    val src = tmpDir("clone_note_src")
    val dst = tmpDir("clone_note_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus")))
    Clone.shallow(spark, src, dst)
    val out = spark.sql(s"VACUUM graft.`$dst` DRY RUN").collect().map(_.getString(0))
    assert(out.exists(_.contains("outside this table root")),
      s"expected a shallow-clone note, got: ${out.mkString("; ")}")
    // localizing removes the external refs -> the note disappears
    GraftWriter.optimize(spark, dst)
    val after = spark.sql(s"VACUUM graft.`$dst` DRY RUN").collect().map(_.getString(0))
    assert(!after.exists(_.contains("outside this table root")))
    // a REAL vacuum never emits the note row (nothing to misparse as a path)
    val real = spark.sql(s"VACUUM graft.`$dst`").collect().map(_.getString(0))
    assert(!real.exists(_.startsWith("-- note")))
  }

  test("clone inherits constraints and deletion-vector state") {
    val src = tmpDir("clone_prop_src")
    val dst = tmpDir("clone_prop_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(DeletionVectors.PropKey -> "true")))
    GraftWriter.addCheckConstraint(spark, src, "pos_price", "o_totalprice > 0")
    // DV-delete in the source BEFORE cloning: the clone must reference
    // both the data file and its deletion vector
    Dml.delete(spark, src, col("o_totalprice") > 150000.0)
    val liveSrc = GraftTable(spark, src).toDf().count()
    assert(GraftTable(spark, src).snapshot().files.exists(_.dv.isDefined))

    Clone.shallow(spark, src, dst)
    val t = GraftTable(spark, dst)
    assert(t.toDf().count() == liveSrc)
    assert(t.snapshot().files.exists(_.dv.isDefined))
    // constraint carried: violating append fails on the CLONE
    val bad = spark.range(1).select(
      lit(-1L).as("o_orderkey"), lit("F").as("o_orderstatus"),
      lit(-5.0).as("o_totalprice"))
    intercept[Exception] {
      GraftWriter.write(spark, bad, dst, WriteOptions(mode = WriteMode.Append))
    }
    // DV property carried: a clone-side delete is merge-on-read too —
    // it bitmaps rows INSIDE the source-referenced files (no rewrite)
    val before = t.snapshot().files.map(_.path).toSet
    val expect = orders
      .filter(!(col("o_totalprice") > 150000.0))
      .filter(!(col("o_totalprice") < 100000.0)).count()
    assert(expect > 0 && expect < liveSrc) // the delete must really bite
    Dml.delete(spark, dst, col("o_totalprice") < 100000.0)
    val after = GraftTable(spark, dst)
    assert(after.toDf().count() == expect)
    assert(after.snapshot().files.forall(f => before(f.path)))
    // and the source still serves its own live set
    assert(GraftTable(spark, src).toDf().count() == liveSrc)
  }

  test("deep clone is self-contained: source vacuum/drop cannot break it") {
    val src = tmpDir("clone_deep_src")
    val dst = tmpDir("clone_deep_dst")
    GraftWriter.write(spark, orders, src,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus"),
        metadata = Map(DeletionVectors.PropKey -> "true")))
    // a DV in the source must be copied and honored by the clone
    Dml.delete(spark, src, col("o_totalprice") > 150000.0)
    val liveSrc = GraftTable(spark, src).toDf().count()
    val srcSum = GraftTable(spark, src).toDf()
      .agg(sum(col("o_totalprice"))).head().getDouble(0)

    val v = Clone.deep(spark, src, dst)
    assert(v == 0L)
    // bytes really copied, refs all local
    assert(parquetCount(dst) > 0)
    val t = GraftTable(spark, dst)
    assert(t.snapshot().files.forall(f => !GraftTable.isExternalRef(f.path) &&
      f.dv.forall(d => !GraftTable.isExternalRef(d.path))))
    assert(t.snapshot().files.exists(_.dv.isDefined))
    assert(t.toDf().count() == liveSrc)
    assert(t.toDf().agg(sum(col("o_totalprice"))).head().getDouble(0) == srcSum)

    // nuke the source entirely — the deep clone must be unaffected
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(src))
    assert(GraftTable(spark, dst).toDf().count() == liveSrc)
    // partition pruning works on the copied layout
    val f = GraftTable(spark, dst).toDf().filter(col("o_orderstatus") === "F")
    assert(f.count() > 0)
  }

  test("deep clone of a shallow clone localizes the absolute references") {
    val base = tmpDir("clone_deep2_base")
    val shal = tmpDir("clone_deep2_shallow")
    val deep = tmpDir("clone_deep2_deep")
    GraftWriter.write(spark, orders, base,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("o_orderstatus")))
    val n = GraftTable(spark, base).toDf().count()
    Clone.shallow(spark, base, shal)
    assert(GraftTable(spark, shal).snapshot().files
      .forall(f => GraftTable.isExternalRef(f.path)))
    spark.sql(s"CREATE TABLE graft.`$deep` DEEP CLONE graft.`$shal`")
    val t = GraftTable(spark, deep)
    assert(t.snapshot().files.forall(f => !GraftTable.isExternalRef(f.path)))
    // rebuilt hive layout keeps partition pruning + values intact
    assert(t.snapshot().files.forall(_.path.contains("o_orderstatus=")))
    assert(t.toDf().count() == n)
    assert(t.toDf().filter(col("o_orderstatus") === "O").count() ==
      orders.filter(col("o_orderstatus") === "O").count())
  }

  test("destination collision fails loudly; SQL route with VERSION AS OF works") {
    val src = tmpDir("clone_sql_src")
    val dst = tmpDir("clone_sql_dst")
    GraftWriter.write(spark, orders.limit(20), src,
      WriteOptions(mode = WriteMode.Overwrite))
    GraftWriter.write(spark, orders.limit(5), src,
      WriteOptions(mode = WriteMode.Append))

    val v = spark.sql(
      s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src` VERSION AS OF 0")
      .head().getLong(0)
    assert(v == 0L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dst`").head().getLong(0) == 20L)

    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`")
    }
    // IF NOT EXISTS degrades to a no-op
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$dst` SHALLOW CLONE graft.`$src`")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dst`").head().getLong(0) == 20L)

    // provenance is visible in the clone's history
    val c0 = GraftTable(spark, dst).history().find(_.version == 0L).get
    assert(c0.operation == "CLONE")
    assert(c0.metadata.contains("cloneSource"))
    assert(c0.metadata("cloneSourceVersion") == "0")
  }
}
