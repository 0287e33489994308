package graft

import org.apache.spark.sql.DataFrame

import graft.config._
import graft.io._
import graft.manager._

class CoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def abDf = Seq((1L, 4L), (2L, 5L)).toDF("a", "b")

  test("storage configs render the expected hadoop keys") {
    val s3 = S3Config(
      accessKeyId = Some("AK"), secretAccessKey = Some("SK"),
      endpoint = Some("http://minio:9000"), pathStyleAccess = true)
    assert(s3.hadoopOptions("fs.s3a.access.key") == "AK")
    assert(s3.hadoopOptions("fs.s3a.endpoint") == "http://minio:9000")
    assert(s3.hadoopOptions("fs.s3a.path.style.access") == "true")
    val az = AzureConfig("acct", accountKey = Some("K"))
    assert(az.hadoopOptions("fs.azure.account.key.acct.dfs.core.windows.net") == "K")
    assert(GcsConfig(Some("/k.json"))
      .hadoopOptions("google.cloud.auth.service.account.enable") == "true")
    // applying to the live session merges client options over storage
    Storage(spark, LocalConfig(), ClientOptions(maxRetries = Some(7)))
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.retry.limit") == "7")
  }

  test("retrying coordinator retries transient conflicts with backoff") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new CommitCoordinator {
      def coordinate(spark: org.apache.spark.sql.SparkSession, path: String)(
          write: String => Long): Long = {
        calls += 1
        if (calls < 3) throw new java.util.ConcurrentModificationException("conflict")
        write(path)
      }
    }
    val coord = new RetryingCoordinator(flaky, maxRetries = 5,
      baseBackoffMs = 10, sleeper = sleeps.append(_))
    val p = tmpDir("coord")
    val v = coord.coordinate(spark, p)(path =>
      GraftWriter.write(spark, abDf, path, WriteOptions(mode = WriteMode.Overwrite)))
    assert(v == 0L && calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L)) // exponential backoff
  }

  test("branching coordinator promotes gated writes and cleans the branch") {
    val p = tmpDir("branchy") + "/tbl"
    val coord = new BranchingCoordinator(gate = _.count() > 0)
    coord.coordinate(spark, p)(path =>
      GraftWriter.write(spark, abDf, path, WriteOptions(mode = WriteMode.Overwrite)))
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 2)
    assert(t.history().head.metadata.contains("promoted_from"))
    // branch dir was deleted
    val branches = new java.io.File(new java.io.File(p).getParent, "_branches")
    assert(!branches.exists() || branches.listFiles().isEmpty)
  }

  test("branching coordinator seeds the branch from main so appends preserve existing data") {
    val p = tmpDir("branchseed") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    val coord = new BranchingCoordinator()
    coord.coordinate(spark, p)(path =>
      GraftWriter.write(spark, Seq((3L, 6L)).toDF("a", "b"), path,
        WriteOptions(mode = WriteMode.Append)))
    val rows = GraftTable(spark, p).toDf().orderBy("a").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 4L), (2L, 5L), (3L, 6L)),
      "pre-existing main rows must survive a coordinated Append")
  }

  test("branch seeding is metadata-only: zero data files copied") {
    val p = tmpDir("branchmeta") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    val mainFilesBefore = GraftTable(spark, p).snapshot().files.map(_.path)
    val branchesDir = new java.io.File(new java.io.File(p).getParent, "_branches")
    var branchParquets = -1
    var branchRows = -1L
    val coord = new BranchingCoordinator(gate = { df =>
      // while the branch is alive: it serves the FULL logical table...
      branchRows = df.count()
      // ...but physically holds ONLY the newly appended batch — main's
      // files are referenced by absolute path, never copied
      def parquetsUnder(d: java.io.File): Int =
        if (!d.exists()) 0
        else d.listFiles().map(f =>
          if (f.isDirectory) parquetsUnder(f)
          else if (f.getName.endsWith(".parquet") && !f.getPath.contains("_graft_log")) 1
          else 0).sum
      branchParquets = parquetsUnder(branchesDir)
      true
    })
    coord.coordinate(spark, p)(path =>
      GraftWriter.write(spark, Seq((3L, 6L)).toDF("a", "b"), path,
        WriteOptions(mode = WriteMode.Append)))
    assert(branchRows == 3, "branch must serve seed ∪ appended rows")
    assert(branchParquets == 1,
      s"seed must copy zero data files (found $branchParquets parquet in the branch)")
    // promote moved the appended file in and kept every seeded main file
    val after = GraftTable(spark, p)
    assert(after.toDf().count() == 3)
    val mainFilesAfter = after.snapshot().files.map(_.path)
    assert(mainFilesBefore.forall(mainFilesAfter.contains),
      "seeded main files must survive promotion untouched")
    assert(mainFilesAfter.forall(!new org.apache.hadoop.fs.Path(_).isAbsolute),
      "promotion must never leak absolute branch references into main")
  }

  test("coordinated COW delete promotes removes without touching main bytes") {
    val p = tmpDir("branchdel") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    val fileBefore = GraftTable(spark, p).snapshot().files.head.path
    val coord = new BranchingCoordinator()
    coord.coordinate(spark, p) { path =>
      graft.merge.Dml.delete(spark, path,
        org.apache.spark.sql.functions.col("a") === 1L)
      GraftTable(spark, path).version()
    }
    val t = GraftTable(spark, p)
    assert(t.toDf().collect().map(_.getLong(0)).toSet == Set(2L))
    // the original main parquet still exists physically (time travel)
    assert(new java.io.File(p, fileBefore).exists())
    assert(t.toDf(Some(0L)).count() == 2)
  }

  test("promotion CAS-fails when main advanced since the seed") {
    val p = tmpDir("branchcas") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    val coord = new BranchingCoordinator()
    intercept[java.util.ConcurrentModificationException] {
      coord.coordinate(spark, p) { path =>
        // a foreign commit slips into MAIN while the branch write runs
        GraftWriter.write(spark, Seq((7L, 7L)).toDF("a", "b"), p,
          WriteOptions(mode = WriteMode.Append))
        GraftWriter.write(spark, Seq((3L, 6L)).toDF("a", "b"), path,
          WriteOptions(mode = WriteMode.Append))
      }
    }
    // main kept the foreign commit; the branch batch never landed
    assert(GraftTable(spark, p).toDf().collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 7L))
  }

  test("failed promotion rolls back already-renamed files (no orphans under main)") {
    val p = tmpDir("branchorphan") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    def dataFiles(): Set[String] = {
      val root = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(f => root.toPath.relativize(f.toPath).toString)
        .filter(r => r.endsWith(".parquet") &&
          !r.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
        .toSet
    }
    intercept[java.util.ConcurrentModificationException] {
      new BranchingCoordinator().coordinate(spark, p) { path =>
        // foreign commit on MAIN invalidates the CAS after the branch
        // files have already been renamed into the main root
        GraftWriter.write(spark, Seq((7L, 7L)).toDF("a", "b"), p,
          WriteOptions(mode = WriteMode.Append))
        GraftWriter.write(spark, Seq((3L, 6L)).toDF("a", "b"), path,
          WriteOptions(mode = WriteMode.Append))
      }
    }
    // every physical file under main is referenced by some log entry —
    // the promoted-then-rolled-back batch left nothing behind
    val referenced = GraftTable(spark, p).log.versions()
      .flatMap(v => GraftTable(spark, p).log.readCommit(v).add.map(_.path))
      .toSet
    assert(dataFiles().subsetOf(referenced))
  }

  test("branching coordinator rejects writes that fail the gate, leaving main untouched") {
    val p = tmpDir("branchr") + "/tbl"
    GraftWriter.write(spark, abDf, p, WriteOptions(mode = WriteMode.Overwrite))
    val coord = new BranchingCoordinator(gate = _ => false)
    intercept[IllegalStateException] {
      coord.coordinate(spark, p)(path =>
        GraftWriter.write(spark, Seq((9L, 9L)).toDF("a", "b"), path,
          WriteOptions(mode = WriteMode.Overwrite)))
    }
    assert(GraftTable(spark, p).toDf().count() == 2) // unchanged
    assert(GraftTable(spark, p).version() == 0)
  }
}
