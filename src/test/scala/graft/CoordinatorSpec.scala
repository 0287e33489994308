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
