package graft

import java.sql.Timestamp
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.io._

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("footer stats land in add actions; pruned scan reads fewer files, same rows") {
    val p = tmpDir("skip")
    val df = spark.range(0, 10000)
      .select(col("id").as("k"),
        (col("id") * 2).cast("double").as("v"),
        concat(lit("s"), lpad(col("id").cast("string"), 6, "0")).as("s"))
      .repartitionByRange(8, col("k")) // disjoint k ranges per file
    GraftWriter.write(spark, df, p, WriteOptions(mode = WriteMode.Overwrite))
    val t = GraftTable(spark, p)
    val files = t.snapshot().files
    assert(files.size == 8)
    assert(files.forall(_.stats.get("k").exists(s => s.min.isDefined && s.max.isDefined)))

    // range predicate on the clustered column: most files pruned
    val f = Seq(DataFilter("k", SkipOp.Ge, 9000L))
    assert(t.filesAfterPruning(f) <= 2)
    assert(t.scanPruned(f).count() == 1000)
    // equality: exactly one file
    val eq = Seq(DataFilter("k", SkipOp.Eq, 1234L))
    assert(t.filesAfterPruning(eq) == 1)
    assert(t.scanPruned(eq).count() == 1)
    // string stats prune too
    val sf = Seq(DataFilter("s", SkipOp.Lt, "s000100"))
    assert(t.filesAfterPruning(sf) == 1)
    assert(t.scanPruned(sf).count() == 100)
    // unclustered double column: pruning keeps correctness anyway
    val vf = Seq(DataFilter("v", SkipOp.Gt, 19990.0))
    assert(t.scanPruned(vf).count() == 4)
  }

  test("timestamp columns are data-skippable (micros output)") {
    val p = tmpDir("skipts")
    val df = (0 until 96).map(h =>
      (h.toLong, Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts")
      .repartitionByRange(4, col("ts"))
    GraftWriter.write(spark, df, p, WriteOptions(mode = WriteMode.Overwrite))
    val t = GraftTable(spark, p)
    val f = Seq(DataFilter("ts", SkipOp.Ge, Timestamp.valueOf("2024-01-04 00:00:00")))
    assert(t.filesAfterPruning(f) == 1)
    assert(t.scanPruned(f).count() == 24)
  }

  test("concurrent appends both commit (conflict retry), no lost updates") {
    val p = tmpDir("race")
    GraftWriter.write(spark, Seq((0L, 0L)).toDF("a", "b"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val writers = (1 to 4).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          GraftWriter.write(spark, Seq((i.toLong, i.toLong)).toDF("a", "b"), p,
            WriteOptions(mode = WriteMode.Append))
        }
      })
    }
    start.countDown()
    writers.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val t = GraftTable(spark, p)
    assert(t.version() == 4L) // 4 appends after v0, every one committed
    assert(t.toDf().count() == 5)
    assert(t.toDf().select("a").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L, 4L))
  }
}
