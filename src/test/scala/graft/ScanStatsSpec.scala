package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.io._

/** [[graft.sources.GraftScanStats]]: join planning must see the bytes a
  * pruned scan will actually read, not the table's total size.
  */
class ScanStatsSpec extends SparkSpec {
  import spark.implicits._

  /** 8 hive partitions, each a distinct file with disjoint `v` ranges
    * (one coalesced file per append → footer min/max can prune on v).
    */
  private def buildPartitioned(p: String, rowsPerPart: Int = 4000): Unit =
    (0 until 8).foreach { i =>
      val df = (0 until rowsPerPart).map { j =>
        (i, i * rowsPerPart + j, f"payload-$i%02d-$j%06d-${"x" * 40}")
      }.toDF("part", "v", "payload").coalesce(1)
      GraftWriter.write(spark, df, p, WriteOptions(
        mode = if (i == 0) WriteMode.Overwrite else WriteMode.Append,
        partitionBy = Seq("part")))
    }

  private def scanStats(df: org.apache.spark.sql.DataFrame): BigInt = {
    val lrs = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr
    }
    assert(lrs.size == 1, s"expected one scan, got ${lrs.size}")
    lrs.head.stats.sizeInBytes
  }

  test("partition filter shrinks planned scan size to the pruned files") {
    val p = tmpDir("stats_part")
    buildPartitioned(p)
    val snap = GraftTable(spark, p).snapshot()
    val total = snap.files.map(_.sizeBytes).sum
    val onePart = snap.files
      .filter(_.partitionValues.get("part").contains("3")).map(_.sizeBytes).sum
    assert(snap.files.size == 8 && onePart > 0 && onePart < total)

    val full = spark.read.format("graft").load(p)
    assert(scanStats(full) == BigInt(total))
    val prunedDf = full.filter(col("part") === 3)
    assert(scanStats(prunedDf) == BigInt(onePart),
      "planned size must equal the surviving partition's bytes")
    // the pin is stats-only: results are untouched
    assert(prunedDf.count() == 4000)
  }

  test("footer-stats data filter shrinks planned scan size") {
    val p = tmpDir("stats_data")
    buildPartitioned(p)
    val full = spark.read.format("graft").load(p)
    val totalStats = scanStats(full)
    // v ranges are file-disjoint: a point range confines to one file
    val narrowed = full.filter(col("v") >= 100 && col("v") < 200)
    assert(scanStats(narrowed) < totalStats,
      "footer min/max skipping must reach the planned size")
    assert(narrowed.count() == 100)
  }

  test("pruned slice of an over-threshold table broadcasts; unpruned does not") {
    val p1 = tmpDir("stats_fact")
    val p2 = tmpDir("stats_dim")
    buildPartitioned(p1)
    buildPartitioned(p2)
    val total = GraftTable(spark, p1).snapshot().files.map(_.sizeBytes).sum
    val onePart = GraftTable(spark, p2).snapshot().files
      .filter(_.partitionValues.get("part").contains("3")).map(_.sizeBytes).sum
    val threshold = (onePart + total) / 2
    assert(onePart < threshold && threshold < total)

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, threshold.toString)
      val fact = spark.read.format("graft").load(p1)
      val dim = spark.read.format("graft").load(p2)
      def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
        // sparkPlan = the STATIC physical plan — precisely the decision
        // logical stats drive (AQE may still rescue at runtime; the
        // point of the rule is not to need rescuing). Exchanges are not
        // inserted yet at this stage, so look for the join node itself.
        df.queryExecution.sparkPlan.exists {
          case _: BroadcastHashJoinExec => true
          case _ => false
        }

      val unpruned = fact.join(dim, "v")
      assert(!hasBroadcast(unpruned),
        "both sides over threshold: static plan must not broadcast")
      val pruned = fact.join(dim.filter(col("part") === 3), "v")
      assert(hasBroadcast(pruned),
        "pruned dim side under threshold: static plan must broadcast it")
      assert(pruned.count() == 4000)
    } finally spark.conf.set(key, old)
  }
}
