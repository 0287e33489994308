package graft.examples

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for the WRITE/maintenance lifecycles the bench times as a
  * single number: replays the bench's matview build + incremental
  * refresh (and optionally the dedup-store/ANN legs) with a job/stage
  * listener, so the fixed-cost structure of a refresh (change-feed
  * scan, delta agg, merge join, commit, auto-compact check) is visible
  * per stage. Usage:
  *   runMain graft.examples.MaintProfile [sfDir] [runs]
  */
object MaintProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    val stages = mutable.ArrayBuffer[(String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(0L)
          stages += ((si.name.takeWhile(_ != '\n').take(90), si.numTasks,
            si.taskMetrics.executorRunTime, wall))
        }
    })

    import graft.io.{GraftWriter, WriteMode, WriteOptions}
    for (r <- 1 to runs) {
      val root = java.nio.file.Files.createTempDirectory("graft_mvp").toString
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val mvSrc = s"$root/mv_src"; val mvSum = s"$root/mv_sum"
      GraftWriter.write(spark, orders, mvSrc,
        WriteOptions(mode = WriteMode.ErrorIfExists))

      def phase(name: String)(f: => Unit): Unit = {
        stages.clear(); jobs = 0
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[$name run $r] $wall%.3f s  jobs=$jobs")
        stages.sortBy(-_._4).take(10).foreach { case (n, t, e, w) =>
          println(f"    stage wall=$w%5d ms exec=$e%5d ms tasks=$t%3d  $n")
        }
      }
      phase("matview_build") {
        graft.ext.MaterializedAgg.refresh(spark, mvSrc, mvSum,
          Seq("o_orderstatus"), "o_totalprice")
      }
      GraftWriter.write(spark, orders.filter(col("o_orderkey") % 16 === 0),
        mvSrc, WriteOptions(mode = WriteMode.Append))
      phase("matview_refresh") {
        graft.ext.MaterializedAgg.refresh(spark, mvSrc, mvSum,
          Seq("o_orderstatus"), "o_totalprice")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
