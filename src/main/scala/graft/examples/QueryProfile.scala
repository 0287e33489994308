package graft.examples

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query optimization profiler (dev tool, not part of the bench
  * contract): runs named headline queries through the same noop-sink
  * methodology as [[graft.Bench]] and reports, per run, the wall time
  * plus the Spark job/stage/task counts and per-stage executor time a
  * listener observed — the fixed-overhead breakdown that explains where
  * a small-SF query's seconds go (each collect/checkpoint is its own
  * job; each exchange is a stage boundary).
  *
  * Usage: runMain graft.examples.QueryProfile <sfDir> <q1,q2,...> [runs]
  * Env: SPARK_GRAFT_CPUS (default 4), SPARK_GRAFT_EXPLAIN_DIR (when set,
  * writes each query's explain("formatted") to <dir>/<name>.txt).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q01_pricing_summary"))
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
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
    val stages = mutable.ArrayBuffer[(String, Int, Long, Long)]() // name, tasks, execRunMs, wallMs
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(0L)
          stages += ((si.name.takeWhile(_ != '\n').take(90), si.numTasks,
            si.taskMetrics.executorRunTime, wall))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm up session machinery like Bench does
    spark.read.parquet(s"$sfDir/region.parquet").limit(1)
      .write.format("noop").mode("overwrite").save()

    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      explainDir.foreach { d =>
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"), txt.getBytes("UTF-8"))
        graft.ext.Scratch.drain()
      }
      for (r <- 1 to runs) {
        synchronized { jobs = 0; stages.clear() }
        spark.sparkContext.setJobDescription(s"$name run $r")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        // give listener events a moment to drain
        Thread.sleep(200)
        val (snap, nJobs) = synchronized { (stages.toVector, jobs) }
        val nTasks = snap.map(_._2).sum
        val execMs = snap.map(_._3).sum
        println(f"[$name run $r] $secs%.3f s  jobs=$nJobs stages=${snap.size} tasks=$nTasks execRunMs=$execMs")
        if (r == runs) {
          snap.sortBy(-_._4).take(12).foreach { case (n, t, e, w) =>
            println(f"    stage wall=${w}%5d ms exec=${e}%5d ms tasks=$t%3d  $n")
          }
        }
        graft.ext.Scratch.drain()
      }
    }
    spark.stop()
  }
}
