package graft.examples

import org.apache.spark.sql.SparkSession

/** Per-query median timings (dev tool): runs each named SparkEntry query
  * `iters` times through the noop sink and reports min/median/max, so a
  * single-run bench outlier (janino cold compile, machine-load spike) can
  * be told apart from a real plan regression. Optionally dumps the
  * formatted plan with `--explain`.
  *
  * Usage: runMain graft.examples.BenchMedian [--explain] [--iters N]
  *        [--sf DIR] query1 query2 ...   (no names = all benchQueries)
  */
object BenchMedian {
  def main(args: Array[String]): Unit = {
    var explain = false
    var iters = 5
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explain = true
        case "--iters" => iters = args(i + 1).toInt; i += 1
        case "--sf" => sfDir = args(i + 1); i += 1
        case q => names += q
      }
      i += 1
    }
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
    spark.read.parquet(s"$sfDir/region.parquet").limit(1)
      .write.format("noop").mode("overwrite").save() // warm

    val qs = if (names.nonEmpty) names.toSeq else graft.SparkEntry.benchQueries
    qs.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) {
        println(s"===== $name plan =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"$name%-28s min=${times.head}%.3f med=$med%.3f max=${times.last}%.3f")
    }
    spark.stop()
  }
}
