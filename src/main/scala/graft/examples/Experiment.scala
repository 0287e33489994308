package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-experiments for the optimization round (dev tool). */
object Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.ext.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.write.format("noop").mode("overwrite").save() // warm

    def time(name: String, reps: Int = 3)(f: => Unit): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"$name run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val q = broadcast(emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
    val c = emb.repartition(32)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    def dotc = call_function("graft_dot", col("q_vec"), col("n_vec"))
    val scored = c.crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .withColumn("sim_e6",
        round(dotc / (sqrt(call_function("graft_dot", col("q_vec"), col("q_vec"))) *
          sqrt(call_function("graft_dot", col("n_vec"), col("n_vec")))) * 1e6)
          .cast("long"))

    time("A crossJoin+dot only") {
      scored.write.format("noop").mode("overwrite").save()
    }
    time("B + plain max agg") {
      scored.groupBy("q_id").agg(max("sim_e6")).write.format("noop").mode("overwrite").save()
    }
    time("C + topk udaf") {
      val topk = udaf(new graft.functions.TopKBySim(5))
      scored.filter(col("sim_e6").isNotNull && col("n_id").isNotNull)
        .groupBy("q_id").agg(topk(col("sim_e6"), col("n_id")).as("top"))
        .write.format("noop").mode("overwrite").save()
    }
    time("D full bruteTopK") {
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 32), 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("E scan+repartition only") {
      c.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
