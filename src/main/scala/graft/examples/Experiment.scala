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
    // cost of spread()'s df.rdd.getNumPartitions probe (plans the
    // subtree + builds the RDD DAG without running a job)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val heavy = docs.select(col("doc_id"),
      explode(graft.ext.TextOps.shingles(
        graft.ext.TextOps.tokens(col("text")), 3)).as("s"))
    time("F .rdd probe on plain scan", 5) {
      val _ = docs.rdd.getNumPartitions
    }
    time("G .rdd probe on explode subtree", 5) {
      val _ = heavy.rdd.getNumPartitions
    }
    // spread fast-path decision parity: the structural answer must agree
    // with the physical probe on the canonical shapes
    def check(name: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val target = spark.sparkContext.defaultParallelism
      val spreadParts = graft.ext.TextOps.spread(d).rdd.getNumPartitions
      val probeParts = d.rdd.getNumPartitions
      val expect = if (probeParts < target) target else probeParts
      println(s"H spread-parity $name: spread=$spreadParts expected=$expect " +
        s"raw=$probeParts ${if (spreadParts == expect) "OK" else "MISMATCH"}")
    }
    check("raw docs scan", docs)
    check("filtered scan", docs.filter(col("doc_id") > 10))
    check("projected scan", docs.select("doc_id", "text"))
    check("pinned 32p", docs.repartition(32).localCheckpoint(true))
    check("pinned 2p", docs.repartition(2).localCheckpoint(true))
    check("join (fallback path)", docs.join(emb, col("doc_id") === col("vec_id")))
    check("agg (fallback path)", docs.groupBy("source").count())
    spark.stop()
  }
}
