package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Micro-profile of the text pipeline stages (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("read-only")(docs.write.format("noop").mode("overwrite").save())
    time("tokens")(docs.select(TextOps.tokens(col("text")).as("t"))
      .write.format("noop").mode("overwrite").save())
    time("shingles")(docs.select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("s"))
      .write.format("noop").mode("overwrite").save())
    time("explode")(docs.select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .write.format("noop").mode("overwrite").save())
    time("explode+md5")(docs.select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .select(md5(col("s"))).write.format("noop").mode("overwrite").save())
    time("explode+hash31")(docs.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
      .select(col("doc_id"), TextOps.hash31(col("s")).as("h"))
      .write.format("noop").mode("overwrite").save())
    time("full minhash sig")(graft.ext.Dedup.minhashSignatures(docs)
      .write.format("noop").mode("overwrite").save())
    time("minhash sig 2nd run")(graft.ext.Dedup.minhashSignatures(docs)
      .write.format("noop").mode("overwrite").save())
    time("jaccard pairs")(graft.ext.Dedup.ngramJaccardPairs(docs, 200)
      .write.format("noop").mode("overwrite").save())
    time("jaccard pairs 2nd run")(graft.ext.Dedup.ngramJaccardPairs(docs, 200)
      .write.format("noop").mode("overwrite").save())
    println("input partitions: " + docs.rdd.getNumPartitions)
    val docs4 = docs.repartition(4)
    time("minhash sig repart4 warm")(graft.ext.Dedup.minhashSignatures(docs4)
      .write.format("noop").mode("overwrite").save())
    time("minhash sig repart4 2nd")(graft.ext.Dedup.minhashSignatures(docs4)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
