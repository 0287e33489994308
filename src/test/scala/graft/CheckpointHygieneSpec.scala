package graft

import graft.ext.{Dedup, Scratch}
import org.apache.spark.sql.DataFrame

/** The pair-generators eagerly localCheckpoint corpus-sized
  * intermediates (band relations, edge lists). Those blocks used to live
  * for the session's lifetime — a 200-materialization bench session
  * accumulated enough to degrade later queries. The contract now:
  * intermediates are released before the generator returns, only the
  * (small) sealed output stays cached, and Scratch.drain() reclaims
  * those between pipelines. This suite asserts that contract via
  * sparkContext.getPersistentRDDs.
  */
class CheckpointHygieneSpec extends SparkSpec {

  private def cached: Int = spark.sparkContext.getPersistentRDDs.size

  private def docs: DataFrame = {
    import spark.implicits._
    (1 to 80).map { i =>
      val shared = "the quick brown fox jumps over the lazy dog again and again "
      (i.toLong, shared * 3 + s"unique tail ${i % 9} ${i % 11} ${i % 13}")
    }.toDF("doc_id", "text")
  }

  test("minhashPairs keeps only its sealed output cached; drain clears it") {
    Scratch.drain()
    val before = cached
    val pairs = Dedup.minhashPairs(docs)
    assert(pairs.count() >= 0)
    // band relation + hot list were released inside the call; only the
    // sealed pair output may remain
    assert(cached - before <= 1,
      s"minhashPairs leaked intermediates: $before -> $cached cached RDDs")
    Scratch.drain()
    assert(cached <= before, s"drain left blocks: $before -> $cached")
  }

  test("simhashPairs keeps only its sealed output cached; drain clears it") {
    Scratch.drain()
    val before = cached
    val pairs = Dedup.simhashPairs(docs)
    assert(pairs.count() >= 0)
    assert(cached - before <= 1,
      s"simhashPairs leaked intermediates: $before -> $cached cached RDDs")
    Scratch.drain()
    assert(cached <= before)
  }

  test("components releases the edge checkpoint on the union-find path") {
    import spark.implicits._
    Scratch.drain()
    val before = cached
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labeled = Dedup.components(pairs)
    assert(labeled.count() == 5)
    // local union-find returns a LocalRelation-backed frame; the edge
    // checkpoint must already be gone
    assert(cached == before,
      s"components(local) leaked edges: $before -> $cached cached RDDs")
  }

  test("components seals labels and releases edges on the distributed path") {
    import spark.implicits._
    Scratch.drain()
    val before = cached
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    // force the distributed min-label loop
    val labeled = Dedup.components(pairs, localEdgeThreshold = 0L)
    assert(labeled.count() == 6)
    assert(cached - before <= 1,
      s"components(distributed) leaked: $before -> $cached cached RDDs")
    Scratch.drain()
    assert(cached <= before)
  }

  test("repeated drained calls do not accumulate cached blocks") {
    Scratch.drain()
    val before = cached
    (1 to 3).foreach { _ =>
      Dedup.minhashPairs(docs).count()
      Dedup.simhashPairs(docs).count()
      Scratch.drain()
    }
    assert(cached <= before,
      s"repeated calls accumulated blocks: $before -> $cached cached RDDs")
  }
}
