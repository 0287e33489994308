package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.merge._

/** Property-style tests of the merge-type algebra over seeded random
  * tables (the reference proves these by running each materialization
  * twice — test_type_handler_merge.py:36-66; here the laws are checked
  * directly on the pure relational core across many random inputs).
  */
class MergeAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  private def randomTable(maxKey: Int): DataFrame = {
    val n = 1 + rnd.nextInt(20)
    // distinct keys (merge contract: unique on merge key)
    val keys = rnd.shuffle((0 to maxKey).toList).take(n)
    keys.map(k => (k.toLong, rnd.nextInt(100).toLong)).toDF("k", "v")
  }

  private def cfg(mt: MergeType) = MergeConfig(mt, "s.k = t.k")

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def keys(df: DataFrame): Set[Long] = rows(df).map(_._1)

  test("merge algebra laws hold over 25 random (target, source) pairs") {
    (1 to 25).foreach { i =>
      val t = randomTable(30)
      val s = randomTable(30)

      // upsert: idempotent, result keys = union of keys
      val up = MergeExecutor(t, s, cfg(MergeType.Upsert))
      assert(rows(MergeExecutor(up, s, cfg(MergeType.Upsert))) == rows(up),
        s"upsert not idempotent (case $i)")
      assert(keys(up) == (keys(t) union keys(s)), s"upsert keys (case $i)")
      // source rows win on intersection
      assert(rows(up).filter { case (k, _) => keys(s)(k) } == rows(s), s"upsert source-wins (case $i)")

      // deduplicate_insert: idempotent, target rows never change
      val di = MergeExecutor(t, s, cfg(MergeType.DeduplicateInsert))
      assert(rows(MergeExecutor(di, s, cfg(MergeType.DeduplicateInsert))) == rows(di),
        s"dedup_insert not idempotent (case $i)")
      assert(rows(di).filter { case (k, _) => keys(t)(k) } == rows(t),
        s"dedup_insert target-preserved (case $i)")

      // update_only: key set identical to target
      val uo = MergeExecutor(t, s, cfg(MergeType.UpdateOnly))
      assert(keys(uo) == keys(t), s"update_only keys (case $i)")

      // replace_delete_unmatched: exactly source restricted to target keys
      val rd = MergeExecutor(t, s, cfg(MergeType.ReplaceDeleteUnmatched))
      assert(rows(rd) == rows(s).filter { case (k, _) => keys(t)(k) },
        s"replace_delete (case $i)")
    }
  }

  test("clause formulations reproduce the four strategies (5 random pairs, on-disk)") {
    import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}
    (1 to 5).foreach { i =>
      val t0 = randomTable(30)
      val s0 = randomTable(30)
      def strat(mt: MergeType): Set[(Long, Long)] = {
        val p = tmpDir(s"mceq$i") + s"/s_${mt.name}"
        GraftWriter.write(spark, t0, p, WriteOptions(mode = WriteMode.Overwrite))
        MergeExecutor.merge(spark, s0, p, cfg(mt))
        rows(GraftTable(spark, p).toDf())
      }
      def clauses(
          matched: Seq[MatchedClause],
          notMatched: Seq[NotMatchedClause],
          bySource: Seq[MatchedClause]): Set[(Long, Long)] = {
        val p = tmpDir(s"mceqc$i") + "/t"
        GraftWriter.write(spark, t0, p, WriteOptions(mode = WriteMode.Overwrite))
        MergeClausesExecutor.merge(spark, s0, p, "s.k = t.k",
          matched, notMatched, bySource)
        rows(GraftTable(spark, p).toDf())
      }
      assert(strat(MergeType.Upsert) ==
        clauses(Seq(UpdateAll()), Seq(InsertAll()), Nil), s"upsert equiv (case $i)")
      assert(strat(MergeType.UpdateOnly) ==
        clauses(Seq(UpdateAll()), Nil, Nil), s"update_only equiv (case $i)")
      assert(strat(MergeType.DeduplicateInsert) ==
        clauses(Nil, Seq(InsertAll()), Nil), s"dedup_insert equiv (case $i)")
      assert(strat(MergeType.ReplaceDeleteUnmatched) ==
        clauses(Seq(UpdateAll()), Nil, Seq(Delete())), s"rdu equiv (case $i)")
    }
  }
}
