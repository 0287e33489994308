package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ext.MaterializedAgg
import graft.io._
import graft.plans.MatviewRewriteRule
import graft.sources.GraftFileIndex

/** The transparent aggregate rewrite: a matching GROUP BY over a graft
  * scan is answered from the registered materialized view when (and
  * only when) the view reflects exactly the scanned snapshot version.
  */
class MatviewRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Table paths of every graft native scan in the optimized plan
    * (unwrapping the preCBO size-pinning index filtered scans carry).
    */
  private def scans(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case ix: GraftFileIndex => Seq(ix.scannedTablePath)
          case p: graft.sources.PinnedSizeFileIndex =>
            Seq(p.underlying.scannedTablePath)
          case _ => Nil
        }
        case _ => Nil
      }
    }.flatten

  private def withRewrite[A](views: String*)(f: => A): A =
    try { spark.conf.set(MatviewRewriteRule.ConfKey, views.mkString(",")); f }
    finally spark.conf.unset(MatviewRewriteRule.ConfKey)

  private def fixture(): (String, String) = {
    val src = tmpDir("mvr_src")
    val sum = tmpDir("mvr_sum")
    GraftWriter.write(spark,
      Seq((1L, "a", Option(10L)), (2L, "a", Option(10L)),
        (3L, "a", Option(25L)), (4L, "b", Option(7L)),
        (5L, "b", Option.empty[Long]), (6L, "c", Option(3L)))
        .toDF("id", "cat", "v"),
      src, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.io.Cdc.PropKey -> "true")))
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$sum` AS " +
      s"SELECT cat, sum(v) AS s, count(*) AS n, count(v) AS nv, " +
      s"avg(v) AS a, min(v) AS mn, max(v) AS mx, " +
      s"count(DISTINCT v) AS nd FROM graft.`$src` GROUP BY cat")
    (src, sum)
  }

  private val query =
    "SELECT cat, sum(v) AS s, count(*) AS n, count(v) AS nv, " +
      "avg(v) AS a, min(v) AS mn, max(v) AS mx, count(DISTINCT v) AS nd " +
      "FROM graft.`%s` GROUP BY cat"

  test("a fresh view answers the matching aggregate — results identical, source never scanned") {
    val (src, sum) = fixture()
    val direct = spark.sql(query.format(src)).collect().sortBy(_.getString(0))
    val rewritten = withRewrite(sum) {
      val df = spark.sql(query.format(src))
      val sc = scans(df)
      assert(sc.contains(sum) && !sc.contains(src),
        s"expected a view-only read, scanned: $sc")
      df.collect().sortBy(_.getString(0))
    }
    assert(rewritten.toSeq == direct.toSeq,
      s"rewrite changed results:\n${rewritten.toSeq}\nvs\n${direct.toSeq}")
    // the all-NULL-tolerant row: cat=b has one NULL value
    val b = rewritten.find(_.getString(0) == "b").get
    assert(b.getLong(b.fieldIndex("n")) == 2L &&
      b.getLong(b.fieldIndex("nv")) == 1L &&
      b.getLong(b.fieldIndex("nd")) == 1L)
  }

  test("a STALE view never rewrites; REFRESH re-enables it") {
    val (src, sum) = fixture()
    GraftWriter.write(spark, Seq((7L, "c", Option(90L))).toDF("id", "cat", "v"),
      src, WriteOptions(mode = WriteMode.Append))
    withRewrite(sum) {
      val df = spark.sql(query.format(src))
      assert(scans(df).contains(src), "stale view must not answer")
      val c = df.collect().find(_.getString(0) == "c").get
      assert(c.getLong(c.fieldIndex("n")) == 2L) // fresh data visible
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$sum`").collect()
      val df2 = spark.sql(query.format(src))
      assert(scans(df2).contains(sum) && !scans(df2).contains(src))
      val c2 = df2.collect().find(_.getString(0) == "c").get
      assert(c2.getLong(c2.fieldIndex("n")) == 2L &&
        c2.getLong(c2.fieldIndex("mx")) == 90L)
    }
  }

  test("filters, mismatched shapes, time travel, and unset conf all refuse the rewrite") {
    val (src, sum) = fixture()
    // conf unset: no rewrite even on a perfect match
    assert(scans(spark.sql(query.format(src))).contains(src))
    withRewrite(sum) {
      // WHERE clause — row-level semantics the summary cannot answer
      assert(scans(spark.sql(
        s"SELECT cat, sum(v) AS s FROM graft.`$src` " +
          "WHERE id > 2 GROUP BY cat")).contains(src))
      // different grouping keys
      assert(scans(spark.sql(
        s"SELECT id, sum(v) AS s FROM graft.`$src` GROUP BY id"))
        .contains(src))
      // an aggregate the view does not maintain
      assert(scans(spark.sql(
        s"SELECT cat, sum(id) AS s FROM graft.`$src` GROUP BY cat"))
        .contains(src))
      // time travel reads an older snapshot — watermark can never match
      GraftWriter.write(spark,
        Seq((8L, "a", Option(1L))).toDF("id", "cat", "v"),
        src, WriteOptions(mode = WriteMode.Append))
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$sum`").collect()
      assert(scans(spark.sql(
        s"SELECT cat, sum(v) AS s FROM graft.`$src` VERSION AS OF 0 " +
          "GROUP BY cat")).contains(src))
      // the current snapshot rewrites again
      assert(scans(spark.sql(query.format(src))).contains(sum))
    }
  }

  test("ROLLUP: grouping a subset of the keys re-aggregates the summary") {
    val src = tmpDir("mvr_ru_src")
    val sum = tmpDir("mvr_ru_sum")
    GraftWriter.write(spark,
      Seq((1L, "a", "x", Option(10L)), (2L, "a", "y", Option(10L)),
        (3L, "a", "y", Option(25L)), (4L, "b", "x", Option(7L)),
        (5L, "b", "x", Option.empty[Long]), (6L, "c", "y", Option(3L)))
        .toDF("id", "cat", "sub", "v"),
      src, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.io.Cdc.PropKey -> "true")))
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$sum` AS " +
      s"SELECT cat, sub, sum(v) AS s, count(*) AS n, count(v) AS nv, " +
      s"avg(v) AS a, min(v) AS mn, max(v) AS mx " +
      s"FROM graft.`$src` GROUP BY cat, sub")
    withRewrite(sum) {
      // collapse `sub`: every aggregate re-aggregates exactly
      val df = spark.sql(
        s"SELECT cat, sum(v) AS s, count(*) AS n, count(v) AS nv, " +
          s"avg(v) AS a, min(v) AS mn, max(v) AS mx " +
          s"FROM graft.`$src` GROUP BY cat")
      assert(scans(df).contains(sum) && !scans(df).contains(src),
        s"rollup must answer from the view, scanned: ${scans(df)}")
      val rows = df.collect().map(r => r.getString(0) -> r).toMap
      val a = rows("a")
      assert(a.getLong(a.fieldIndex("s")) == 45L &&
        a.getLong(a.fieldIndex("n")) == 3L &&
        a.getLong(a.fieldIndex("mn")) == 10L &&
        a.getLong(a.fieldIndex("mx")) == 25L &&
        a.getDouble(a.fieldIndex("a")) == 15.0)
      val b = rows("b")
      assert(b.getLong(b.fieldIndex("n")) == 2L &&
        b.getLong(b.fieldIndex("nv")) == 1L)
      // GLOBAL aggregate (empty grouping) rolls up too
      val g = spark.sql(
        s"SELECT sum(v) AS s, count(*) AS n, min(v) AS mn, max(v) AS mx " +
          s"FROM graft.`$src`")
      assert(scans(g).contains(sum) && !scans(g).contains(src))
      val gr = g.collect().head
      assert(gr.getLong(0) == 55L && gr.getLong(1) == 6L &&
        gr.getLong(2) == 3L && gr.getLong(3) == 25L)
      // bare-keys distinct (no aggregates) over a key subset
      val d = spark.sql(s"SELECT sub FROM graft.`$src` GROUP BY sub")
      assert(scans(d).contains(sum) && !scans(d).contains(src))
      assert(d.collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y"))
      // count(DISTINCT) can NOT roll up — refuse (distinct sets don't add)
      val nd = spark.sql(
        s"SELECT cat, count(DISTINCT v) AS nd FROM graft.`$src` GROUP BY cat")
      assert(scans(nd).contains(src), "countd rollup must not rewrite")
    }
  }

  test("a SUBSET of the maintained aggregates still rewrites (keys may reorder)") {
    val (src, sum) = fixture()
    withRewrite(sum) {
      val df = spark.sql(
        s"SELECT max(v) AS mx, cat, count(*) AS n FROM graft.`$src` " +
          "GROUP BY cat")
      assert(scans(df).contains(sum) && !scans(df).contains(src))
      val rows = df.collect().map(r =>
        r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
      assert(rows("a") == ((25L, 3L)) && rows("c") == ((3L, 1L)))
      assert(rows("b") == ((7L, 2L)))
    }
  }
}
