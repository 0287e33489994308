package graft

import org.apache.spark.sql.functions._

import graft.io.{Bucketing, GraftTable, GraftWriter, WriteMode, WriteOptions}

/** DSv2 catalog: named graft tables under `rootUri/<schema>/<table>`,
  * SQL reads through the native columnar plan, SQL writes/DML through
  * the COW engines.
  */
class CatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val r = tmpDir("graft_cat_root")
    spark.conf.set("spark.sql.catalog.gcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.root", r)
    r
  }

  private def seed(ns: String, tbl: String): String = {
    import spark.implicits._
    val p = s"$root/$ns/$tbl"
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "cat", "v")
    GraftWriter.write(spark, df, p, WriteOptions(mode = WriteMode.Overwrite))
    p
  }

  test("SELECT over a catalog-named table uses the native plan") {
    seed("ns1", "t1")
    val rows = spark.sql("SELECT id, v FROM gcat.ns1.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    val physical = spark.sql("SELECT id FROM gcat.ns1.t1")
      .queryExecution.executedPlan.toString
    assert(physical.contains("FileScan parquet"), physical)
  }

  test("CREATE TABLE / INSERT / DROP TABLE / SHOW TABLES") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS gcat.ns2")
    spark.sql(
      "CREATE TABLE gcat.ns2.fresh (id BIGINT, cat STRING, v DOUBLE) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gcat.ns2.fresh VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    assert(spark.sql("SELECT count(*) FROM gcat.ns2.fresh").head().getLong(0) == 2L)
    // partitioned layout came from the DDL
    assert(GraftTable(spark, s"$root/ns2/fresh").snapshot()
      .partitionColumns == Seq("cat"))
    val tables = spark.sql("SHOW TABLES IN gcat.ns2")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("fresh"))
    spark.sql("DROP TABLE gcat.ns2.fresh")
    assert(!GraftTable.exists(spark, s"$root/ns2/fresh"))
  }

  test("INSERT OVERWRITE replaces table content") {
    seed("ns3", "t3")
    spark.sql("INSERT OVERWRITE gcat.ns3.t3 VALUES (9, 'z', 99.0)")
    val rows = spark.sql("SELECT id, cat, v FROM gcat.ns3.t3").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 9L)
    // overwrite is a new commit, v0 still time-travels
    assert(GraftTable(spark, s"$root/ns3/t3").toDf(Some(0L)).count() == 3)
  }

  test("dynamic partition overwrite through the catalog") {
    import spark.implicits._
    val p = s"$root/ns8/part"
    new java.io.File(s"$root/ns8").mkdirs()
    GraftWriter.write(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)).toDF("id", "cat", "v"),
      p, WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("cat")))
    val before = GraftTable(spark, p).snapshot().files
      .filter(_.partitionValues("cat") == "b").map(_.path).toSet
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try spark.sql("INSERT OVERWRITE gcat.ns8.part VALUES (7, 'a', 70.0)")
    finally spark.conf.unset(key)
    val rows = spark.sql("SELECT id, cat, v FROM gcat.ns8.part ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((2L, "b", 20.0), (7L, "a", 70.0)))
    val after = GraftTable(spark, p).snapshot().files
      .filter(_.partitionValues("cat") == "b").map(_.path).toSet
    assert(after == before)
  }

  test("CTAS creates and loads in one statement") {
    seed("ns4", "src")
    spark.sql(
      "CREATE TABLE gcat.ns4.doubled AS SELECT id, v * 2 AS v2 FROM gcat.ns4.src")
    val rows = spark.sql("SELECT id, v2 FROM gcat.ns4.doubled ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 20.0), (2L, 40.0), (3L, 60.0)))
  }

  test("DELETE / UPDATE / MERGE INTO on catalog tables") {
    import spark.implicits._
    seed("ns5", "t5")
    spark.sql("DELETE FROM gcat.ns5.t5 WHERE cat = 'b'")
    assert(spark.sql("SELECT count(*) FROM gcat.ns5.t5").head().getLong(0) == 2L)
    spark.sql("UPDATE gcat.ns5.t5 SET v = v + 1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM gcat.ns5.t5 WHERE id = 1").head().getDouble(0) == 11.0)
    Seq((3L, "a", -1.0), (7L, "c", 70.0)).toDF("id", "cat", "v")
      .createOrReplaceTempView("cat_merge_src")
    spark.sql(
      """MERGE INTO gcat.ns5.t5 AS t USING cat_merge_src AS s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, v FROM gcat.ns5.t5 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 11.0), (3L, -1.0), (7L, 70.0)))
  }

  test("co-bucketed catalog join plans with zero Exchange") {
    import spark.implicits._
    val ns = "ns6"
    new java.io.File(s"$root/$ns").mkdirs()
    val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 200L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.write(spark, left, s"$root/$ns/bl", "k", 4)
    Bucketing.write(spark, right, s"$root/$ns/br", "k", 4)
    // tiny inputs would (rightly) broadcast; disable it so the test sees
    // the co-bucketed shuffle-free SortMergeJoin the layout guarantees
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.sql(
        s"SELECT l.k, l.lv, r.rv FROM gcat.$ns.bl l JOIN gcat.$ns.br r ON l.k = r.k")
      assert(joined.count() == 200L)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), physical)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("VERSION AS OF and maintenance statements on catalog names") {
    seed("ns7", "t7")
    spark.sql("INSERT OVERWRITE gcat.ns7.t7 VALUES (9, 'z', 99.0)")
    assert(spark.sql("SELECT count(*) FROM gcat.ns7.t7").head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM gcat.ns7.t7 VERSION AS OF 0")
      .head().getLong(0) == 3L)
    val hist = spark.sql("DESCRIBE HISTORY gcat.ns7.t7").collect()
    assert(hist.length == 2)
    val detail = spark.sql("DESCRIBE DETAIL gcat.ns7.t7").head()
    assert(detail.getAs[String]("location") == s"$root/ns7/t7")
    val v = spark.sql("RESTORE gcat.ns7.t7 TO VERSION AS OF 0").head().getLong(0)
    assert(v == 2L)
    assert(spark.sql("SELECT count(*) FROM gcat.ns7.t7").head().getLong(0) == 3L)
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema; old files read nulls") {
    seed("ns9", "evolve")
    spark.sql("ALTER TABLE gcat.ns9.evolve ADD COLUMNS (note STRING)")
    val rows = spark.sql("SELECT id, note FROM gcat.ns9.evolve ORDER BY id").collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(1)))
    spark.sql("INSERT INTO gcat.ns9.evolve VALUES (9, 'z', 90.0, 'tagged')")
    val tagged = spark.sql(
      "SELECT note FROM gcat.ns9.evolve WHERE id = 9").head().getString(0)
    assert(tagged == "tagged")
    // duplicate column and non-nullable positions are rejected loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ns9.evolve ADD COLUMNS (note STRING)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
  }

  test("ALTER COLUMN TYPE widens through the DSv2 catalog route") {
    import spark.implicits._
    val p = s"$root/ns15/widen"
    GraftWriter.write(spark, Seq((1, 1.0f), (2, 2.0f)).toDF("n", "x"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    spark.sql("ALTER TABLE gcat.ns15.widen ALTER COLUMN n TYPE bigint")
    spark.sql("INSERT INTO gcat.ns15.widen VALUES (6000000000, 3.0)")
    val rows = spark.sql("SELECT n FROM gcat.ns15.widen ORDER BY n")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 6000000000L), rows)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ns15.widen ALTER COLUMN x TYPE float")
    }
    assert(e.getMessage.contains("widening"), e.getMessage)
  }

  test("ALTER COLUMN SET/DROP DEFAULT through the DSv2 catalog route") {
    seed("ns16", "defs")
    spark.sql("ALTER TABLE gcat.ns16.defs ALTER COLUMN cat SET DEFAULT 'dflt'")
    val p = s"$root/ns16/defs"
    assert(GraftTable(spark, p).log.tableProperties()
      .get(graft.io.Generated.DefaultPrefix + "cat").contains("'dflt'"))
    spark.sql("ALTER TABLE gcat.ns16.defs ALTER COLUMN cat DROP DEFAULT")
    assert(!GraftTable(spark, p).log.tableProperties()
      .contains(graft.io.Generated.DefaultPrefix + "cat"))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES drives table properties") {
    seed("ns10", "props")
    spark.sql(
      "ALTER TABLE gcat.ns10.props SET TBLPROPERTIES ('graft.cdf'='true')")
    val p = s"$root/ns10/props"
    assert(graft.io.Cdc.enabled(GraftTable(spark, p).log.tableProperties()))
    // CDF now records preimages for DML through the same catalog name
    spark.sql("UPDATE gcat.ns10.props SET v = v * 2 WHERE id = 1")
    val tb = GraftTable(spark, p)
    val kinds = tb.tableChanges(1L, tb.version())
      .select(graft.io.Cdc.ChangeCol).collect().map(_.getString(0)).toSet
    assert(kinds == Set("update_preimage", "update_postimage"))
    spark.sql("ALTER TABLE gcat.ns10.props UNSET TBLPROPERTIES ('graft.cdf')")
    assert(!graft.io.Cdc.enabled(GraftTable(spark, p).log.tableProperties()))
    // non-reserved keys would silently vanish on the next commit — rejected
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.ns10.props SET TBLPROPERTIES ('team'='data')")
    }
    assert(e.getMessage.contains("graft."), e.getMessage)
  }

  test("DROP COLUMN through catalog names") {
    seed("ns12", "dropc")
    spark.sql("ALTER TABLE gcat.ns12.dropc DROP COLUMN v")
    assert(GraftTable(spark, s"$root/ns12/dropc").snapshot()
      .schema.fieldNames.toSeq == Seq("id", "cat"))
    assert(spark.sql("SELECT * FROM gcat.ns12.dropc").columns.toSeq
      == Seq("id", "cat"))
  }

  test("RENAME COLUMN through catalog names") {
    seed("ns14", "renc")
    spark.sql("ALTER TABLE gcat.ns14.renc RENAME COLUMN v TO amount")
    assert(spark.sql("SELECT * FROM gcat.ns14.renc").columns.toSeq
      == Seq("id", "cat", "amount"))
    assert(spark.sql("SELECT sum(amount) FROM gcat.ns14.renc").head().getDouble(0)
      == 60.0)
    // post-rename inserts land under the physical name and read back
    spark.sql("INSERT INTO gcat.ns14.renc VALUES (4, 'd', 40.0)")
    assert(spark.sql("SELECT amount FROM gcat.ns14.renc WHERE id = 4")
      .head().getDouble(0) == 40.0)
  }

  test("concurrent RENAME COLUMN race: CAS retries land both renames") {
    seed("ns15", "renrace")
    val p = s"$root/ns15/renrace"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // rename two DIFFERENT columns concurrently: both must land (one
    // CAS-retries over the other), with mappings intact
    val renames = Seq(("id", "doc_id"), ("v", "amount")).map { case (f, t) =>
      Future(graft.io.Alter.alter(spark, p, renameCols = Seq((f, t))))
    }
    Await.result(Future.sequence(renames), 2.minutes)
    assert(GraftTable(spark, p).snapshot().schema.fieldNames.toSet
      == Set("doc_id", "cat", "amount"))
    val rows = spark.sql(s"SELECT doc_id, amount FROM gcat.ns15.renrace ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("concurrent ALTER TABLE commits all land via CAS retry") {
    seed("ns13", "race")
    val p = s"$root/ns13/race"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val adds = (0 until 4).map { i =>
      Future(graft.io.Alter.alter(spark, p,
        addCols = Seq((s"extra_$i", org.apache.spark.sql.types.StringType, None))))
    }
    Await.result(Future.sequence(adds), 2.minutes)
    val names = GraftTable(spark, p).snapshot().schema.fieldNames.toSet
    assert((0 until 4).forall(i => names(s"extra_$i")), names.mkString(","))
  }

  test("ADD/DROP CONSTRAINT through catalog names") {
    seed("ns11", "cons")
    spark.sql("ALTER TABLE gcat.ns11.cons ADD CONSTRAINT pos CHECK (v > 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcat.ns11.cons VALUES (9, 'z', -5.0)")
    }
    assert(e.getMessage.contains("pos"), e.getMessage)
    spark.sql("ALTER TABLE gcat.ns11.cons DROP CONSTRAINT pos")
    spark.sql("INSERT INTO gcat.ns11.cons VALUES (9, 'z', -5.0)")
    assert(spark.sql("SELECT count(*) FROM gcat.ns11.cons").head().getLong(0) == 4L)
  }

  test("SHOW CREATE TABLE on catalog names renders executable DDL") {
    seed("ns9", "show_src")
    spark.sql("ALTER TABLE gcat.ns9.show_src SET TBLPROPERTIES ('graft.cdf'='true')")
    val ddl = spark.sql("SHOW CREATE TABLE gcat.ns9.show_src").head().getString(0)
    assert(ddl.startsWith("CREATE TABLE `gcat`.`ns9`.`show_src`"), ddl)
    assert(ddl.contains("'graft.cdf' = 'true'"), ddl)
    // executes against the catalog route and reproduces the shape
    spark.sql(ddl.replace("`show_src`", "`show_clone`"))
    val src = GraftTable(spark, s"$root/ns9/show_src").snapshot()
    val clone = GraftTable(spark, s"$root/ns9/show_clone").snapshot()
    assert(clone.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(GraftTable(spark, s"$root/ns9/show_clone").log.tableProperties()
      .get("graft.cdf").contains("true"))
  }

  test("TRUNCATE TABLE through catalog names") {
    seed("ns10", "trunc")
    spark.sql("TRUNCATE TABLE gcat.ns10.trunc")
    assert(spark.sql("SELECT * FROM gcat.ns10.trunc").count() == 0)
    spark.sql("INSERT INTO gcat.ns10.trunc VALUES (9, 'z', 90.0)")
    assert(spark.sql("SELECT * FROM gcat.ns10.trunc").count() == 1)
  }

  test("catalog-name readChangeFeed: batch reader and stream serve change rows") {
    import graft.merge.Dml
    val p = seed("ns11", "cdft")                                   // v0: 3 inserts
    spark.sql("ALTER TABLE gcat.ns11.cdft SET TBLPROPERTIES ('graft.cdf'='true')") // v1: metadata
    Dml.update(spark, p, col("id") === 1L, Map("v" -> lit(11.0)))  // v2
    Dml.delete(spark, p, col("id") === 3L)                         // v3

    // batch reader through the catalog name (same contract as the path
    // route: startingVersion inclusive, endingVersion defaults latest)
    val batch = spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "2").table("gcat.ns11.cdft")
      .select("id", "v", graft.io.Cdc.ChangeCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(batch == Set(
      (1L, 10.0, "update_preimage"), (1L, 11.0, "update_postimage"),
      (3L, 30.0, "delete")))

    // startingVersion stays required — no implicit full-history scan
    val e = intercept[IllegalArgumentException] {
      spark.read.option("readChangeFeed", "true").table("gcat.ns11.cdft")
    }
    assert(e.getMessage.contains("startingVersion"), e.getMessage)

    // streaming through the catalog name mirrors the path route: initial
    // load as inserts, then per-commit change rows
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("gcat.ns11.cdft")
      .writeStream.format("memory").queryName("catcdf")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("catcdf")
      .select("id", "v", graft.io.Cdc.ChangeCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed == Set(
      (1L, 10.0, "insert"), (2L, 20.0, "insert"), (3L, 30.0, "insert"),
      (1L, 10.0, "update_preimage"), (1L, 11.0, "update_postimage"),
      (3L, 30.0, "delete")))
  }

  test("catalog-name withRowIds read serves stable row ids") {
    import graft.io.{GraftWriter, WriteOptions, WriteMode, RowTracking}
    import spark.implicits._
    new java.io.File(s"$root/rt").mkdirs()
    GraftWriter.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      s"$root/rt/ids",
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.log.CommitLog.RowTrackingKey -> "true")))
    val df = spark.read.option("withRowIds", "true").table("gcat.rt.ids")
    assert(df.columns.contains(RowTracking.Col))
    val ids = df.select("k", RowTracking.Col).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.keySet == Set(1L, 2L, 3L))
    assert(ids.values.toSet == Set(0L, 1L, 2L), s"dense ids, got $ids")
    // plain catalog reads stay untouched
    assert(!spark.read.table("gcat.rt.ids").columns
      .contains(RowTracking.Col))
  }

  test("missing table errors cleanly") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.ns1.never_made").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND")
      || e.getMessage.toLowerCase.contains("cannot be found"), e.getMessage)
  }

  test("vector-index and dedup-store DDL route through catalog names") {
    import spark.implicits._
    val srcP = s"$root/nsix/emb"
    GraftWriter.write(spark,
      (0L until 60L).map(i =>
        (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat), s"doc $i text"))
        .toDF("vec_id", "embedding", "text")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      srcP, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.io.Cdc.PropKey -> "true")))
    // CREATE by catalog name lands under the catalog's warehouse layout
    spark.sql("CREATE VECTOR INDEX gcat.nsix.ix ON gcat.nsix.emb " +
      "(embedding) ID vec_id OPTIONS ('numCells' = '4', 'm' = '4', " +
      "'ksub' = '8')")
    assert(GraftTable.exists(spark, s"$root/nsix/ix"))
    val d = spark.sql("DESCRIBE VECTOR INDEX gcat.nsix.ix").head()
    assert(d.getString(d.fieldIndex("metric")) == "l2")
    assert(!d.getBoolean(d.fieldIndex("stale")))
    spark.sql("CREATE DEDUP STORE gcat.nsix.fp ON gcat.nsix.emb (text) " +
      "ID vec_id")
    assert(GraftTable.exists(spark, s"$root/nsix/fp"))
    // REFRESH by name after a source append advances both
    GraftWriter.write(spark,
      Seq((100L, Array.fill(8)(1f), "fresh doc"))
        .toDF("vec_id", "embedding", "text")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      srcP, WriteOptions(mode = WriteMode.Append))
    assert(spark.sql("REFRESH VECTOR INDEX gcat.nsix.ix").head().getLong(0) ==
      GraftTable(spark, srcP).version())
    assert(spark.sql("REFRESH DEDUP STORE gcat.nsix.fp").head().getLong(0) ==
      GraftTable(spark, srcP).version())
    val st = spark.sql("DESCRIBE DEDUP STORE gcat.nsix.fp").head()
    assert(!st.getBoolean(st.fieldIndex("stale")))
    // SHOW under the catalog root discovers both
    assert(spark.sql(s"SHOW VECTOR INDEXES IN '$root'").collect()
      .map(_.getString(0)).contains(s"$root/nsix/ix"))
    assert(spark.sql(s"SHOW DEDUP STORES IN '$root'").collect()
      .map(_.getString(0)).contains(s"$root/nsix/fp"))
    // DROP by name removes the artifacts, refuses the data table
    val eDrop = intercept[Exception] {
      spark.sql("DROP VECTOR INDEX gcat.nsix.emb")
    }
    assert(eDrop.getMessage.contains("not a vector index"))
    spark.sql("DROP VECTOR INDEX gcat.nsix.ix")
    spark.sql("DROP DEDUP STORE gcat.nsix.fp")
    assert(!GraftTable.exists(spark, s"$root/nsix/ix"))
    assert(!GraftTable.exists(spark, s"$root/nsix/fp"))
  }
}
