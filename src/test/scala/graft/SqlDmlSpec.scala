package graft

import org.apache.spark.sql.functions._

import graft.io.{GraftTable, GraftWriter, WriteMode, WriteOptions}

/** SQL DML statements (`DELETE FROM` / `UPDATE` / `MERGE INTO` /
  * `INSERT`) over `graft.`/path`` targets, routed by the injected
  * resolution rule to the COW engines.
  */
class SqlDmlSpec extends SparkSpec {

  private def freshTable(prefix: String): String = {
    import spark.implicits._
    val p = tmpDir(prefix)
    val df = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
      (4L, "c", 40.0), (5L, "b", 50.0)).toDF("id", "cat", "v")
    GraftWriter.write(spark, df, p,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("cat")))
    p
  }

  test("DELETE FROM graft.`path` WHERE cond") {
    val p = freshTable("sqldel")
    spark.sql(s"DELETE FROM graft.`$p` WHERE v > 25.0")
    val left = GraftTable(spark, p).toDf().select("id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(1L, 2L))
  }

  test("DELETE with alias qualifier and no WHERE") {
    val p = freshTable("sqldel2")
    spark.sql(s"DELETE FROM graft.`$p` AS x WHERE x.cat = 'b'")
    assert(GraftTable(spark, p).toDf().filter(col("cat") === "b").count() == 0)
    spark.sql(s"DELETE FROM graft.`$p`")
    assert(GraftTable(spark, p).toDf().count() == 0)
  }

  test("UPDATE graft.`path` SET ... WHERE cond") {
    val p = freshTable("sqlupd")
    spark.sql(s"UPDATE graft.`$p` SET v = v * 2, cat = 'z' WHERE id <= 2")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "cat", "v").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows(0) == ((1L, "z", 20.0)))
    assert(rows(1) == ((2L, "z", 40.0)))
    assert(rows(2) == ((3L, "a", 30.0)))
  }

  test("MERGE INTO with update/delete/insert clauses") {
    import spark.implicits._
    val p = freshTable("sqlmerge")
    Seq((1L, "a", 100.0), (3L, "a", -1.0), (6L, "d", 60.0))
      .toDF("id", "cat", "v").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$p` AS t USING merge_src AS s
          ON t.id = s.id
          WHEN MATCHED AND s.v < 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT *""")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 100.0), (2L, 20.0), (4L, 40.0), (5L, 50.0), (6L, 60.0)))
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE") {
    import spark.implicits._
    val p = freshTable("sqlmerge2")
    Seq((1L, "a", 11.0)).toDF("id", "cat", "v").createOrReplaceTempView("merge_src2")
    spark.sql(
      s"""MERGE INTO graft.`$p` AS t USING merge_src2 AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND t.v >= 40.0 THEN DELETE""")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
  }

  test("MERGE WITH SCHEMA EVOLUTION appends source-only columns") {
    import spark.implicits._
    val p = freshTable("sqlmse")
    Seq((1L, "a", 100.0, "t1"), (9L, "z", 90.0, "t9"))
      .toDF("id", "cat", "v", "tag").createOrReplaceTempView("mse_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$p` AS t USING mse_src AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
          WHEN NOT MATCHED THEN INSERT *""")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 100.0, "t1"), (2L, 20.0, null), (3L, 30.0, null),
      (4L, 40.0, null), (5L, 50.0, null), (9L, 90.0, "t9")))
    // without the keyword, naming the unknown column fails fast
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$p` AS t USING mse_src AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET nope = s.tag""")
    }
    assert(e.getMessage.toLowerCase.contains("unknown"), e.getMessage)
  }

  test("INSERT INTO and INSERT OVERWRITE") {
    val p = freshTable("sqlins")
    spark.sql(s"INSERT INTO graft.`$p` VALUES (6, 'd', 60.0), (7, 'd', 70.0)")
    assert(GraftTable(spark, p).toDf().count() == 7)
    // positional coercion: ints coerce to the table's long/double
    spark.sql(s"INSERT OVERWRITE graft.`$p` VALUES (9, 'x', 90)")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "cat", "v").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((9L, "x", 90.0)))
  }

  test("INSERT INTO with static partition value") {
    val p = freshTable("sqlins2")
    spark.sql(s"INSERT INTO graft.`$p` PARTITION (cat='q') VALUES (8, 80.0)")
    val r = GraftTable(spark, p).toDf().filter(col("cat") === "q")
      .select("id", "v").collect()
    assert(r.length == 1 && r(0).getLong(0) == 8L && r(0).getDouble(1) == 80.0)
  }

  test("INSERT OVERWRITE with static PARTITION value replaces only that partition") {
    val p = freshTable("sqlinsp")
    spark.sql(s"INSERT OVERWRITE graft.`$p` PARTITION (cat='a') VALUES (7, 70.0)")
    val rows = GraftTable(spark, p).toDf()
      .select("id", "cat", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    // cat='a' rows (ids 1, 3) replaced by the single new row; b/c untouched
    assert(rows.toSeq == Seq(
      (2L, "b", 20.0), (4L, "c", 40.0), (5L, "b", 50.0), (7L, "a", 70.0)))
  }

  test("INSERT OVERWRITE under partitionOverwriteMode=dynamic replaces only touched partitions") {
    val p = freshTable("sqldyn")
    val before = GraftTable(spark, p).snapshot().files
      .filter(_.partitionValues("cat") != "b").map(_.path).toSet
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try spark.sql(s"INSERT OVERWRITE graft.`$p` VALUES (9, 'b', 90.0)")
    finally spark.conf.unset(key)
    val rows = GraftTable(spark, p).toDf()
      .select("id", "cat", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", 10.0), (3L, "a", 30.0), (4L, "c", 40.0), (9L, "b", 90.0)))
    // untouched partitions kept their physical files
    val after = GraftTable(spark, p).snapshot().files
      .filter(_.partitionValues("cat") != "b").map(_.path).toSet
    assert(after == before)
  }

  test("fully static PARTITION overwrite clears the partition even in dynamic mode") {
    val p = freshTable("sqldynstat")
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    // empty source: static semantics still empty the named partition
    try spark.sql(
      s"INSERT OVERWRITE graft.`$p` PARTITION (cat='a') SELECT id, v FROM graft.`$p` WHERE false")
    finally spark.conf.unset(key)
    val cats = GraftTable(spark, p).toDf()
      .select("cat").collect().map(_.getString(0)).toSet
    assert(cats == Set("b", "c"))
  }

  test("INSERT OVERWRITE PARTITION on a non-partition column is rejected") {
    val p = freshTable("sqlinsbad")
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE graft.`$p` PARTITION (v=1.0) VALUES (7, 'a')")
    }
    assert(e.getMessage.contains("non-partition column"), e.getMessage)
  }

  test("ALTER TABLE graft.`path` ADD COLUMNS / SET / UNSET TBLPROPERTIES") {
    val p = freshTable("sqlalter")
    spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (note STRING)")
    val rows = spark.sql(s"SELECT id, note FROM graft.`$p`").collect()
    assert(rows.length == 5 && rows.forall(_.isNullAt(1)))
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('graft.cdf'='true')")
    assert(graft.io.Cdc.enabled(GraftTable(spark, p).log.tableProperties()))
    spark.sql(s"ALTER TABLE graft.`$p` UNSET TBLPROPERTIES ('graft.cdf')")
    assert(!graft.io.Cdc.enabled(GraftTable(spark, p).log.tableProperties()))
    // non-persistable keys and duplicate columns are rejected loudly
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('team'='data')")
    }
    assert(e.getMessage.contains("graft."), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (note STRING)")
    }
    assert(e2.getMessage.toLowerCase.contains("already exists"), e2.getMessage)
  }

  test("ALTER TABLE graft.`path` ADD/DROP CONSTRAINT ... CHECK") {
    val p = freshTable("sqlcons")
    spark.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT positive CHECK (v > 0)")
    // constraint enforced on subsequent writes
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$p` VALUES (6, 'd', -1.0)")
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
    // existing violating data rejects the constraint outright
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT tiny CHECK (v < 15.0)")
    }
    assert(e2.getMessage.contains("existing rows violate"), e2.getMessage)
    spark.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT positive")
    spark.sql(s"INSERT INTO graft.`$p` VALUES (6, 'd', -1.0)") // now fine
    assert(GraftTable(spark, p).toDf().count() == 6)
    // IF EXISTS tolerates a missing name; plain DROP does not
    spark.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` DROP CONSTRAINT nope")
    }
  }

  test("ALTER TABLE graft.`path` DROP COLUMN is metadata-only") {
    val p = freshTable("sqldrop")
    spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN v")
    assert(GraftTable(spark, p).snapshot().schema.fieldNames.toSeq
      == Seq("id", "cat"))
    // rows read back without the dropped column; files were not rewritten
    val rows = spark.sql(s"SELECT id FROM graft.`$p` ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 3L, 4L, 5L))
    // IF EXISTS tolerates a missing name; partition columns are protected
    spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN IF EXISTS nope")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN cat")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // a column referenced by a CHECK constraint cannot be dropped
    spark.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT haveid CHECK (id > 0)")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN id")
    }
    assert(e2.getMessage.contains("haveid"), e2.getMessage)
  }

  test("ALTER COLUMN TYPE widening is metadata-only across file generations") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val p = tmpDir("sqlwiden")
    GraftWriter.write(spark,
      Seq((1, 1.5f), (2, 2.5f)).toDF("n", "x"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val filesBefore = GraftTable(spark, p).snapshot().files.map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN n TYPE bigint")
    spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN x TYPE double")
    val t = GraftTable(spark, p)
    // metadata-only: no file was rewritten
    assert(t.snapshot().files.map(_.path).toSet == filesBefore)
    assert(t.snapshot().schema("n").dataType == LongType)
    assert(t.snapshot().schema("x").dataType == DoubleType)
    // gen-2 append carries a value beyond int range
    GraftWriter.write(spark, Seq((5000000000L, 9.25)).toDF("n", "x"), p,
      WriteOptions(mode = WriteMode.Append))
    val rows = spark.sql(s"SELECT n, x FROM graft.`$p` ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.5), (2L, 2.5), (5000000000L, 9.25)), rows)
    // the protocol feature is stamped on BOTH sides: pre-widening
    // builds must fail loudly, not mis-read narrow files
    val props = t.log.tableProperties()
    Seq(graft.log.Protocol.ReaderFeaturesKey,
      graft.log.Protocol.WriterFeaturesKey).foreach { k =>
      assert(graft.log.Protocol.parse(props, k)
        .contains(graft.log.Protocol.TypeWidening), s"$k missing feature")
    }
    // stats pruning still works across generations: int-stats gen-1
    // files prune against a long probe
    import graft.io.{DataFilter, SkipOp}
    assert(t.filesAfterPruning(Seq(DataFilter("n", SkipOp.Eq, 5000000000L))) == 1)
    // narrowing and no-op retype are refused
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN n TYPE int")
    }
    assert(e1.getMessage.contains("widening"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN x TYPE double")
    }
    assert(e2.getMessage.contains("widening"), e2.getMessage)
    // partition columns are protected (directory-typed layout)
    val pp = freshTable("sqlwidenpart")
    val e3 = intercept[Exception] {
      graft.io.Alter.alter(spark, pp, alterColTypes =
        Seq(("cat", org.apache.spark.sql.types.StringType)))
    }
    assert(e3.getMessage.contains("widening") ||
      e3.getMessage.contains("partition"), e3.getMessage)
    // decimal growth needs integer-digit headroom
    assert(graft.io.Alter.isSafeWidening(
      org.apache.spark.sql.types.DecimalType(5, 2),
      org.apache.spark.sql.types.DecimalType(12, 4)))
    assert(!graft.io.Alter.isSafeWidening(
      org.apache.spark.sql.types.DecimalType(5, 2),
      org.apache.spark.sql.types.DecimalType(6, 4)))
  }

  test("ALTER COLUMN SET/DROP DEFAULT drives the graft.default property") {
    import spark.implicits._
    val p = tmpDir("sqldefault")
    GraftWriter.write(spark, Seq((1L, "explicit")).toDF("id", "tag"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN tag SET DEFAULT upper('dflt')")
    // an append omitting the column gets the default
    GraftWriter.write(spark, Seq(2L).toDF("id"), p,
      WriteOptions(mode = WriteMode.Append))
    assert(spark.sql(s"SELECT tag FROM graft.`$p` WHERE id = 2")
      .head().getString(0) == "DFLT")
    // DROP DEFAULT: omitting the column is a schema mismatch again —
    // a default is exactly what makes omission legal on this writer
    spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN tag DROP DEFAULT")
    assert(!GraftTable(spark, p).log.tableProperties()
      .contains(graft.io.Generated.DefaultPrefix + "tag"))
    val eDrop = intercept[Exception] {
      GraftWriter.write(spark, Seq(3L).toDF("id"), p,
        WriteOptions(mode = WriteMode.Append))
    }
    assert(eDrop.getMessage.contains("schema mismatch"), eDrop.getMessage)
    // declaration-time validation: unknown column and column-referencing
    // expressions are refused at the ALTER
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN ghost SET DEFAULT 'x'")
    }
    assert(e1.getMessage.contains("unknown column") ||
      e1.getMessage.toLowerCase.contains("ghost"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN tag SET DEFAULT concat('v', id)")
    }
    assert(e2.getMessage.contains("column-free"), e2.getMessage)
  }

  test("ALTER TABLE graft.`path` RENAME COLUMN is metadata-only") {
    val p = freshTable("sqlren")
    val filesBefore = GraftTable(spark, p).snapshot().files.map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO amount")
    // schema renamed; data files untouched (they keep the physical name)
    assert(GraftTable(spark, p).snapshot().schema.fieldNames.toSeq
      == Seq("id", "cat", "amount"))
    assert(GraftTable(spark, p).snapshot().files.map(_.path).toSet == filesBefore)
    // old files read back under the NEW name
    val rows = spark.sql(s"SELECT id, amount FROM graft.`$p` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
    // filters on the new name still push down and return the right rows
    assert(spark.sql(s"SELECT id FROM graft.`$p` WHERE amount > 25.0")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
    // writes AFTER the rename (logical name in, physical name in files):
    // both file generations serve the same logical column
    spark.sql(s"INSERT INTO graft.`$p` VALUES (6, 'd', 60.0)")
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$p`").head().getDouble(0)
      == 210.0)
    // DML through the renamed column
    spark.sql(s"UPDATE graft.`$p` SET amount = 99.0 WHERE id = 1")
    assert(spark.sql(s"SELECT amount FROM graft.`$p` WHERE id = 1")
      .head().getDouble(0) == 99.0)
    // time travel to a pre-rename version sees the OLD name
    assert(spark.sql(s"SELECT * FROM graft.`$p` VERSION AS OF 0").columns.toSeq
      == Seq("id", "cat", "v"))
    // rename chains resolve to the original physical name
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN amount TO price")
    assert(spark.sql(s"SELECT sum(price) FROM graft.`$p`").head().getDouble(0)
      == 299.0)
    // guards: partition columns, existing names, constraint references
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN cat TO category")
    }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN id TO price")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    spark.sql(s"ALTER TABLE graft.`$p` ADD CONSTRAINT pricey CHECK (price >= 0)")
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN price TO cost")
    }
    assert(e3.getMessage.contains("pricey"), e3.getMessage)
    // the constraint still enforces against the renamed column's data
    val e4 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$p` VALUES (7, 'e', -1.0)")
    }
    assert(e4.getMessage.contains("pricey"), e4.getMessage)
  }

  test("CREATE TABLE graft.`path` AS SELECT (path-route CTAS)") {
    val p = freshTable("sqlctas")
    val p2 = tmpDir("sqlctas2")
    spark.sql(s"""CREATE TABLE graft.`$p2` USING graft PARTITIONED BY (cat)
      TBLPROPERTIES ('graft.cdf'='true')
      AS SELECT id, cat, v FROM graft.`$p` WHERE v > 15.0""")
    val t = GraftTable(spark, p2)
    assert(t.toDf().count() == 4) // v in {20,30,40,50}
    assert(t.snapshot().partitionColumns == Seq("cat"))
    assert(t.log.tableProperties().get("graft.cdf").contains("true"))
    // existing target: IF NOT EXISTS is a no-op, plain CTAS errors
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$p2` USING graft " +
      s"AS SELECT * FROM graft.`$p`")
    assert(t.toDf().count() == 4)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$p2` USING graft AS SELECT * FROM graft.`$p`")
    }
    // a different USING provider is NOT hijacked into a graft table
    val p3 = tmpDir("sqlctas3")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$p3` (a INT) USING parquet")
    }
    assert(!GraftTable.exists(spark, p3))
  }

  test("TRUNCATE TABLE is metadata-only and time travel survives it") {
    val p = freshTable("sqltrunc")
    val filesBefore = GraftTable(spark, p).snapshot().files.map(_.path).toSet
    spark.sql(s"TRUNCATE TABLE graft.`$p`")
    val t = GraftTable(spark, p)
    assert(t.toDf().count() == 0)
    assert(t.snapshot().schema.fieldNames.toSeq == Seq("id", "cat", "v"))
    // metadata-only: the data files still exist on disk (vacuum's job)
    assert(filesBefore.forall(f =>
      new java.io.File(p, f).exists()))
    // and the pre-truncate version still reads
    assert(spark.sql(s"SELECT * FROM graft.`$p` VERSION AS OF 0").count() == 5)
    // table remains writable
    spark.sql(s"INSERT INTO graft.`$p` VALUES (9, 'z', 90.0)")
    assert(t.toDf().count() == 1)
  }

  test("SHOW CREATE TABLE emits executable round-trippable DDL") {
    val p = freshTable("sqlshowcr")
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('graft.cdf'='true')")
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO amount")
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$p`").head().getString(0)
    assert(ddl.contains("PARTITIONED BY (`cat`)"), ddl)
    assert(ddl.contains("'graft.cdf' = 'true'"), ddl)
    // renamed columns surface under their LOGICAL name, and the colmap
    // (physical names of THIS table's files) must not be inherited
    assert(ddl.contains("`amount`"), ddl)
    assert(!ddl.contains("colmap"), ddl)
    // the DDL executes as-is against a fresh path and reproduces the
    // table shape
    val p2 = tmpDir("sqlshowcr2")
    spark.sql(ddl.replace(s"graft.`$p`", s"graft.`$p2`"))
    val (t1, t2) = (GraftTable(spark, p).snapshot(), GraftTable(spark, p2).snapshot())
    assert(t2.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      t1.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(t2.partitionColumns == t1.partitionColumns)
    assert(GraftTable(spark, p2).log.tableProperties()
      .get("graft.cdf").contains("true"))
    // and the clone's own SHOW CREATE TABLE is identical modulo path
    val ddl2 = spark.sql(s"SHOW CREATE TABLE graft.`$p2`").head().getString(0)
    assert(ddl2 == ddl.replace(s"graft.`$p`", s"graft.`$p2`"))
  }

  test("rename/drop/re-add column never resurrects dropped data (colmap hygiene)") {
    val p = freshTable("sqlcolmap")
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO amount")
    // a new column named after a live column's PHYSICAL name would put
    // two physical-'v' fields in the data files — rejected
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (v DOUBLE)")
    }
    assert(e.getMessage.contains("physical"), e.getMessage)
    spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN amount")
    // re-adding the renamed name must NOT inherit the stale colmap entry:
    // pre-drop files (physical 'v') read as null under the new column
    spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (amount DOUBLE)")
    assert(spark.sql(s"SELECT amount FROM graft.`$p`").collect()
      .forall(_.isNullAt(0)))
    // the re-added column is fully writable/readable
    spark.sql(s"UPDATE graft.`$p` SET amount = 1.5 WHERE id = 1")
    assert(spark.sql(s"SELECT amount FROM graft.`$p` WHERE id = 1")
      .head().getDouble(0) == 1.5)
    assert(spark.sql(s"SELECT amount FROM graft.`$p` WHERE id = 2")
      .head().isNullAt(0))
    // plain drop→re-add (no rename involved): the dropped column's
    // physical name is tombstoned, so the re-add maps to a fresh physical
    // identity and old file generations read as null — even when the
    // re-added type differs
    spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN amount")
    spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (amount STRING)")
    assert(spark.sql(s"SELECT amount FROM graft.`$p`").collect()
      .forall(_.isNullAt(0)))
    spark.sql(s"UPDATE graft.`$p` SET amount = 'x' WHERE id = 3")
    assert(spark.sql(s"SELECT amount FROM graft.`$p` WHERE id = 3")
      .head().getString(0) == "x")
  }

  test("data skipping stays sharp across a rename (stats keyed physically)") {
    import spark.implicits._
    val p = tmpDir("sqlrenskip")
    // two files with disjoint ranges of k
    GraftWriter.write(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "k").coalesce(1), p,
      WriteOptions(mode = WriteMode.Overwrite))
    GraftWriter.write(spark, Seq((3L, 100.0), (4L, 200.0)).toDF("id", "k").coalesce(1), p,
      WriteOptions(mode = WriteMode.Append))
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN k TO score")
    val t = GraftTable(spark, p)
    // pruning by the NEW logical name consults the physically-keyed stats
    assert(t.filesAfterPruning(Seq(graft.io.DataFilter(
      "score", graft.io.SkipOp.Gt, 50.0))) == 1)
    assert(t.scanPruned(Seq(graft.io.DataFilter(
      "score", graft.io.SkipOp.Gt, 50.0))).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(3L, 4L))
  }

  test("SHOW TBLPROPERTIES and DESCRIBE on graft.`path` targets") {
    val p = freshTable("sqldesc")
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('graft.cdf'='true')")
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$p`")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("graft.cdf").contains("true"))
    val one = spark.sql(s"SHOW TBLPROPERTIES graft.`$p` ('graft.cdf')").collect()
    assert(one.length == 1 && one(0).toSeq.last == "true")
    val desc = spark.sql(s"DESCRIBE graft.`$p`")
      .collect().map(_.getString(0)).toSeq
    // data columns plus the partition section (table partitioned by cat)
    assert(desc.take(3) == Seq("id", "cat", "v"))
    assert(desc.contains("# Partition Information") && desc.count(_ == "cat") == 2)
    val ext = spark.sql(s"DESCRIBE EXTENDED graft.`$p`")
      .collect().map(_.getString(0)).toSeq
    assert(ext.contains("Location") && ext.contains("Provider"))
    val cols = spark.sql(s"SHOW COLUMNS FROM graft.`$p`")
      .collect().map(_.getString(0)).toSeq
    assert(cols == Seq("id", "cat", "v"))
    val parts = spark.sql(s"SHOW PARTITIONS graft.`$p`")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("cat=a", "cat=b", "cat=c"))
  }

  test("SELECT ... FROM graft.`path` reads the native columnar plan") {
    val p = freshTable("sqlsel")
    val rows = spark.sql(
      s"SELECT cat, count(*) AS n FROM graft.`$p` GROUP BY cat ORDER BY cat")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    // the substituted plan is the native parquet scan, not the V1 RDD path
    val physical = spark.sql(s"SELECT id FROM graft.`$p`")
      .queryExecution.executedPlan.toString
    assert(physical.contains("FileScan parquet"), physical)
  }

  test("SQL read joins against a temp view") {
    import spark.implicits._
    val p = freshTable("sqljoin")
    Seq(("a", "alpha"), ("b", "beta")).toDF("cat", "label")
      .createOrReplaceTempView("cat_names")
    val rows = spark.sql(
      s"""SELECT n.label, sum(g.v) AS sv FROM graft.`$p` g
          JOIN cat_names n ON g.cat = n.cat GROUP BY n.label ORDER BY n.label""")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("alpha", 40.0), ("beta", 70.0)))
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel in SQL") {
    val p = freshTable("sqltt")
    val tsAfterV0 = System.currentTimeMillis()
    Thread.sleep(10) // keep the delete commit's timestamp strictly later
    spark.sql(s"DELETE FROM graft.`$p` WHERE id <= 3")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p` VERSION AS OF 0")
      .head().getLong(0) == 5L)
    val ts = new java.sql.Timestamp(tsAfterV0).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$p` TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 5L)
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL / OPTIMIZE / VACUUM / RESTORE") {
    val p = freshTable("sqlmaint")
    spark.sql(s"DELETE FROM graft.`$p` WHERE id = 1")
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$p`").collect()
    assert(hist.length == 2 && hist(0).getAs[String]("operation") == "DELETE")
    val detail = spark.sql(s"DESCRIBE DETAIL graft.`$p`").head()
    assert(detail.getAs[String]("format") == "graft" &&
      detail.getAs[Long]("num_records") == 4L)
    // a second file in partition cat=a makes OPTIMIZE non-trivial
    spark.sql(s"INSERT INTO graft.`$p` VALUES (6, 'a', 60.0)") // v2
    val v3 = spark.sql(s"OPTIMIZE graft.`$p`").head().getLong(0)
    assert(v3 == 3L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 5L)
    spark.conf.set("spark.graft.vacuum.retentionCheck", "false")
    try {
      val dry = spark.sql(s"VACUUM graft.`$p` RETAIN 0 HOURS DRY RUN").collect()
      assert(dry.nonEmpty) // pre-compaction files are vacuumable
      spark.sql(s"VACUUM graft.`$p` RETAIN 0 HOURS")
    } finally spark.conf.unset("spark.graft.vacuum.retentionCheck")
    // restore-to-current after vacuum: checks the statement round-trips
    val v4 = spark.sql(s"RESTORE graft.`$p` TO VERSION AS OF 3").head().getLong(0)
    assert(v4 == 4L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 5L)
    // TIMESTAMP AS OF: far-future wall clock = latest version (at-or-before)
    val v5 = spark.sql(
      s"RESTORE graft.`$p` TO TIMESTAMP AS OF '2100-01-01 00:00:00'")
      .head().getLong(0)
    assert(v5 == 5L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 5L)
  }

  test("OPTIMIZE WHERE compacts only the matching partitions") {
    val p = freshTable("sqloptwhere")
    // two small files in each of cat=a and cat=b
    spark.sql(s"INSERT INTO graft.`$p` VALUES (7, 'a', 70.0)")
    spark.sql(s"INSERT INTO graft.`$p` VALUES (8, 'b', 80.0)")
    val t = io.GraftTable(spark, p)
    def filesIn(cat: String): Seq[String] = t.snapshot().files
      .filter(_.partitionValues.get("cat").contains(cat)).map(_.path)
    val aBefore = filesIn("a")
    val bBefore = filesIn("b")
    assert(aBefore.size > 1 && bBefore.size > 1)
    spark.sql(s"OPTIMIZE graft.`$p` WHERE cat = 'a'").head().getLong(0)
    assert(filesIn("a").size == 1)
    assert(filesIn("b").toSet == bBefore.toSet) // untouched
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 7L)
    // WHERE + ZORDER BY re-clusters ONLY the matching partitions
    spark.sql(s"INSERT INTO graft.`$p` VALUES (9, 'b', 90.0)")
    val bPre = filesIn("b").toSet
    val aPre = filesIn("a").toSet
    spark.sql(s"OPTIMIZE graft.`$p` WHERE cat = 'b' ZORDER BY (id, v)")
    assert(filesIn("a").toSet == aPre, "out-of-scope partition untouched")
    assert(filesIn("b").toSet != bPre, "scoped partition re-clustered")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 8L)
  }

  test("OPTIMIZE ZORDER BY clusters files for skipping") {
    val p = freshTable("sqlzorder")
    val v = spark.sql(s"OPTIMIZE graft.`$p` ZORDER BY (id, v)").head().getLong(0)
    assert(v == 1L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$p`").head().getLong(0) == 5L)
  }

  test("declared clusterBy keys make plain OPTIMIZE cluster (liquid-style)") {
    import spark.implicits._
    val p = tmpDir("sqlcluster")
    // 4 files with k STRIPED across them: min/max spans the range
    // everywhere, so stats prune nothing before clustering
    (0 until 4).foreach { i =>
      GraftWriter.write(spark,
        (0 until 64).map(j => (j * 4L + i, s"v$j")).toDF("k", "v").coalesce(1),
        p, WriteOptions(mode =
          if (i == 0) WriteMode.Overwrite else WriteMode.Append))
    }
    val t0 = GraftTable(spark, p)
    assert(t0.filesAfterPruning(
      Seq(graft.io.DataFilter("k", graft.io.SkipOp.Le, 10L))) == 4)
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES " +
      s"('${GraftWriter.ClusterByKey}' = 'k')")
    // PLAIN OPTIMIZE now clusters by the declared key (small file cap
    // so the clustering is observable across several output files)
    GraftWriter.optimize(spark, p, maxRecordsPerFile = 64)
    val t1 = GraftTable(spark, p)
    assert(t1.toDf().count() == 256)
    assert(t1.snapshot().files.size >= 4)
    assert(t1.filesAfterPruning(
      Seq(graft.io.DataFilter("k", graft.io.SkipOp.Le, 10L))) == 1,
      "declared-key clustering must make the range probe prune files")
    // the SQL statement routes the same way (single file at default cap)
    assert(spark.sql(s"OPTIMIZE graft.`$p`").head().getLong(0) > 0)
    // declaration validates: unknown and partition keys are refused
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES " +
        s"('${GraftWriter.ClusterByKey}' = 'ghost')")
    }
    assert(e.getMessage.contains("unknown column"), e.getMessage)
    val pp = freshTable("sqlclusterpart")
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$pp` SET TBLPROPERTIES " +
        s"('${GraftWriter.ClusterByKey}' = 'cat')")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
  }

  test("CLUSTER BY DDL: CREATE/ALTER clause routes to the declared layout") {
    import spark.implicits._
    // path route: the clause lands as the carried graft.clusterBy prop
    val p = tmpDir("ddlcluster") + "/t"
    spark.sql(s"CREATE TABLE graft.`$p` (k BIGINT, v STRING) USING graft " +
      "CLUSTER BY (k)")
    assert(GraftTable(spark, p).log.tableProperties()
      .get(GraftWriter.ClusterByKey).contains("k"))
    // the declaration drives plain OPTIMIZE exactly like the property route
    (0 until 4).foreach { i =>
      GraftWriter.write(spark,
        (0 until 64).map(j => (j * 4L + i, s"v$j")).toDF("k", "v").coalesce(1),
        p, WriteOptions(mode = WriteMode.Append))
    }
    GraftWriter.optimize(spark, p, maxRecordsPerFile = 64)
    assert(GraftTable(spark, p).filesAfterPruning(
      Seq(graft.io.DataFilter("k", graft.io.SkipOp.Le, 10L))) == 1)
    // ALTER TABLE ... CLUSTER BY re-declares; NONE drops
    spark.sql(s"ALTER TABLE graft.`$p` CLUSTER BY (v)")
    assert(GraftTable(spark, p).log.tableProperties()
      .get(GraftWriter.ClusterByKey).contains("v"))
    spark.sql(s"ALTER TABLE graft.`$p` CLUSTER BY NONE")
    assert(!GraftTable(spark, p).log.tableProperties()
      .contains(GraftWriter.ClusterByKey))
    spark.sql(s"ALTER TABLE graft.`$p` CLUSTER BY (k, v)")
    assert(GraftTable(spark, p).log.tableProperties()
      .get(GraftWriter.ClusterByKey).contains("k,v"))
    // DESCRIBE DETAIL surfaces the layout (Delta's clusteringColumns)
    assert(spark.sql(s"DESCRIBE DETAIL graft.`$p`").head()
      .getAs[String]("clustering_columns") == "k,v")
    // SHOW CREATE TABLE renders the clause (not the raw property) and
    // the emitted DDL round-trips: executing it re-declares the layout
    val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$p`").head().getString(0)
    assert(ddl.contains("CLUSTER BY (`k`, `v`)"), ddl)
    assert(!ddl.contains(GraftWriter.ClusterByKey), ddl)
    val p2 = tmpDir("ddlcluster2") + "/t"
    spark.sql(ddl.replace(s"graft.`$p`", s"graft.`$p2`"))
    assert(GraftTable(spark, p2).log.tableProperties()
      .get(GraftWriter.ClusterByKey).contains("k,v"))
    // unknown clustering key is refused at CREATE (Spark's analyzer
    // validates the clause against the declared schema before our rule)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir("ddlclusterbad")}/t` " +
        "(k BIGINT) USING graft CLUSTER BY (ghost)")
    }
    assert(e.getMessage.contains("ghost"), e.getMessage)
    // catalog route: CREATE ... CLUSTER BY + ALTER ... CLUSTER BY
    val root = tmpDir("ddlcluster_cat")
    spark.conf.set("spark.sql.catalog.clcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.clcat.root", root)
    try {
      spark.sql("CREATE NAMESPACE clcat.ns")
      spark.sql("CREATE TABLE clcat.ns.t (k BIGINT, v STRING) USING graft " +
        "CLUSTER BY (k)")
      assert(GraftTable(spark, s"$root/ns/t").log.tableProperties()
        .get(GraftWriter.ClusterByKey).contains("k"))
      spark.sql("ALTER TABLE clcat.ns.t CLUSTER BY (v)")
      assert(GraftTable(spark, s"$root/ns/t").log.tableProperties()
        .get(GraftWriter.ClusterByKey).contains("v"))
      spark.sql("ALTER TABLE clcat.ns.t CLUSTER BY NONE")
      assert(!GraftTable(spark, s"$root/ns/t").log.tableProperties()
        .contains(GraftWriter.ClusterByKey))
    } finally {
      spark.conf.unset("spark.sql.catalog.clcat")
      spark.conf.unset("spark.sql.catalog.clcat.root")
    }
  }

  test("table_changes / table_changes_by_path TVFs serve batch CDF in SQL") {
    import spark.implicits._
    val p = tmpDir("sqltvf") + "/t"
    io.GraftWriter.write(spark, Seq((1L, "a")).toDF("k", "v"), p,
      io.WriteOptions(mode = io.WriteMode.Overwrite))
    io.GraftWriter.write(spark, Seq((2L, "b")).toDF("k", "v"), p,
      io.WriteOptions(mode = io.WriteMode.Append))
    Thread.sleep(5) // distinct wall-clock ms for the timestamp-start assert
    merge.Dml.delete(spark, p, col("k") === 1L)
    // by path, from version 1: the append's insert + the delete
    val got = spark.sql(s"SELECT k, _change_type FROM table_changes_by_path('$p', 1)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "insert"), (1L, "delete")))
    // graft.`path` form with an end bound
    val bounded = spark.sql(
      s"SELECT k, _change_type FROM table_changes('graft.`$p`', 1, 1)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bounded == Set((2L, "insert")))
    // timestamp start: from the delete commit's wall clock onward
    val delTs = io.GraftTable(spark, p).history().find(_.version == 2L).get.timestampMs
    val tsStr = java.time.Instant.ofEpochMilli(delTs)
      .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val fromTs = spark.sql(
      s"SELECT k, _change_type FROM table_changes_by_path('$p', '$tsStr')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromTs == Set((1L, "delete")))
    // catalog-name form
    val root = tmpDir("sqltvf_cat")
    spark.conf.set("spark.sql.catalog.tvfcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tvfcat.root", root)
    new java.io.File(s"$root/ns").mkdirs()
    io.GraftWriter.write(spark, Seq((9L, "z")).toDF("k", "v"), s"$root/ns/t9",
      io.WriteOptions(mode = io.WriteMode.Overwrite))
    io.GraftWriter.write(spark, Seq((10L, "y")).toDF("k", "v"), s"$root/ns/t9",
      io.WriteOptions(mode = io.WriteMode.Append))
    val cat = spark.sql(
      "SELECT k, _change_type FROM table_changes('tvfcat.ns.t9', 1)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cat == Set((10L, "insert")))
    // session-catalog `USING graft` named table (Delta's primary form)
    spark.sql(s"CREATE TABLE tvf_events USING graft OPTIONS (path '$p')")
    try {
      val named = spark.sql(
        "SELECT k, _change_type FROM table_changes('tvf_events', 1, 1)")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(named == Set((2L, "insert")))
      // the shared resolver serves the maintenance surface on session-
      // catalog names too, not just the TVF
      assert(spark.sql("DESCRIBE HISTORY tvf_events").count() == 3)
      spark.sql("OPTIMIZE tvf_events")
    } finally spark.sql("DROP TABLE tvf_events")
  }

  test("non-graft DML is left to Spark (still errors as before)") {
    intercept[Exception] {
      spark.sql("DELETE FROM nonexistent_tbl WHERE 1=1")
    }
  }

  test("SHOW VECTOR INDEXES / SHOW DEDUP STORES enumerate a lake root") {
    import spark.implicits._
    val root = tmpDir("show_root")
    // one data table (never listed), one vector index, one dedup store
    val dataP = s"$root/data"
    GraftWriter.write(spark,
      (0L until 60L).map(i =>
        (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat), s"text $i body"))
        .toDF("vec_id", "embedding", "text")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      dataP, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.io.Cdc.PropKey -> "true")))
    val idxP = s"$root/indexes/emb_ix"
    spark.sql(s"CREATE VECTOR INDEX graft.`$idxP` ON graft.`$dataP` " +
      "(embedding) ID vec_id OPTIONS ('numCells' = '4', 'm' = '4', " +
      "'ksub' = '8', 'metric' = 'ip')")
    val storeP = s"$root/stores/fp"
    spark.sql(s"CREATE DEDUP STORE graft.`$storeP` ON graft.`$dataP` " +
      "(text) ID vec_id")
    val ix = spark.sql(s"SHOW VECTOR INDEXES IN '$root'").collect()
    assert(ix.length == 1, ix.mkString(";"))
    assert(ix.head.getString(ix.head.fieldIndex("path")) == idxP)
    assert(ix.head.getString(ix.head.fieldIndex("metric")) == "ip")
    assert(!ix.head.getBoolean(ix.head.fieldIndex("stale")))
    val st = spark.sql(s"SHOW DEDUP STORES IN '$root'").collect()
    assert(st.length == 1, st.mkString(";"))
    assert(st.head.getString(st.head.fieldIndex("path")) == storeP)
    assert(!st.head.getBoolean(st.head.fieldIndex("stale")))
    // staleness shows up in the listing after a source append
    GraftWriter.write(spark,
      Seq((100L, Array.fill(8)(1f), "new doc")).toDF("vec_id", "embedding", "text")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      dataP, WriteOptions(mode = WriteMode.Append))
    assert(spark.sql(s"SHOW VECTOR INDEXES IN '$root'")
      .collect().head.getBoolean(5))
    assert(spark.sql(s"SHOW DEDUP STORES IN '$root'")
      .collect().head.getBoolean(4))
    // a root with no indexes/stores lists empty (incl. nonexistent path)
    assert(spark.sql(s"SHOW VECTOR INDEXES IN '$root/none'").collect().isEmpty)
    assert(spark.sql(s"SHOW DEDUP STORES IN '$dataP'").collect().isEmpty)
    // matviews list with their definition + staleness; the data table,
    // index, and store never appear here
    val mvP = s"$root/views/by_none"
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mvP` AS " +
      s"SELECT vec_id, count(*) AS n FROM graft.`$dataP` GROUP BY vec_id")
    val mv = spark.sql(s"SHOW MATERIALIZED VIEWS IN '$root'").collect()
    assert(mv.length == 1 && mv.head.getString(0) == mvP, mv.mkString(";"))
    assert(mv.head.getString(mv.head.fieldIndex("group_keys")) == "vec_id")
    assert(!mv.head.getBoolean(mv.head.fieldIndex("stale")))
    // a user view reads aux_of NULL; a count(DISTINCT) support relation
    // would name its owner here (discovery tells the two apart)
    assert(mv.head.isNullAt(mv.head.fieldIndex("aux_of")))
    // DESCRIBE MATERIALIZED VIEW is the per-object deep dive
    val dmv = spark.sql(s"DESCRIBE MATERIALIZED VIEW graft.`$mvP`").head()
    assert(dmv.getString(dmv.fieldIndex("source_path")) == dataP &&
      !dmv.getBoolean(dmv.fieldIndex("stale")))
  }

  test("SHOW ... MAX DEPTH widens the bounded discovery walk") {
    import spark.implicits._
    val root = tmpDir("show_deep_root")
    val dataP = s"$root/data"
    GraftWriter.write(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      dataP, WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(graft.io.Cdc.PropKey -> "true")))
    // a view nested FIVE directory levels down — past the default bound
    val deepMv = s"$root/a/b/c/d/by_id"
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$deepMv` AS " +
      s"SELECT id, count(*) AS n FROM graft.`$dataP` GROUP BY id")
    // the default walk (3 levels) prunes it — an empty result, but the
    // walk self-reports the truncation (warning + flag) instead of
    // reading as "none exist"
    val (hits, truncated) = graft.plans.GraftTableWalk
      .graftTablesUnder(spark, root)
    assert(!hits.contains(deepMv) && truncated,
      s"hits=$hits truncated=$truncated")
    assert(spark.sql(s"SHOW MATERIALIZED VIEWS IN '$root'")
      .collect().map(_.getString(0)).forall(_ != deepMv))
    // MAX DEPTH n reaches it — and a wide-enough walk reports NO
    // truncation (tables at any depth stop descent at their boundary)
    val deep = spark.sql(
      s"SHOW MATERIALIZED VIEWS IN '$root' MAX DEPTH 6").collect()
    assert(deep.exists(_.getString(0) == deepMv), deep.mkString(";"))
    val (hits6, truncated6) = graft.plans.GraftTableWalk
      .graftTablesUnder(spark, root, maxDepth = 6)
    assert(hits6.contains(deepMv) && !truncated6,
      s"hits=$hits6 truncated=$truncated6")
    // the other SHOW statements accept the clause too
    assert(spark.sql(s"SHOW VECTOR INDEXES IN '$root' MAX DEPTH 6")
      .collect().isEmpty)
    assert(spark.sql(s"SHOW DEDUP STORES IN '$root' MAX DEPTH 6")
      .collect().isEmpty)
  }
}
