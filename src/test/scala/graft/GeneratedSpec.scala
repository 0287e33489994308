package graft

import org.apache.spark.sql.functions._

import graft.io.{Generated, GraftTable, GraftWriter, WriteMode, WriteOptions}
import graft.merge.Dml

/** Generated and identity columns ([[graft.io.Generated]]): declared as
  * carried-forward table properties, auto-computed/assigned on batch
  * writes, validated on every write path that goes through the written-
  * rows invariant pass (append, overwrite, DML/merge rewrites).
  */
class GeneratedSpec extends SparkSpec {
  import spark.implicits._

  private val genProps =
    Map(s"${Generated.Prefix}total_cents" -> "qty * price_cents")

  test("generated column: computed when absent, validated when supplied") {
    val p = tmpDir("gen") + "/t"
    GraftWriter.write(spark,
      Seq((1L, 2L, 100L), (2L, 3L, 50L)).toDF("id", "qty", "price_cents"),
      p, WriteOptions(mode = WriteMode.Overwrite, metadata = genProps))
    val rows = GraftTable(spark, p).toDf()
      .select("id", "total_cents").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 200L, 2L -> 150L))

    // supplying CORRECT values passes
    GraftWriter.write(spark,
      Seq((3L, 4L, 10L, 40L)).toDF("id", "qty", "price_cents", "total_cents"),
      p, WriteOptions(mode = WriteMode.Append))
    // supplying WRONG values is refused and the files are rolled back
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark,
        Seq((4L, 4L, 10L, 99L)).toDF("id", "qty", "price_cents", "total_cents"),
        p, WriteOptions(mode = WriteMode.Append))
    }
    assert(ex.getMessage.contains("total_cents"))
    assert(GraftTable(spark, p).toDf().count() == 3)

    // an UPDATE changing a referenced base column RECOMPUTES the
    // generated column (Delta parity) instead of refusing
    Dml.update(spark, p, col("id") === 1L, Map("qty" -> lit(9L)))
    assert(GraftTable(spark, p).toDf().filter(col("id") === 1L)
      .select("total_cents").as[Long].head() == 900L)
    // explicitly assigning an INCONSISTENT value is still refused
    intercept[IllegalArgumentException] {
      Dml.update(spark, p, col("id") === 2L,
        Map("qty" -> lit(9L), "total_cents" -> lit(1L)))
    }
    // explicit CONSISTENT assignment passes (validated post-write)
    Dml.update(spark, p, col("id") === 2L,
      Map("qty" -> lit(9L), "total_cents" -> lit(450L)))
    assert(GraftTable(spark, p).toDf().filter(col("id") === 2L)
      .select("total_cents").as[Long].head() == 450L)
  }

  test("supplied columns are resolved case-insensitively (not silently recomputed)") {
    val p = tmpDir("gen_ci") + "/t"
    // generated: supplying under a different case is a SUPPLY — wrong
    // values must be refused, never silently overwritten
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark,
        Seq((1L, 2L, 100L, 999L)).toDF("id", "qty", "price_cents", "TOTAL_CENTS"),
        p, WriteOptions(mode = WriteMode.Overwrite, metadata = genProps))
    }
    assert(ex.getMessage.contains("total_cents") ||
      ex.getMessage.contains("TOTAL_CENTS"))
    // identity: supplied-under-different-case values are kept and the
    // mark advances past them
    val p2 = tmpDir("gen_ci2") + "/t"
    GraftWriter.write(spark, Seq(("a", 50L)).toDF("k", "RID"), p2,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")))
    assert(GraftTable(spark, p2).toDf().select("RID").as[Long].head() == 50L)
    assert(GraftTable(spark, p2).log.tableProperties()(
      Generated.hwmKey("rid")).toLong == 50L)
  }

  test("identity columns cannot be partition columns") {
    val p = tmpDir("ident_part") + "/t"
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark, Seq("a", "b").toDF("k"), p,
        WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("rid"),
          metadata = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")))
    }
    assert(ex.getMessage.contains("partition"))
  }

  test("identity mark falls back to an aggregate when footer stats are absent") {
    import graft.log.AddFile
    val props = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")
    val noStats = Seq(
      AddFile("f1.parquet", Map.empty, 10L, 2L, 0L),
      AddFile("f2.parquet", Map.empty, 10L, 1L, 0L))
    // without a fallback frame: no stats, no advance (pre-fix posture)
    assert(Generated.hwmUpdates(noStats, props).isEmpty)
    // with the written frame: one aggregate pass finds the true edge
    val up = Generated.hwmUpdates(noStats, props,
      writtenFallback = Some(Seq(5L, 9L, 3L).toDF("rid")))
    assert(up(Generated.hwmKey("rid")) == "9")
    // descending identity tracks the min
    val down = Generated.hwmUpdates(noStats,
      Map(s"${Generated.IdentityPrefix}rid" -> "-1,-1"),
      writtenFallback = Some(Seq(-5L, -9L, -3L).toDF("rid")))
    assert(down(Generated.hwmKey("rid")) == "-9")
    // zero-row files never force the fallback pass
    val empty = Seq(AddFile("f3.parquet", Map.empty, 0L, 0L, 0L))
    assert(Generated.hwmUpdates(empty, props,
      writtenFallback = Some(Seq(99L).toDF("rid"))).isEmpty)
  }

  test("default column values fill omitted columns; supplied values win") {
    import graft.merge._
    val p = tmpDir("defaults") + "/t"
    GraftWriter.write(spark,
      Seq((1L, "explicit")).toDF("id", "tag"), p,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(s"${Generated.DefaultPrefix}tag" -> "'dflt'")))
    // append omitting the column -> default
    GraftWriter.write(spark, Seq(2L).toDF("id"), p,
      WriteOptions(mode = WriteMode.Append))
    // append supplying it -> supplied value kept
    GraftWriter.write(spark, Seq((3L, "mine")).toDF("id", "tag"), p,
      WriteOptions(mode = WriteMode.Append))
    val t = GraftTable(spark, p)
    assert(t.toDf().select("id", "tag").as[(Long, String)].collect().toMap ==
      Map(1L -> "explicit", 2L -> "dflt", 3L -> "mine"))
    // unlike generated columns, a default may be declared LATE (it only
    // affects future writes, no invariant on existing rows)
    val p2 = tmpDir("defaults2") + "/t"
    GraftWriter.write(spark, Seq((1L, "x")).toDF("id", "tag"), p2,
      WriteOptions(mode = WriteMode.Overwrite))
    GraftWriter.write(spark, Seq(2L).toDF("id"), p2,
      WriteOptions(mode = WriteMode.Append,
        metadata = Map(s"${Generated.DefaultPrefix}tag" -> "'late'")))
    assert(GraftTable(spark, p2).toDf().filter(col("id") === 2L)
      .select("tag").as[String].head() == "late")
    // a default for a column the table does NOT have never silently
    // evolves the schema
    GraftWriter.write(spark, Seq(3L).toDF("id"), p2,
      WriteOptions(mode = WriteMode.Append,
        metadata = Map(s"${Generated.DefaultPrefix}ghost" -> "'nope'")))
    assert(!GraftTable(spark, p2).toDf().columns.contains("ghost"))
    // merge INSERT VALUES omitting a defaulted column gets the default
    MergeClausesExecutor.merge(spark,
      Seq(9L).toDF("id"), p, "s.id = t.id",
      notMatched = Seq(InsertValues(Map("id" -> col("s.id")))),
      sourceAlias = "s", targetAlias = "t")
    assert(t.toDf().filter(col("id") === 9L)
      .select("tag").as[String].head() == "dflt")
  }

  test("a default expression referencing columns is rejected at fill time") {
    val p = tmpDir("defaults_colref") + "/t"
    // a column-referencing default would resolve against the write frame
    // here but against the source-join frame on merge's insert path —
    // different per-row values per path. Refused loudly instead.
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark,
        Seq((1L, "x")).toDF("id", "tag"), p,
        WriteOptions(mode = WriteMode.Overwrite,
          metadata = Map(s"${Generated.DefaultPrefix}tag" -> "concat('v', id)")))
    }
    assert(ex.getMessage.contains("column-free"), ex.getMessage)
    // nullary function calls remain fine
    GraftWriter.write(spark,
      Seq(1L).toDF("id"), p,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(s"${Generated.DefaultPrefix}tag" -> "upper('ok')")))
    assert(GraftTable(spark, p).toDf()
      .select("tag").as[String].head() == "OK")
  }

  test("clause merge recomputes generated columns PER CLAUSE") {
    import graft.merge._
    val p = tmpDir("gen_clause") + "/t"
    GraftWriter.write(spark,
      Seq((1L, 2L, 100L), (2L, 3L, 100L)).toDF("id", "qty", "price_cents"),
      p, WriteOptions(mode = WriteMode.Overwrite, metadata = genProps))
    // clause 1 (id=1): explicitly assigns BOTH qty and total_cents
    // (consistent); clause 2 (id=2): assigns only qty — total_cents
    // must be RECOMPUTED for its rows, not refused because another
    // clause named it
    val src = Seq((1L, 5L), (2L, 7L)).toDF("id", "new_qty")
    MergeClausesExecutor.merge(spark, src, p, "s.id = t.id",
      matched = Seq(
        UpdateSet(Map("qty" -> col("s.new_qty"),
          "total_cents" -> (col("s.new_qty") * lit(100L))),
          condition = Some(col("t.id") === 1L)),
        UpdateSet(Map("qty" -> col("s.new_qty")),
          condition = Some(col("t.id") === 2L))),
      sourceAlias = "s", targetAlias = "t")
    assert(GraftTable(spark, p).toDf()
      .select("id", "total_cents").as[(Long, Long)].collect().toMap ==
      Map(1L -> 500L, 2L -> 700L))
    // an INSERT VALUES clause that omits the generated column computes it
    val src2 = Seq((9L, 4L)).toDF("id", "new_qty")
    MergeClausesExecutor.merge(spark, src2, p, "s.id = t.id",
      notMatched = Seq(InsertValues(Map(
        "id" -> col("s.id"), "qty" -> col("s.new_qty"),
        "price_cents" -> lit(50L)))),
      sourceAlias = "s", targetAlias = "t")
    assert(GraftTable(spark, p).toDf().filter(col("id") === 9L)
      .select("total_cents").as[Long].head() == 200L)
    // an explicitly WRONG assignment in a clause is still refused
    intercept[IllegalArgumentException] {
      MergeClausesExecutor.merge(spark,
        Seq((1L, 8L)).toDF("id", "new_qty"), p, "s.id = t.id",
        matched = Seq(UpdateSet(Map("qty" -> col("s.new_qty"),
          "total_cents" -> lit(1L)))),
        sourceAlias = "s", targetAlias = "t")
    }
  }

  test("UPDATE of a base column recomputes generated columns in the change feed too") {
    val p = tmpDir("gen_cdf") + "/t"
    GraftWriter.write(spark,
      Seq((1L, 2L, 100L)).toDF("id", "qty", "price_cents"),
      p, WriteOptions(mode = WriteMode.Overwrite,
        metadata = genProps + ("graft.cdf" -> "true")))
    Dml.update(spark, p, col("id") === 1L, Map("qty" -> lit(7L)))
    val t = GraftTable(spark, p)
    val post = t.tableChanges(0, t.version())
      .filter(col("_change_type") === "update_postimage")
      .select("total_cents").as[Long].head()
    assert(post == 700L, "CDF postimage must carry the recomputed value")
  }

  test("generated expression may only reference non-generated columns") {
    val p = tmpDir("gen_bad") + "/t"
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark, Seq((1L, 2L)).toDF("a", "b"), p,
        WriteOptions(mode = WriteMode.Overwrite,
          metadata = Map(s"${Generated.Prefix}g" -> "nope + 1")))
    }
    assert(ex.getMessage.contains("non-base columns"))
  }

  test("generated partition column: computed before partitioning, prunes files") {
    val p = tmpDir("gen_part") + "/t"
    GraftWriter.write(spark,
      Seq((1L, "2024-03-05"), (2L, "2025-07-01")).toDF("id", "day"),
      p, WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("yr"),
        metadata = Map(s"${Generated.Prefix}yr" -> "substring(day, 1, 4)")))
    val snap = GraftTable(spark, p).snapshot()
    assert(snap.partitionColumns == Seq("yr"))
    assert(snap.files.map(_.partitionValues("yr")).toSet == Set("2024", "2025"))
    assert(GraftTable(spark, p).toDf().filter(col("yr") === "2024")
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("identity column: unique increasing values across appends, mark advances") {
    val p = tmpDir("ident") + "/t"
    val props = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")
    GraftWriter.write(spark, Seq("a", "b").toDF("k"), p,
      WriteOptions(mode = WriteMode.Overwrite, metadata = props))
    val t = GraftTable(spark, p)
    def rids() = t.toDf().select("rid").as[Long].collect().toSeq
    val first = rids()
    assert(first.size == 2 && first.distinct.size == 2)
    assert(first.forall(_ >= 1L))
    val hwm1 = t.log.tableProperties()(Generated.hwmKey("rid")).toLong
    assert(hwm1 == first.max)

    GraftWriter.write(spark, Seq("c", "d").toDF("k"), p,
      WriteOptions(mode = WriteMode.Append))
    val all = rids()
    assert(all.size == 4 && all.distinct.size == 4, "identity values unique")
    assert(all.filterNot(first.contains).forall(_ > hwm1),
      "new values strictly above the prior mark")

    // supplying the column explicitly (BY DEFAULT) advances the mark too
    val big = all.max + 100L
    GraftWriter.write(spark, Seq(("e", big)).toDF("k", "rid"), p,
      WriteOptions(mode = WriteMode.Append))
    assert(t.log.tableProperties()(Generated.hwmKey("rid")).toLong == big)
    GraftWriter.write(spark, Seq("f").toDF("k"), p,
      WriteOptions(mode = WriteMode.Append))
    assert(rids().max > big, "assignment resumes above the supplied value")
  }

  test("creating write validates supplied generated values too") {
    val p = tmpDir("gen_create") + "/t"
    // the declaration arrives WITH the first write — wrong supplied
    // values must be rejected even though the pre-commit log is empty
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark,
        Seq((1L, 2L, 100L, 999L)).toDF("id", "qty", "price_cents", "total_cents"),
        p, WriteOptions(mode = WriteMode.Overwrite, metadata = genProps))
    }
    assert(ex.getMessage.contains("total_cents"))
    assert(!GraftTable.exists(spark, p))
  }

  test("partial overwrites cannot declare generated/identity columns") {
    val p = tmpDir("gen_partial") + "/t"
    GraftWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "part"), p,
      WriteOptions(mode = WriteMode.Overwrite, partitionBy = Seq("part")))
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark, Seq((3L, "a", 4L)).toDF("k", "part", "g"), p,
        WriteOptions(mode = WriteMode.Overwrite,
          replaceWhere = Some(col("part") === "a"),
          schemaMode = Some(graft.io.SchemaMode.Merge),
          metadata = Map(s"${Generated.Prefix}g" -> "k + 1")))
    }
    assert(ex.getMessage.contains("table creation"))
  }

  test("a stale supplied-identity write can never regress the high-water mark") {
    val p = tmpDir("ident_hwm") + "/t"
    GraftWriter.write(spark, Seq(("a", 100L)).toDF("k", "rid"), p,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")))
    val t = GraftTable(spark, p)
    def hwm() = t.log.tableProperties()(Generated.hwmKey("rid")).toLong
    assert(hwm() == 100L)
    // a writer supplying LOWER values (derived from a stale view) must
    // not roll the mark back — commit-time advance keeps the max
    GraftWriter.write(spark, Seq(("b", 60L)).toDF("k", "rid"), p,
      WriteOptions(mode = WriteMode.Append))
    assert(hwm() == 100L)
    // assignment resumes above the protected mark
    GraftWriter.write(spark, Seq("c").toDF("k"), p,
      WriteOptions(mode = WriteMode.Append))
    val rids = t.toDf().select("rid").as[Long].collect()
    assert(rids.length == rids.distinct.length)
    assert(rids.max > 100L)
  }

  test("generated/identity declarations are creation-time only") {
    val p = tmpDir("gen_late") + "/t"
    GraftWriter.write(spark, Seq((1L, 2L)).toDF("a", "b"), p,
      WriteOptions(mode = WriteMode.Overwrite))
    val ex = intercept[IllegalArgumentException] {
      GraftWriter.write(spark, Seq((2L, 3L)).toDF("a", "b"), p,
        WriteOptions(mode = WriteMode.Append,
          metadata = Map(s"${Generated.Prefix}c" -> "a + b")))
    }
    assert(ex.getMessage.contains("table creation"))
    // a full overwrite replaces every row, so declaring there is fine
    // (the new column needs schema evolution like any other)
    GraftWriter.write(spark, Seq((2L, 3L)).toDF("a", "b"), p,
      WriteOptions(mode = WriteMode.Overwrite,
        schemaMode = Some(graft.io.SchemaMode.Overwrite),
        metadata = Map(s"${Generated.Prefix}c" -> "a + b")))
    assert(GraftTable(spark, p).toDf().select("c").as[Long].head() == 5L)
  }

  test("concurrent identity appends never collide (CAS + re-assign)") {
    val p = tmpDir("ident_conc") + "/t"
    GraftWriter.write(spark, Seq("seed").toDF("k"), p,
      WriteOptions(mode = WriteMode.Overwrite,
        metadata = Map(s"${Generated.IdentityPrefix}rid" -> "1,1")))
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        GraftWriter.write(spark,
          Seq(s"t$i-a", s"t$i-b").toDF("k"), p,
          WriteOptions(mode = WriteMode.Append))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val rids = GraftTable(spark, p).toDf().select("rid").as[Long].collect()
    assert(rids.length == 9)
    assert(rids.distinct.length == 9, s"identity collision: ${rids.sorted.toSeq}")
  }
}
