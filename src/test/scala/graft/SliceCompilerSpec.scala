package graft

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.core._
import graft.core.SliceCompiler._

/** Pure predicate-compiler unit tests — ports the reference's DNF unit
  * test (dagster_delta_tests/test_io_manager.py:37-54): write-side pin vs
  * read-side range, static `IN` de-dup, multi-dim conjunction, and the
  * date-format coercion for string/int partition columns.
  */
class SliceCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val w = TimeWindow(
    Timestamp.valueOf("2020-01-02 00:00:00"),
    Timestamp.valueOf("2020-02-03 00:00:00"))

  test("write side pins a time window to its start; read side is half-open range") {
    val df = Seq(
      Timestamp.valueOf("2020-01-01 00:00:00"),
      Timestamp.valueOf("2020-01-02 00:00:00"),
      Timestamp.valueOf("2020-02-02 23:59:59"),
      Timestamp.valueOf("2020-02-03 00:00:00")).toDF("timestamp_col")
    val dim = TimeWindowDimension("timestamp_col", Seq(w))
    val writePred = compileDimension(dim, WriteSide, Some(TimestampType))
    assert(df.filter(writePred).count() == 1)
    val readPred = compileDimension(dim, ReadSide, Some(TimestampType))
    assert(df.filter(readPred).count() == 2) // start inclusive, end exclusive
  }

  test("multiple windows collapse to [min(start), max(end))") {
    val dim = TimeWindowDimension("c", Seq(
      TimeWindow(Timestamp.valueOf("2020-01-05 00:00:00"),
                 Timestamp.valueOf("2020-01-06 00:00:00")),
      TimeWindow(Timestamp.valueOf("2020-01-01 00:00:00"),
                 Timestamp.valueOf("2020-01-02 00:00:00"))))
    val dnf = toDnf(TableSlice("s", "t", Seq(dim)), ReadSide)
    assert(dnf.map(_.toString) == Seq(
      "c >= '2020-01-01 00:00:00.0'", "c < '2020-01-06 00:00:00.0'"))
  }

  test("date-typed partition column coerces to date literals") {
    val df = Seq("2020-01-01", "2020-01-02", "2020-02-03")
      .map(java.sql.Date.valueOf).toDF("date_col")
    val dim = TimeWindowDimension("date_col", Seq(w))
    assert(df.filter(compileDimension(dim, WriteSide, Some(DateType))).count() == 1)
    assert(df.filter(compileDimension(dim, ReadSide, Some(DateType))).count() == 1)
  }

  test("string partition column with fmt coerces through date_format") {
    val df = Seq("20200102", "20200115", "20200204").toDF("d")
    val dim = TimeWindowDimension("d", Seq(w), fmt = Some("yyyyMMdd"))
    assert(df.filter(compileDimension(dim, ReadSide, Some(StringType))).count() == 2)
    assert(df.filter(compileDimension(dim, WriteSide, Some(StringType))).count() == 1)
  }

  test("int partition column with fmt casts formatted date to int") {
    val df = Seq(20200102, 20200115, 20200204).toDF("d")
    val dim = TimeWindowDimension("d", Seq(w), fmt = Some("yyyyMMdd"))
    assert(df.filter(compileDimension(dim, ReadSide, Some(IntegerType))).count() == 2)
  }

  test("static single key = equality; many keys de-dup to IN") {
    val df = Seq("red", "blue", "red", "yellow").toDF("color")
    assert(df.filter(
      compileDimension(StaticDimension("color", Seq("red")), ReadSide)).count() == 2)
    assert(df.filter(compileDimension(
      StaticDimension("color", Seq("red", "blue", "red")), ReadSide)).count() == 3)
    val dnf = toDnf(
      TableSlice("s", "t", Seq(StaticDimension("color", Seq("red", "red")))),
      ReadSide)
    assert(dnf.head.toString == "color = 'red'")
  }

  test("multi-dimension slices AND together; slice applies projection") {
    val df = Seq(
      ("red", java.sql.Date.valueOf("2022-01-01"), "a1", 1L),
      ("red", java.sql.Date.valueOf("2022-01-02"), "a2", 2L),
      ("blue", java.sql.Date.valueOf("2022-01-01"), "a3", 3L)
    ).toDF("color", "time", "a", "b")
    val slice = TableSlice("s", "t",
      Seq(
        StaticDimension("color", Seq("red")),
        TimeWindowDimension("time", Seq(TimeWindow(
          Timestamp.valueOf("2022-01-01 00:00:00"),
          Timestamp.valueOf("2022-01-02 00:00:00"))))),
      columns = Some(Seq("a")))
    val out = SliceCompiler(df, slice)
    assert(out.columns.toSeq == Seq("a"))
    assert(out.as[String].collect().toSeq == Seq("a1"))
  }
}
