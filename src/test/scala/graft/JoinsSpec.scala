package graft

import graft.ext.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"), (2L, 50L, "lx"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "r?"))
      .toDF("k", "ts", "rv")
    val out = Joins.asof(left, right, Seq("k"), "ts", Seq("rv"))
      .select("k", "ts", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 5L, "l0", null),   // before any right row
      (1L, 10L, "l1", "r10"), // ties match (<= semantics)
      (1L, 20L, "l2", "r15"), // latest at-or-before
      (2L, 50L, "lx", null))) // key with no right rows
  }
}
