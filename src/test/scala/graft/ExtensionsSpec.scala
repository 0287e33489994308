package graft

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions exposes native functions to plain SQL") {
    val dot = spark.sql(
      """SELECT graft_dot(array(cast(1.5 as float), cast(2.0 as float)),
        |                 array(cast(2.0 as float), cast(3.0 as float))) AS d
        |""".stripMargin).first().getDouble(0)
    assert(dot == 1.5 * 2.0 + 2.0 * 3.0)
    val n = spark.sql(
      "SELECT graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .first().getInt(0)
    assert(n == 2)
  }
}
