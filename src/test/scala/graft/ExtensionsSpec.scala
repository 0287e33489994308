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
    val qz = spark.sql(
      """SELECT graft_quantize_int8(array(cast(0.5 as float), cast(-1.0 as float))) AS q"""
    ).first().getStruct(0)
    assert(qz.getSeq[Int](0) == Seq(64, -127)) // floor(0.5*127/1 + 0.5)=64
    assert(qz.getLong(1) == 1000000L)
  }

  test("optimizer rule rewrites the HOF dot-product fold to DotProductFP64") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    def hofDot = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val df = emb.select(col("vec_id"), hofDot.as("d"))
    // rewritten plan contains the native expression, not ArrayAggregate
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"no rewrite in:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived in:\n$optimized")
    // and values equal the native formulation exactly
    val native = emb.select(col("vec_id"),
      graft.ext.Similarity.dot(col("embedding"), col("embedding")).as("d"))
    assert(df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
  }

  test("graft_dot preserves HOF null semantics: length mismatch and null elements yield NULL") {
    val r = spark.sql(
      """SELECT
        | graft_dot(array(cast(1 as float), cast(2 as float)),
        |           array(cast(1 as float)))                          AS mismatch,
        | graft_dot(array(cast(1 as float), cast(null as float)),
        |           array(cast(1 as float), cast(2 as float)))        AS withnull,
        | graft_dot(cast(array() as array<float>),
        |           cast(array() as array<float>))                    AS empty
        |""".stripMargin).first()
    assert(r.isNullAt(0), "length mismatch must be NULL (zip_with pads with nulls)")
    assert(r.isNullAt(1), "null element must propagate to NULL")
    assert(r.getDouble(2) == 0.0, "empty arrays fold to the zero literal")
  }

  test("rule leaves non-matching folds untouched") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(5)
    // different zero literal => not a dot product; must NOT be rewritten
    val df = emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.first().getDouble(0) >= 1.0)
  }
}
