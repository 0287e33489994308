package graft

import org.apache.spark.sql.functions._

import graft.ext.{LangProfiles, QualityModel, TextAnalysis}

/** Seeded fuzz of the custom Catalyst kernels against independent
  * reference implementations — the kernels are the riskiest custom
  * code (hand-rolled eval + codegen), and the oracle only exercises
  * them on the fixture's value distribution. Each test drives the REAL
  * query path (so codegen, null handling, and UTF8String boundaries are
  * covered), comparing against plain-Scala recomputation.
  */
class KernelFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xA11CE)

  test("VecSub equals zip_with on valid inputs; null on mismatch/null-element") {
    val dims = Seq(1, 3, 16, 64)
    val rows = (1 to 200).map { i =>
      val d = dims(i % dims.length)
      (i.toLong,
        Array.fill(d)(rnd.nextFloat() * 200f - 100f),
        Array.fill(d)(rnd.nextFloat() * 200f - 100f))
    }
    val df = rows.toDF("id", "a", "b")
    val sub = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.VecSub(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("a"),
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("b")))
    val viaKernel = df.select(col("id"), sub.as("r")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { case (id, a, b) =>
      val expect = a.zip(b).map { case (x, y) => x - y }
      assert(java.util.Arrays.equals(viaKernel(id), expect),
        s"VecSub mismatch on row $id")
    }
    // length mismatch and null element → NULL, never garbage
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val badSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1f, 2f), Seq(1f, 2f, 3f)),
        Row(2L, Seq(1f, 2f), Seq(4f, 5f)),
        Row(3L, Seq(1f, null), Seq(1f, 2f))),
      badSchema)
    val out = bad.select(col("id"), sub.as("r")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(3L) && !out(2L))
  }

  test("PqQueryTable ip mode matches a plain-Scala dot table; L2 mode the expansion") {
    val m = 4; val ksub = 8; val dsub = 4
    val books: Array[Array[Array[Float]]] = Array.tabulate(m, ksub, dsub) {
      (j, c, i) => rnd.nextFloat() * 4f - 2f
    }
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(m * dsub)(rnd.nextFloat() * 10f - 5f))
    }
    def model(v: Array[Float], ip: Boolean): Seq[Seq[Long]] =
      (0 until m).map { j =>
        val off = j * dsub
        var xx = 0.0
        var i = 0
        while (i < dsub) { val x = v(off + i).toDouble; xx += x * x; i += 1 }
        (0 until ksub).map { c =>
          var xc = 0.0; var cc = 0.0; var t = 0
          while (t < dsub) {
            val b = books(j)(c)(t).toDouble
            xc += v(off + t).toDouble * b; cc += b * b; t += 1
          }
          graft.functions.PqEncode.roundE6(if (ip) xc else xx - 2.0 * xc + cc)
        }
      }
    val df = rows.toDF("id", "v")
    for (ip <- Seq(true, false)) {
      val tab = org.apache.spark.sql.graft.GraftInternal.column(
        graft.functions.PqQueryTable(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("v"),
          books, ip = ip))
      val got = df.select(col("id"), tab.as("t")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq).toSeq).toMap
      rows.foreach { case (id, v) =>
        assert(got(id) == model(v, ip), s"ip=$ip id=$id")
      }
    }
    // dim mismatch and null element -> NULL table in BOTH modes
    val bad = Seq(
      (1L, Array.fill(m * dsub - 1)(1f)),
      (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    for (ip <- Seq(true, false)) {
      val tab = org.apache.spark.sql.graft.GraftInternal.column(
        graft.functions.PqQueryTable(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("v"),
          books, ip = ip))
      assert(bad.select(tab.as("t")).collect().forall(_.isNullAt(0)))
    }
  }

  test("HashedLinearScore matches the plain-Scala model on hostile whitespace") {
    val texts = Seq(
      "", " ", "\t", "hello world", "hello\tworld", "  padded  ",
      "ends with tab\t", "\nleading newline", "a  b   c", "ONE Two thrEE",
      "tok1 tok2\ttok3\n tok4", "\t\t", "word\t\n \tword") ++
      (1 to 100).map { _ =>
        val toks = (0 until rnd.nextInt(12)).map(_ =>
          rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
        val seps = Seq(" ", "  ", "\t", "\n", " \t ")
        toks.mkString(seps(rnd.nextInt(seps.length))) +
          (if (rnd.nextBoolean()) "\t" else "")
      }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassify(df)
      .select("doc_id", "score_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = QualityModel.biasE6 + QualityModel.tokensOf(t)
        .map(tok => QualityModel.weightsE6(QualityModel.bucketOf(tok))).sum
      assert(got(i.toLong) == expect,
        s"score mismatch on ${t.replace("\t", "\\t").replace("\n", "\\n")}")
    }
  }

  test("TrigramLangScore matches plain-Scala trigram scoring") {
    def reference(t: String): Array[Long] = {
      val s = LangProfiles.normalize(t)
      val out = new Array[Long](LangProfiles.langs.length)
      var i = 0
      while (i + 3 <= s.length) {
        LangProfiles.trigramWeights.get(s.substring(i, i + 3)).foreach { w =>
          var l = 0
          while (l < out.length) { out(l) += w(l); l += 1 }
        }
        i += 1
      }
      out
    }
    val texts = Seq("", "the the the", "der und die das", "12345",
      "mixed THE und el la", "a", "ab") ++
      (1 to 60).map(_ => (0 until 30).map(_ =>
        "abcdefghijklmnopqrstuvwxyz .,!?"(rnd.nextInt(31))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val scoresCol = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.TrigramLangScore(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("text"),
        LangProfiles.langs.toArray, LangProfiles.trigramWeights))
    val got = df.select(col("doc_id"), scoresCol.as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(java.util.Arrays.equals(got(i.toLong), reference(t)),
        s"trigram score mismatch on '$t'")
    }
  }

  test("MortonKey matches a brute-force rank-and-interleave reference") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val cuts = Array(
      Array(-50.0, 0.0, 10.0, 99.5),
      (1 to 255).map(_.toDouble).toArray)
    def refRank(v: Double, cu: Array[Double]): Long = {
      val coarse = cu.count(v > _)
      val lo = if (coarse == 0) Double.MinValue else cu(coarse - 1)
      val hi = if (coarse == cu.length) Double.MaxValue else cu(coarse)
      val frac = if (hi > lo) (v - lo) / (hi - lo) else 0.0
      val fine = math.min(math.max(math.floor(frac * 256).toInt, 0), 255)
      (coarse.toLong * 256L + fine) % 65536L
    }
    def refKey(x: Double, y: Double): Long = {
      var acc = 0L
      val ranks = Array(refRank(x, cuts(0)), refRank(y, cuts(1)))
      for (i <- 0 until 2; b <- 0 until 16)
        acc |= ((ranks(i) >> b) & 1L) << (b * 2 + i)
      acc
    }
    val probes = Seq((-100.0, 0.0), (0.0, 1.0), (10.0, 255.0), (99.5, 128.5),
      (1e9, -1e9)) ++ (1 to 300).map(_ =>
      (rnd.nextDouble() * 400 - 200, rnd.nextDouble() * 400 - 200))
    probes.foreach { case (x, y) =>
      val k = graft.functions.MortonKey(
        Seq(Literal(x), Literal(y)), cuts)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Long]
      assert(k == refKey(x, y), s"morton mismatch at ($x, $y)")
    }
  }
}
