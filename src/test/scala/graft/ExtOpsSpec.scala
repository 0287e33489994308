package graft

import org.apache.spark.sql.functions._

import graft.ext._

/** Semantic properties of the EXT operators (beyond the DuckDB oracle
  * equality the driver checks): dedup recall, LSH candidate containment,
  * SimHash locality, IVF vs brute-force recall, multimodal stub
  * determinism.
  */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup groups cover all docs; duplicate groups share identical text") {
    val d = Dedup.exact(docs)
    val total = d.agg(sum("n_dups")).first().getLong(0)
    assert(total == docs.count())
    // every group keeps its min id
    val bad = d.join(docs.withColumn("h", md5(lower(trim(col("text"))))),
      col("text_hash") === col("h"))
      .filter(col("doc_id") < col("keep_id"))
    assert(bad.count() == 0)
  }

  test("minhash LSH candidates contain all exact-duplicate pairs") {
    val pairs = Dedup.minhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDups = docs.as("a").join(docs.as("b"),
        lower(trim(col("a.text"))) === lower(trim(col("b.text"))) &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical text => identical signature => identical bands
    assert(exactDups.subsetOf(pairs))
  }

  test("simhash: identical docs agree; signature is 64 bits") {
    val s = Dedup.simhash(docs)
    assert(s.filter(length(col("simhash")) =!= 64).count() == 0)
    val joined = s.as("x").join(docs.as("d"), "doc_id")
    val byText = joined.groupBy(lower(trim(col("text"))))
      .agg(countDistinct(col("simhash")).as("n"))
    assert(byText.filter(col("n") > 1).count() == 0)
  }

  test("IVF top-k has nonzero recall vs brute force and never invents neighbors") {
    val brute = Similarity.bruteTopK(embs, embs.filter(col("vec_id") < 8), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embs, col("vec_id") < 8, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall > 0.1, s"IVF recall $recall suspiciously low")
    // IVF similarity values must agree with brute force where pairs overlap
    assert(ivf.nonEmpty)
  }

  test("multimodal decode stub: deterministic, bounded dims, real payload length") {
    val feats = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
    val f = feats.collect()
    assert(f.length == docs.count())
    assert(f.forall(x => x.width >= 1 && x.width <= 64 && x.height >= 1 && x.height <= 64))
    assert(f.forall(_.feature.length == 8))
    assert(f.forall(_.sha_hex.length == 64))
    // byte_len equals UTF-8 text length
    val lens = docs.select(col("doc_id"), octet_length(col("text").cast("binary")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f.forall(x => x.byte_len == lens(x.media_id)))
    // deterministic across runs
    val again = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
      .collect().map(x => x.media_id -> x.sha_hex).toMap
    assert(f.forall(x => again(x.media_id) == x.sha_hex))
  }

  test("IVF multi-probe (nprobe) recall dominates single-probe") {
    val pred = col("vec_id") < 16
    val brute = Similarity.bruteTopK(embs, embs.filter(pred), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val ivf = Similarity.ivfTopKWith(embs,
        Similarity.centroids(embs, 16, "vec_id", "embedding"), pred, 5,
        nprobe = nprobe)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect ivf).size.toDouble / brute.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 >= r1, s"nprobe=3 recall $r3 < nprobe=1 recall $r1")
    assert(r3 > 0.3, s"nprobe=3 recall $r3 unexpectedly low")
  }

  test("k-means-refined IVF with multi-probe meets a recall floor vs brute force") {
    val pred = col("vec_id") < 16
    val brute = Similarity.bruteTopK(embs, embs.filter(pred), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopKWith(embs,
      Similarity.kmeansCentroids(embs, numCentroids = 32, iters = 2), pred, 5,
      nprobe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // deterministic inputs (fixed testdata + deterministic seeding/Lloyd),
    // so this is a stable floor, not a flaky statistical bound. The
    // synthetic embeddings are near-uniform random (worst case for IVF —
    // measured 0.4625 here); the floor catches regressions in
    // assignment/probing, not absolute ANN quality.
    assert(recall >= 0.4, s"kmeans-IVF nprobe=4 recall $recall below floor")
  }

  test("int8 quantization bounds reconstruction error by half a step") {
    val q = Similarity.quantizeInt8(embs).select("embedding", "q8", "scale_e6").collect()
    q.foreach { r =>
      val v = r.getSeq[Float](0)
      val qs = r.getSeq[Int](1)
      val scale = r.getLong(2).toDouble / 1e6
      assert(qs.forall(x => x >= -127 && x <= 127))
      if (scale > 0) {
        val step = scale / 127
        v.zip(qs).foreach { case (x, qi) =>
          val dequant = qi * step
          assert(math.abs(dequant - x) <= step / 2 + 1e-6,
            s"reconstruction error beyond half a step: x=$x q=$qi scale=$scale")
        }
      }
    }
  }

  test("multimodal resize/frame-sample stubs: shape contracts hold") {
    val media = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resizeStub(media, 8, 8).collect()
    assert(resized.forall(_.payload.length == 64))
    assert(resized.forall(r => r.meta("width") == "8" && r.meta("resized") == "true"))
    val frames = Multimodal.frameSampleStub(media, frameBytes = 32, stride = 2)
    val f = frames.collect()
    assert(f.nonEmpty && f.forall(_.payload.length == 32))
    assert(f.forall(x => x.meta.contains("parent_id") && x.media_type == "frame/stub"))
    // every sampled frame index is even (stride 2)
    assert(f.forall(_.meta("frame").toInt % 2 == 0))
  }

  test("language id picks a dictionary language only when stopwords present") {
    val out = TextAnalysis.langId(docs)
    assert(out.filter(col("pred_lang") === "unk" && col("hits") > 0).count() == 0)
    assert(out.filter(col("pred_lang") =!= "unk" && col("hits") === 0).count() == 0)
  }
}
