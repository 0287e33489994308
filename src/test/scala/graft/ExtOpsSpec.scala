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

  test("spread's structural fast path agrees with the physical probe") {
    // spread decides `numPartitions < defaultParallelism` from the
    // analyzed plan where possible (r17: the .rdd probe cost 20-80 ms
    // of planning per operator entry); the decision must match the
    // probe on every canonical shape — raw/filtered/projected file
    // scans, pinned checkpoints on both sides of the threshold, and
    // the undecidable fallbacks (join/aggregate)
    val target = spark.sparkContext.defaultParallelism
    def expected(df: org.apache.spark.sql.DataFrame): Int = {
      val raw = df.rdd.getNumPartitions
      if (raw < target) target else raw
    }
    val shapes = Seq(
      "raw scan" -> docs,
      "filtered scan" -> docs.filter(col("doc_id") > 10),
      "projected scan" -> docs.select("doc_id", "text"),
      "pinned below target" -> docs.repartition(1).localCheckpoint(true),
      "pinned above target" ->
        docs.repartition(target + 3).localCheckpoint(true),
      "join fallback" -> docs.as("a").join(docs.as("b"), Seq("doc_id")),
      "agg fallback" -> docs.groupBy("source").count())
    shapes.foreach { case (name, df) =>
      assert(TextOps.spread(df).rdd.getNumPartitions == expected(df),
        s"spread decision diverged from the probe on: $name")
    }
  }

  test("spread fast path stays sound on multi-file and partitioned scans") {
    // r17 ADVICE: the single-openCost upper bound under-counted splits
    // for many-small-file relations (each file is weighted len+openCost
    // and rounds up per file), so spread could repartition DOWN — the
    // fast path must agree with the probe on every file layout. Also:
    // partition-pruned scans must fall back to the probe (sizeInBytes
    // is the unpruned total).
    val target = spark.sparkContext.defaultParallelism
    def expected(df: org.apache.spark.sql.DataFrame): Int = {
      val raw = df.rdd.getNumPartitions
      if (raw < target) target else raw
    }
    val root = java.nio.file.Files.createTempDirectory("graft_spread").toString
    // many tiny files: openCost-dominated packing (the unsound case)
    docs.repartition(target * 3).write.parquet(s"$root/many")
    // a couple of files: the mid-band where bounds may not decide
    docs.repartition(2).write.parquet(s"$root/two")
    // hive-partitioned table + partition filter: pruning case
    docs.withColumn("p", col("doc_id") % 4)
      .write.partitionBy("p").parquet(s"$root/part")
    val shapes = Seq(
      "many small files" -> spark.read.parquet(s"$root/many"),
      "two files" -> spark.read.parquet(s"$root/two"),
      "partitioned, pruned" ->
        spark.read.parquet(s"$root/part").filter(col("p") === 1),
      "partitioned, unpruned" -> spark.read.parquet(s"$root/part"))
    shapes.foreach { case (name, df) =>
      assert(TextOps.spread(df).rdd.getNumPartitions == expected(df),
        s"spread decision diverged from the probe on: $name")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("IVF cell join builds its hash side from the query side (broadcast contract)") {
    // the query side is tiny by contract (scaladoc on ivfTopKWith) and
    // explicitly broadcast — left to size estimates the planner once
    // built the hash relation from the CORPUS side (BuildRight), which
    // broadcasts the big side at real scale (r17 fix, r18 contract doc)
    val df = Similarity.ivfTopK(embs, col("vec_id") < 8, 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast cell join:\n$plan")
    assert(!plan.contains("BuildRight"),
      s"the corpus side became the broadcast build side:\n$plan")
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

  test("hot-band cap prunes degenerate bands but keeps organically-banded pairs") {
    import spark.implicits._
    // 60 boilerplate clones (every band degenerate) + one organic
    // near-dup pair + one unrelated doc
    val boiler = "spam spam spam spam spam spam spam spam spam spam"
    val organic = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2000L, "one two three four five six seven eight nine ten"))
    val d = ((0L until 60L).map(i => (i, boiler)) ++ organic)
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashPairs(d, maxDocsPerBand = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashPairs(d, maxDocsPerBand = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dropping bands can only remove candidates, never invent them
    assert(capped.subsetOf(uncapped))
    // the 60-doc boilerplate bands (60 > 50) are gone: the cap pruned
    // all 60*59/2 quadratic pairs
    assert(uncapped.size == 60 * 59 / 2 + 1)
    assert(!capped.exists { case (a, b) => a < 60L && b < 60L })
    // pairs whose bands stayed under the cap survive untouched
    assert(capped == Set((1000L, 1001L)))
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
    // the ivfTopK entry point's nprobe fan-out can only add candidates:
    // recall at nprobe=2 dominates the single-probe default
    val ivf2 = Similarity.ivfTopK(embs, col("vec_id") < 8, 5, nprobe = 2)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = (brute intersect ivf2).size.toDouble / brute.size
    assert(recall2 >= recall, s"nprobe=2 recall $recall2 < nprobe=1 $recall")
  }

  test("bruteTopK metrics: l2 ascending, dot descending, independent checks") {
    val q = embs.filter(col("vec_id") < 4)
    val l2 = Similarity.bruteTopK(embs, q, 5, metric = "l2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3)))
    val dt = Similarity.bruteTopK(embs, q, 5, metric = "dot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3)))
    assert(l2.length == 4 * 5 && dt.length == 4 * 5)
    // ranks sort by dist ASC (l2) / sim DESC (dot) within each query
    for (g <- l2.groupBy(_._1).values; Array(a, b) <- g.sortBy(_._3).sliding(2))
      assert(a._4 <= b._4, s"l2 not ascending: $a $b")
    for (g <- dt.groupBy(_._1).values; Array(a, b) <- g.sortBy(_._3).sliding(2))
      assert(a._4 >= b._4, s"dot not descending: $a $b")
    // independent rank-1 check against a driver-side fold replaying the
    // operator's exact op order (dot expansion + e6 round) so e6-level
    // ties break identically (by id)
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def fold(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def dE6(q: Array[Float], n: Array[Float]): Long =
      math.round(math.sqrt(
        math.max(fold(q, q) - 2.0 * fold(q, n) + fold(n, n), 0.0)) * 1e6)
    def pE6(q: Array[Float], n: Array[Float]): Long =
      math.round(fold(q, n) * 1e6)
    for (qid <- 0L until 4L) {
      val bestL2 = vecs.keys.filter(_ != qid)
        .minBy(n => (dE6(vecs(qid), vecs(n)), n))
      assert(l2.find(r => r._1 == qid && r._3 == 1L).get._2 == bestL2)
      val bestDot = vecs.keys.filter(_ != qid)
        .minBy(n => (-pE6(vecs(qid), vecs(n)), n))
      assert(dt.find(r => r._1 == qid && r._3 == 1L).get._2 == bestDot)
    }
    intercept[IllegalArgumentException] {
      Similarity.bruteTopK(embs, q, 5, metric = "hamming")
    }
  }

  test("canonicalByScore keeps the best-scored member, not the smallest id") {
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 9L), (3L, "b", 1L), // 1-2 duplicate, 3 alone
      (4L, "c", 7L), (5L, "c", 7L)                  // 4-5 tie on score
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val best = Dedup.canonicalByScore(docs, pairs, scoreCol = "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 beats 1 on score; 3 unpaired survives; 4 wins the tie by id
    assert(best == Set(2L, 3L, 4L))
    // contrast: min-id canonical keeps 1, not 2
    val minId = Dedup.canonical(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 3L, 4L))
    // a NON-default idCol resolves too (regression: the join used to
    // pin the literal name doc_id and break analysis)
    val renamed = docs.withColumnRenamed("doc_id", "id")
    val bestRenamed = Dedup.canonicalByScore(
      renamed, pairs, scoreCol = "score", idCol = "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bestRenamed == Set(2L, 3L, 4L))
  }

  test("tfidfTopK: terms come from the doc, ranks are dense, rare beats common") {
    val fixture = Seq(
      (1L, "alpha beta beta common"),
      (2L, "alpha gamma common"),
      (3L, "alpha delta common common")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(fixture, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.groupBy(_._1).forall { case (_, g) =>
      g.map(_._3).sorted.sameElements(1L to g.length) })
    // every emitted term occurs in its document
    val texts = fixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (d, t, _, _) =>
      texts(d).split("\\s+").contains(t) })
    // 'alpha' appears in all 3 docs — idf floor; doc 2's rank-1 must be
    // the unique 'gamma', never the ubiquitous 'alpha'
    assert(got.find(r => r._1 == 2L && r._3 == 1L).get._2 == "gamma")
    // score ordering within a doc is strictly enforced by rank
    for (g <- got.groupBy(_._1).values; Array(a, b) <- g.sortBy(_._3).sliding(2))
      assert(a._4 >= b._4)
  }

  test("PQ codes are bounded; ADC top-k meets a recall floor vs exact L2") {
    val codes = Similarity.pqEncode(embs)
    assert(codes.count() == embs.count())
    assert(codes.filter(size(col("codes")) =!= 16).count() == 0)
    assert(codes.filter(exists(col("codes"),
      c => c < 0 || c >= 16)).count() == 0)
    // deterministic across runs (stride codebooks, fixed tie-break)
    val again = Similarity.pqEncode(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.collect().forall(r => again(r.getLong(0)) == r.getSeq[Int](1)))
    // exact squared-L2 top-5 (ADC approximates L2, not cosine)
    val pred = col("vec_id") < 16
    val q = embs.filter(pred).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val d2 = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("nv")) +
      Similarity.dot(col("nv"), col("nv"))
    val exact = embs.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      .crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .withColumn("d", round(d2 * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("n_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(embs, pred, 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // near-uniform random embeddings + coarse stride codebooks are the
    // worst case for PQ; the floor catches encoding/ADC regressions,
    // not absolute ANN quality
    assert(recall >= 0.15, s"PQ ADC recall $recall below floor")
  }

  test("k-means PQ codebooks cut distortion vs stride seeds; ADC recall does not degrade") {
    // Lloyd strictly reduces mean quantization distortion (each of the
    // two steps — reassign, recenter — is non-increasing; on real data
    // the drop from id-order stride seeds is large)
    val d0 = Similarity.pqDistortion(embs, 16, 16, 0, "vec_id", "embedding")
    val d2 = Similarity.pqDistortion(embs, 16, 16, 2, "vec_id", "embedding")
    assert(d2 < d0, s"k-means distortion $d2 not below stride $d0")

    // recall@5 vs exact squared-L2: refined codebooks must not lose
    // neighbors relative to stride seeding (allow tiny tie noise)
    val pred = col("vec_id") < 16
    val q = embs.filter(pred).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val d2e = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("nv")) +
      Similarity.dot(col("nv"), col("nv"))
    val exact = embs.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      .crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .withColumn("d", round(d2e * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("n_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val stride = recallOf(Similarity.pqTopK(embs, pred, 5))
    val kmeans = recallOf(Similarity.pqTopKKmeans(embs, pred, 5))
    assert(kmeans >= stride - 0.05,
      s"k-means ADC recall $kmeans degraded vs stride $stride")
    info(f"distortion stride=$d0%.4f kmeans=$d2%.4f; recall stride=$stride%.3f kmeans=$kmeans%.3f")
  }

  test("IVF-PQ residual ADC: deterministic, cell-confined, recall floor vs exact L2") {
    val pred = col("vec_id") < 16
    // exact squared-L2 top-5 reference (ADC approximates L2)
    val q = embs.filter(pred).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val d2 = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("nv")) +
      Similarity.dot(col("nv"), col("nv"))
    val exact = embs.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      .crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .withColumn("d", round(d2 * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("n_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val one = Similarity.ivfpqTopK(embs, pred, 5)
    val r1 = recallOf(one)
    // cell-confined candidates CANNOT beat flat PQ on recall here; the
    // floor catches residual/encode/ADC regressions, not ANN quality
    assert(r1 >= 0.05, s"IVF-PQ recall $r1 below floor")
    // deterministic across runs (stride seeds everywhere, id tie-breaks)
    val a = one.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val b = Similarity.ivfpqTopK(embs, pred, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(a.sameElements(b), "IVF-PQ output must be deterministic")
    // multi-probe widens the candidate set; recall must not degrade
    // materially (ADC re-ranking can shuffle the tail slightly)
    val r2 = recallOf(Similarity.ivfpqTopK(embs, pred, 5, nprobe = 2))
    assert(r2 >= r1 - 0.05, s"nprobe=2 recall $r2 degraded vs nprobe=1 $r1")
    // every (q, n) pair shares a probed cell — candidates never left IVF
    val cells = Similarity.assignCells(embs,
      Similarity.centroidsK(embs, 32), "vec_id", "embedding")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs1 = one.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs1.forall { case (qi, ni) => cells(qi) == cells(ni) },
      "nprobe=1 neighbors must come from the query's own cell")
    // the fully k-means-refined composition must not lose recall vs the
    // stride-seeded pipeline (Lloyd adapts cells AND books to the data)
    val rKm = recallOf(Similarity.ivfpqTopKKmeans(embs, pred, 5))
    assert(rKm >= r1 - 0.05,
      s"ivf-pq kmeans recall $rKm degraded vs stride $r1")
    info(f"ivf-pq recall stride=$r1%.3f kmeans=$rKm%.3f nprobe2=$r2%.3f")
  }

  test("MIPS family: kmeans cells hold recall; exact-dot rerank recovers brute order") {
    val pred = col("vec_id") < 16
    // exact maximum-inner-product reference (rounded dot, id tie-break)
    val q = embs.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exact = embs.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      .crossJoin(q).filter(col("n_id") =!= col("q_id"))
      .withColumn("s",
        round(Similarity.dot(col("qv"), col("nv")) * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("s").desc, col("n_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val stride = recallOf(Similarity.ivfIpTopK(embs, pred, 5))
    assert(stride >= 0.05, s"IVF-IP recall $stride below floor")
    // dot-argmax Lloyd refinement must not lose recall vs stride seeds
    val kmeans = recallOf(Similarity.ivfIpTopK(embs, pred, 5, coarseIters = 2))
    assert(kmeans >= stride - 0.05,
      s"IVF-IP kmeans recall $kmeans degraded vs stride $stride")
    // the exact-dot rerank stage must not lose recall vs its own
    // shortlist source (it can only re-order/extend what ADC surfaced)
    val rr = recallOf(Similarity.ivfIpTopKRerank(embs, pred, 5,
      shortlistFactor = 4))
    assert(rr >= stride - 0.05,
      s"IP rerank recall $rr degraded vs plain ADC $stride")
    // a flat IP shortlist covering the WHOLE corpus, reranked by exact
    // dot, IS brute-force MIPS — bit-identical output (same rounding,
    // same id tie-break, same column names)
    val n = embs.count().toInt
    val full = Similarity.pqTopKIpRerank(embs, pred, 5,
      shortlistFactor = (n + 4) / 5)
    val brute = Similarity.bruteTopK(embs, embs.filter(pred), 5,
      metric = "dot")
    assert(full.collect().map(_.toSeq).toSet ==
      brute.collect().map(_.toSeq).toSet,
      "corpus-wide IP rerank must equal brute-force MIPS")
    info(f"ivf-ip recall stride=$stride%.3f kmeans=$kmeans%.3f rerank=$rr%.3f")
  }

  test("skewJoin equals the plain join and broadcasts the hot branch") {
    import spark.implicits._
    // key 1 is hot (40 rows), keys 2..20 cold
    val left = ((1 to 40).map(i => (1L, i.toLong)) ++
      (2L to 20L).map(k => (k, k))).toDF("k", "lv")
    val right = (1L to 25L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val skewed = Skew.skewJoin(left, right, Seq("k"), hotThreshold = 10)
    val got = skewed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got == plain)
    // the hot branch is a broadcast join (skewed rows never shuffle)
    assert(skewed.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // degenerate thresholds: everything hot / nothing hot still correct
    assert(Skew.skewJoin(left, right, Seq("k"), hotThreshold = 0)
      .count() == plain.size)
    assert(Skew.skewJoin(left, right, Seq("k"), hotThreshold = 1000000)
      .count() == plain.size)
  }

  test("splitAssign covers every row, is deterministic, and respects shares") {
    val s = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    assert(s.filter(col("split").isNull).count() == 0)
    val bySplit = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9)
    // same key -> same split on a different table keyed the same way
    val again = Sampling.splitAssign(docs.select("doc_id"), "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.collect().forall(r =>
      again(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 500, "b" -> 400))
    }
  }

  test("content-defined chunks reassemble to the token stream; boundaries are content-local") {
    import spark.implicits._
    val c = Chunking.chunkByContent(docs, avgTokens = 8)
    // chunks of a doc concatenated in chunk_id order = the token stream
    val rebuilt = c.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
        s => s.getField("chunk")), " ").as("whole"))
    val orig = docs.select(col("doc_id"),
      array_join(TextOps.tokens(col("text")), " ").as("norm"))
    assert(rebuilt.join(orig, "doc_id")
      .filter(col("whole") =!= col("norm")).count() == 0)
    // content-defined: a PREFIX insertion only re-chunks the head — the
    // suffix after the first boundary chunks identically (fixed windows
    // would shift every boundary)
    val d1 = Seq((1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"))
      .toDF("doc_id", "text")
    val d2 = Seq((1L, "zz yy aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"))
      .toDF("doc_id", "text")
    def tail(df: org.apache.spark.sql.DataFrame) = {
      val ch = Chunking.chunkByContent(df, avgTokens = 4)
        .collect().sortBy(_.getAs[Long]("chunk_id"))
        .map(_.getAs[String]("chunk")).toSeq
      ch.drop(1) // drop the (possibly different) head chunk
    }
    assert(tail(d1) == tail(d2))
  }

  test("frequentNgrams ranks by count with stable tie-break") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c a b c"), // "a b c" x3 (overlapping shingles)
      (2L, "x y z"),
      (3L, "x y z")).toDF("doc_id", "text")
    val top = TextAnalysis.frequentNgrams(d, n = 3, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.head == ("a b c", 3L))
    // the 2-count tier is tie-broken by ngram text ascending
    assert(top.drop(1) == Seq(("b c a", 2L), ("c a b", 2L), ("x y z", 2L)))
  }

  test("weighted Poisson sample: inclusion tracks weights, exact and deterministic") {
    import spark.implicits._
    val n = 2000
    val df = (1 to n).map(i => (i.toLong, if (i <= 100) 1000L else 10L))
      .toDF("doc_id", "w")
    val sampled = Sampling.weightedSample(df, 200, weightCol = "w")
      .collect().map(_.getLong(0)).toSet
    // deterministic across runs
    val again = Sampling.weightedSample(df, 200, weightCol = "w")
      .collect().map(_.getLong(0)).toSet
    assert(sampled == again)
    // heavy rows (1000) have 100x the inclusion odds of light rows (10):
    // p_heavy = 200*1000/119000 > 1 -> ALL heavy rows included
    val heavy = sampled.count(_ <= 100)
    assert(heavy == 100, s"all saturated heavy rows must be included, got $heavy")
    // expected light inclusions = 1900 * 200*10/119000 ≈ 32; allow wide noise
    val light = sampled.size - heavy
    assert(light > 5 && light < 120, s"light inclusions way off: $light")
    // totalWeightHint skips the aggregate job and matches exactly
    val viaHint = Sampling.weightedSample(df, 200, weightCol = "w",
      totalWeightHint = Some(100 * 1000L + 1900 * 10L))
      .collect().map(_.getLong(0)).toSet
    assert(viaHint == sampled)
    // inputs whose inclusion product would overflow decimal(38) — and
    // silently NULL out, dropping exactly the heaviest rows — are
    // refused loudly instead
    val eOf = intercept[IllegalArgumentException] {
      Sampling.weightedSample(
        Seq((1L, Long.MaxValue)).toDF("doc_id", "w"),
        Long.MaxValue, weightCol = "w")
    }
    assert(eOf.getMessage.contains("decimal(38)"), eOf.getMessage)
  }

  test("group quota caps every group at N rows, deterministically") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (i.toLong, s"src${i % 5}", (i % 7).toLong)).toDF("doc_id", "source", "score")
    val out = Sampling.groupQuota(df, 3).collect()
    val byGroup = out.groupBy(_.getString(1))
    assert(byGroup.size == 5 && byGroup.values.forall(_.length == 3))
    // within a group: scores non-increasing, id tie-break ascending
    byGroup.values.foreach { rows =>
      val sorted = rows.sortBy(r => (-r.getLong(2), r.getLong(0))).toSeq
      assert(rows.map(_.getLong(0)).toSet == sorted.map(_.getLong(0)).toSet)
    }
  }

  test("per-group quantile gate keeps exactly ceil(n*p/1000), boundary-exact") {
    import spark.implicits._
    // uneven groups exercise the ceil: 7 rows @250 -> 2, 1 row -> 1, 4 -> 1
    val df = ((1 to 7).map(i => (i.toLong, "a", i.toLong)) ++
      Seq((100L, "b", 9L)) ++
      (200 to 203).map(i => (i.toLong, "c", i.toLong))).toDF(
      "doc_id", "source", "score")
    val out = Sampling.topQuantileByGroup(df, permille = 250).collect()
    val byGroup = out.groupBy(_.getString(1)).view.mapValues(
      _.map(_.getLong(0)).toSet).toMap
    assert(byGroup == Map(
      "a" -> Set(6L, 7L),   // ceil(7*0.25)=2, top scores 7,6
      "b" -> Set(100L),     // ceil(1*0.25)=1 — a singleton always survives
      "c" -> Set(203L)))    // ceil(4*0.25)=1
    // ascending flips the kept end; permille=1000 keeps everything
    val asc = Sampling.topQuantileByGroup(df, 250, ascending = true)
      .collect().groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(asc("a") == Set(1L, 2L))
    assert(Sampling.topQuantileByGroup(df, 1000).count() == df.count())
    assert(Sampling.topQuantileByGroup(df, 0).count() == 0)
    // a NULL score must rank WORST in either direction (Spark's bare
    // asc is NULLS FIRST — an unknown-quality row would win the gate)
    val withNull = (Seq((900L, "z", Option.empty[Long])) ++
      (1 to 3).map(i => (i.toLong, "z", Option(i.toLong))))
      .toDF("doc_id", "source", "score")
    assert(Sampling.topQuantileByGroup(withNull, 500, ascending = true)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(Sampling.topQuantileByGroup(withNull, 500)
      .collect().map(_.getLong(0)).toSet == Set(3L, 2L))
  }

  test("cluster-balanced selection caps every cell and keeps rank order") {
    import spark.implicits._
    val dim = 8
    def vec(i: Long): Array[Float] =
      Array.tabulate(dim)(d => (((i * 17 + d * 5) % 11) - 5).toFloat / 2f)
    val corpus = (0L until 200L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Similarity.clusterBalancedSelect(
      corpus, numCells = 8, perCell = 5, rowCountHint = Some(200L)).collect()
    val byCell = out.groupBy(_.getLong(1))
    assert(byCell.values.forall(_.length <= 5), "per-cell cap must hold")
    assert(byCell.size > 1, "selection must span multiple cells")
    // ranks are 1..n within a cell, ordered by sim asc then id
    byCell.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
      val sims = sorted.map(r => (r.getLong(2), r.getLong(0))).toSeq
      assert(sims == sims.sorted, "within a cell: sim asc, id tie-break")
    }
    // a dominant cluster cannot exceed the cap: duplicate one vector 50x
    val skewed = corpus.union(
      (1000L until 1050L).map(i => (i, vec(3L))).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val sel = Similarity.clusterBalancedSelect(
      skewed, numCells = 8, perCell = 5, rowCountHint = Some(250L))
    assert(sel.collect().groupBy(_.getLong(1)).values.forall(_.length <= 5))
  }

  test("text normalization unifies composed forms, strips controls, collapses space") {
    import spark.implicits._
    val decomposed = "cafe\u0301"   // e + combining acute
    val composed = "caf\u00e9"      // precomposed e-acute
    val zwsp = "\u200b"             // zero-width space (Cf)
    val df = Seq(
      (1L, decomposed + "\tx\n\ny  " + zwsp + "z!"),
      (2L, composed),
      (3L, "   already clean   ")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composed + " x y z!", out(1L))
    assert(out(2L) == composed)
    assert(out(3L) == "already clean")
    // composed and decomposed inputs now agree byte-for-byte — the
    // pre-dedup motivation for the pass
    assert(out(1L).startsWith(out(2L)))
  }

  test("byte-level BPE: trained merges compress seed-like prose, counts are exact") {
    import spark.implicits._
    // the model trained a full merge table from the embedded seeds
    assert(BpeModel.merges.length == BpeModel.NumMerges)
    assert(BpeModel.merges.distinct.length == BpeModel.merges.length)
    // a merged symbol's parts must have been produced by EARLIER merges
    // (or be base bytes) — the property that makes one ordered pass per
    // merge canonical
    val producedBy = BpeModel.merges.zipWithIndex.map { case ((l, r), i) =>
      (l + r) -> i
    }.toMap
    BpeModel.merges.zipWithIndex.foreach { case ((l, r), i) =>
      Seq(l, r).foreach { part =>
        assert(part.length == 2 || producedBy(part) < i,
          s"merge $i uses $part produced at ${producedBy.get(part)}")
      }
    }
    // common seed words compress far below their byte counts; gibberish
    // stays near byte-per-token
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    val the = BpeModel.textTokenCount("the", memo)
    assert(the >= 1 && the <= 2, s"'the' -> $the tokens")
    val gib = BpeModel.textTokenCount("xqzjv", memo)
    assert(gib >= 4, s"gibberish 'xqzjv' -> $gib tokens")
    assert(BpeModel.textTokenCount("", memo) == 0)
    assert(BpeModel.textTokenCount("   ", memo) == 0)
    // multi-byte UTF-8 counts whole bytes, never splits mid-scalar sums
    val eur = BpeModel.textTokenCount("€", memo) // 3 UTF-8 bytes
    assert(eur >= 1 && eur <= 3)
    // the Spark kernel agrees with the driver-side model on real docs
    val viaKernel = TextAnalysis.bpeCount(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        BpeModel.textTokenCount(r.getString(1), memo)).toMap
    assert(viaKernel == direct)
    // BPE counts feed token-budget selection directly (pluggable count
    // column): budget in BPE tokens is respected exactly
    val scored = TextAnalysis.bpeCount(docs)
      .withColumn("score", lit(1.0) / (col("doc_id") + 1))
      .withColumnRenamed("n_bpe", "n_tokens")
    val budget = 2000L
    val picked = Sampling.selectByBudget(scored, budget)
    val total = picked.agg(sum("n_tokens")).head().getLong(0)
    assert(total <= budget, s"selected $total BPE tokens > budget $budget")
  }

  test("payload features: deterministic, bounded dims, real payload length") {
    val feats = Multimodal.payloadFeatures(Multimodal.fromDocuments(docs))
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
    val again = Multimodal.payloadFeatures(Multimodal.fromDocuments(docs))
      .collect().map(x => x.media_id -> x.sha_hex).toMap
    assert(f.forall(x => again(x.media_id) == x.sha_hex))
  }

  test("real ImageIO decode: embedded PNG decodes byte-exactly") {
    import spark.implicits._
    // hand-built 3x2 grayscale PNG: row0 = [10,20,30], row1 = [200,150,100]
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAAAAAC4HznGAAAAEElEQVR4nGPgEpFjODEtBQAFRAH/I2aEPwAAAABJRU5ErkJggg==")
    val media = Seq(
      MediaRecord(1L, "image/png", png, Map.empty),
      MediaRecord(2L, "application/junk",
        "definitely not an image".getBytes("UTF-8"), Map.empty)).toDS()
    val out = Multimodal.decodeImages(media).collect().map(d => d.media_id -> d).toMap
    val ok = out(1L)
    assert(ok.decoded && ok.format == "png", ok)
    assert((ok.width, ok.height, ok.channels) == ((3, 2, 1)))
    assert(ok.pix_sum == 10 + 20 + 30 + 200 + 150 + 100)
    // corrupt payload -> quarantine row, never an exception
    val bad = out(2L)
    assert(!bad.decoded && bad.err.nonEmpty && bad.pix_sum == 0L)
  }

  test("synthetic PNGs survive a real encode/decode roundtrip with formula-exact stats") {
    val decoded = Multimodal.decodeImages(Multimodal.syntheticImages(docs))
      .collect().map(d => d.media_id -> d).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val d = decoded(id)
      assert(d.decoded, s"doc $id failed decode: ${d.err}")
      val expected =
        if (id % 2 == 0)
          (0 until 128).map(i => (id * 31 + i) % 256).sum
        else
          (0 until 64).map(i =>
            (id + i) % 256 + (id * 2 + i) % 256 + (id * 3 + i) % 256).sum
      assert((d.width, d.height, d.channels) ==
        (if (id % 2 == 0) ((16, 8, 1)) else ((8, 8, 3))))
      assert(d.pix_sum == expected,
        s"doc $id: decoded sum ${d.pix_sum} != formula $expected")
    }
  }

  test("average-pool resize is exact integer math, verified through a re-decode") {
    val media = Multimodal.syntheticImages(docs.limit(20))
    val pooled = Multimodal.decodeImages(Multimodal.resizePooled(media, 4, 4))
      .collect().map(d => d.media_id -> d).toMap
    docs.limit(20).select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val d = pooled(id)
      assert(d.decoded && d.width == 4 && d.height == 4, d)
      // replay the pooling independently: floor-average per block per band
      val (sw, sh, bands) = if (id % 2 == 0) (16, 8, 1) else (8, 8, 3)
      def sample(x: Int, y: Int, b: Int): Long = {
        val i = y * sw + x
        if (id % 2 == 0) (id * 31 + i) % 256
        else (id * (b + 1) + i) % 256
      }
      val (bw, bh) = (sw / 4, sh / 4)
      var expected = 0L
      for (y <- 0 until 4; x <- 0 until 4; b <- 0 until bands) {
        val blockSum = (for (dy <- 0 until bh; dx <- 0 until bw)
          yield sample(x * bw + dx, y * bh + dy, b)).sum
        expected += blockSum / (bw * bh)
      }
      assert(d.pix_sum == expected,
        s"doc $id: pooled sum ${d.pix_sum} != replayed $expected")
    }
    // non-divisible targets are refused per record, not crashed on
    val odd = Multimodal.resizePooled(media, 5, 3).collect()
    assert(odd.forall(_.meta.get("resize_err").exists(_.contains("not divisible"))))
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

  test("exact rerank recall dominates the plain ADC ranking") {
    val pred = col("vec_id") < 16
    val brute = Similarity.bruteTopK(embs, embs.filter(pred), 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    // the rerank can only fix ranking INSIDE the shortlist, never lose
    // a true neighbor the shortlist already had — recall is monotone,
    // at nprobe=1 and with boundary misses recovered at nprobe=4
    for (np <- Seq(1, 4)) {
      val adc = recallOf(Similarity.ivfpqTopK(embs, pred, 5, nprobe = np))
      val reranked = recallOf(Similarity.ivfpqTopKRerank(embs, pred, 5,
        shortlistFactor = 4, nprobe = np))
      assert(reranked >= adc,
        s"nprobe=$np: rerank recall $reranked < ADC recall $adc")
    }
    // the final ordering is EXACT cosine: every emitted sim equals the
    // independently-computed pair cosine, descending with rank
    val out = Similarity.ivfpqTopKRerank(embs, pred, 5, shortlistFactor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2).toLong, r.getLong(3)))
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosE6(a: Array[Float], b: Array[Float]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
    }
    out.foreach { case (q, n, _, sim) =>
      assert(sim == cosE6(vecs(q), vecs(n)),
        s"pair ($q,$n): emitted $sim != exact ${cosE6(vecs(q), vecs(n))}")
    }
    out.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"sims not descending with rank: ${rows.toSeq}")
    }
  }

  test("filtered ANN: shared index, candidates confined to the predicate") {
    val pred = col("vec_id") < 8
    val out = Similarity.ivfpqTopK(embs, pred, 5,
      corpusPred = Some(col("label") === 0)).collect()
    assert(out.nonEmpty)
    val label0 = embs.filter(col("label") === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every returned neighbor satisfies the predicate
    assert(out.forall(r => label0(r.getLong(1))),
      "filtered search returned an out-of-predicate candidate")
    // distances ascend with rank per query (ADC ordering intact)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val d = rows.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
    // the index is SHARED: unfiltered search over the same corpus
    // agrees with filtered search on every surviving (q, n) distance
    val full = Similarity.ivfpqTopK(embs, pred, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    out.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { dFull =>
        assert(dFull == r.getLong(3),
          s"distance differs between filtered and full search: $r vs $dFull")
      }
    }
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

  test("frame-sample stub: shape contracts hold") {
    val media = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSampleStub(media, frameBytes = 32, stride = 2)
    val f = frames.collect()
    assert(f.nonEmpty && f.forall(_.payload.length == 32))
    assert(f.forall(x => x.meta.contains("parent_id") && x.media_type == "frame/stub"))
    // every sampled frame index is even (stride 2)
    assert(f.forall(_.meta("frame").toInt % 2 == 0))
  }

  test("language id: zero-score docs are unk, scored docs never are") {
    val out = TextAnalysis.langId(docs)
    assert(out.filter(col("pred_lang") === "unk" && col("score") > 0).count() == 0)
    assert(out.filter(col("pred_lang") =!= "unk" && col("score") === 0).count() == 0)
  }

  test("trigram language id identifies held-out sentences across twelve languages") {
    // held-out sentences — none appear in the LangProfiles seed texts
    val fixture = Seq(
      ("en", "she walked along the river in the evening and watched the " +
        "small boats while thinking about the long journey ahead"),
      ("de", "sie ging am abend den fluss entlang und beobachtete die " +
        "kleinen boote waehrend sie ueber die lange reise nachdachte"),
      ("es", "ella camino junto al rio por la tarde y miro los barcos " +
        "pequenos mientras pensaba en el largo viaje que le esperaba"),
      ("fr", "elle marchait le long de la riviere le soir et regardait " +
        "les petits bateaux en pensant au long voyage qui l attendait"),
      ("it", "lei camminava lungo il fiume la sera e guardava le piccole " +
        "barche mentre pensava al lungo viaggio che la aspettava"),
      ("pt", "ela caminhava ao longo do rio a tarde e olhava os barcos " +
        "pequenos enquanto pensava na longa viagem que a esperava"),
      ("nl", "zij liep langs de rivier in de avond en keek naar de " +
        "kleine boten terwijl ze aan de lange reis dacht"),
      ("sv", "hon gick langs floden pa kvallen och tittade pa de sma " +
        "batarna medan hon tankte pa den langa resan"),
      ("da", "hun gik langs floden om aftenen og sa pa de sma bade " +
        "mens hun taenkte pa den lange rejse"),
      ("pl", "szla wzdluz rzeki wieczorem i patrzyla na male lodzie " +
        "myslac o dlugiej podrozy ktora ja czekala"),
      ("ro", "ea mergea de a lungul raului seara si privea barcile " +
        "mici in timp ce se gandea la lunga calatorie care o astepta"),
      ("fi", "han kaveli joen vartta iltaisin ja katseli pienia " +
        "veneita miettien pitkaa matkaa joka hanta odotti"))
      .zipWithIndex.map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "true_lang")
    val pred = TextAnalysis.langId(fixture)
      .join(fixture.select("doc_id", "true_lang"), "doc_id")
    val correct = pred.filter(col("pred_lang") === col("true_lang")).count()
    assert(correct == 12,
      s"trigram lang-id got $correct/12 right: " +
        pred.select("true_lang", "pred_lang").collect().mkString(", "))
    // gibberish with no a-z trigram signal scores 0 → unk
    val noise = Seq((99L, "12345 !!! ???")).toDF("doc_id", "text")
    assert(TextAnalysis.langId(noise).select("pred_lang").head().getString(0) == "unk")
  }

  test("quality classifier separates held-out prose from held-out junk") {
    // none of these appear in QualityModel's seeds
    val fixture = Seq(
      (1L, "the village council discussed the plan for the new school " +
        "and decided to ask the province for additional funding", 1L),
      (2L, "over the winter the team repaired the boats and by spring " +
        "they were ready to fish the northern waters again", 1L),
      (3L, "her research on the old manuscripts revealed that the " +
        "trade routes had shifted long before the war began", 1L),
      (4L, "click here click here free bonus free bonus win win win " +
        "claim your prize today limited offer act now act now", 0L),
      (5L, "cheap replica cheap replica discount wholesale free " +
        "shipping buy now buy now lowest price guaranteed", 0L),
      (6L, "subscribe follow follow promo code promo code link in bio " +
        "smash that button easy cash work from home", 0L))
      .toDF("doc_id", "text", "expected")
    val out = TextAnalysis.qualityClassify(fixture)
      .join(fixture.select("doc_id", "expected"), "doc_id")
    val wrong = out.filter(col("pred_good") =!= col("expected")).collect()
    assert(wrong.isEmpty,
      s"misclassified: ${wrong.map(r => (r.getLong(0), r.getLong(1))).mkString(", ")}")
    // deterministic: same bigint scores on every run
    val a = TextAnalysis.qualityClassify(fixture)
      .select("doc_id", "score_e6").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = TextAnalysis.qualityClassify(fixture)
      .select("doc_id", "score_e6").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    // null text scores exactly the bias
    val nullDoc = Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextAnalysis.qualityClassify(nullDoc)
      .select("score_e6").head().getLong(0) == graft.ext.QualityModel.biasE6)
  }

  test("connected components label every cluster with its min id transitively") {
    // chain 1-2-3 (via separate pairs), island 7-9, singleton pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L), (20L, 21L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L,
      20L -> 20L, 21L -> 20L)
    // local union-find path
    val local = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expect)
    // distributed min-label path (threshold 0 forces it); same fixpoint
    val dist = Dedup.components(pairs, localEdgeThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expect)
  }

  test("canonical dedup keeps one survivor per cluster plus unpaired docs") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "a"), (7L, "b"), (9L, "b"), (50L, "x"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val kept = Dedup.canonical(d, pairs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 7L, 50L))
  }

  test("components agrees with minhash pairs on the real corpus (cluster closure)") {
    val pairs = Dedup.minhashPairs(docs)
    val comp = Dedup.components(pairs)
    // every doc in a pair got a label <= its own id, and both endpoints
    // of every pair share a label
    val labeled = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled.forall { case (v, l) => l <= v })
    val viol = pairs.collect().filter(r =>
      labeled(r.getLong(0)) != labeled(r.getLong(1)))
    assert(viol.isEmpty, s"pairs split across components: ${viol.take(3).mkString}")
  }

  test("contamination reports per-probe shingle overlap with the corpus") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "a b c d"),   // both shingles contaminated
      (11L, "x y z"),     // clean
      (12L, "c d e f")    // one of two shingles contaminated
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, probe).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == ((2L, 2L, 1000L)))
    assert(out(11L) == ((1L, 0L, 0L)))
    assert(out(12L) == ((2L, 1L, 500L)))
  }

  test("pii scrub counts and redacts emails, ips, phone numbers") {
    val d = Seq(
      (1L, "reach me at jo.doe+x@example.org or 10.0.0.1 tomorrow"),
      (2L, "call 555-867-5309 or 555 867 5309 x2"),
      (3L, "plain text, no pii at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getLong(2) == 1 && out(1L).getLong(3) == 0)
    assert(out(2L).getLong(3) == 2)
    assert(out(3L).getLong(1) == 0 && out(3L).getLong(2) == 0 && out(3L).getLong(3) == 0)
    // redaction really replaced the matches: md5 equals the hand-redacted text
    val expect1 = "reach me at <EMAIL> or <IP> tomorrow"
    assert(out(1L).getString(4) ==
      java.security.MessageDigest.getInstance("MD5").digest(expect1.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(out(3L).getLong(5) == "plain text, no pii at all".length.toLong)
  }

  test("hash sampling is deterministic, monotone in rate, and key-stable") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val s100a = Sampling.hashSample(o, "o_orderkey", 100).select("o_orderkey")
      .as[Long].collect().toSet
    val s100b = Sampling.hashSample(o, "o_orderkey", 100).select("o_orderkey")
      .as[Long].collect().toSet
    assert(s100a == s100b) // reproducible
    val s300 = Sampling.hashSample(o, "o_orderkey", 300).select("o_orderkey")
      .as[Long].collect().toSet
    assert(s100a.subsetOf(s300)) // widening the rate only adds rows
    val n = o.count().toDouble
    assert(math.abs(s300.size / n - 0.3) < 0.05) // roughly the asked rate
    // rates 0 and 1000 are the empty and full samples
    assert(Sampling.hashSample(o, "o_orderkey", 0).count() == 0)
    assert(Sampling.hashSample(o, "o_orderkey", 1000).count() == o.count())
  }

  test("stratified sampling applies per-stratum rates; absent strata drop") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val out = Sampling.stratifiedHashSample(o, "o_orderkey", "o_orderstatus",
      Map("F" -> 1000, "O" -> 0))
    val byStatus = out.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("O", 0L) == 0L)
    assert(byStatus("F") == o.filter(col("o_orderstatus") === "F").count())
    assert(!byStatus.contains("P")) // not in the rate map -> dropped
  }

  test("chunkTokens: overlap carried, NO trailing chunk inside its predecessor") {
    val d = Seq((1L, "a b c d e"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    val rows = Chunking.chunkTokens(d, 4, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // 5 tokens, window 4, step 2: starts 0 and 2 only — a start at 4
    // would emit "e", fully contained in "c d e" (duplicate content)
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq("a b c d", "c d e"))
    assert(rows.filter(_._1 == 1L).map(_._4).toSeq == Seq(4L, 3L))
    // every token is covered despite the tightened bound
    assert(rows.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet ==
      Set("a", "b", "c", "d", "e"))
    // empty doc keeps its single empty chunk; short doc = one window
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(""))
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq("x y z"))
    // chunk ids are dense from 0
    assert(rows.filter(_._1 == 1L).map(_._2).toSeq == Seq(0L, 1L))
    intercept[IllegalArgumentException] { Chunking.chunkTokens(d, 4, 4) }
  }

  test("chunking covers every character once per window; overlap carried") {
    val d = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xy"))
      .toDF("doc_id", "text")
    val ch = Chunking.chunk(d, 4, 1)
    val rows = ch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2))
    // step 3: windows at 0,3,6,9 for the 10-char doc
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq("abcd", "defg", "ghij", "j"))
    // consecutive windows share `overlap` characters
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a.takeRight(1) == b.take(1)
      case _         => true
    })
    // empty doc still yields its single empty chunk
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(""))
    // short doc: one short window
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq("xy"))
    // reconstruction: dropping each window's overlap prefix (after the
    // first) concatenates back to the original text
    val rebuilt = rows.filter(_._1 == 1L).map(_._3).zipWithIndex
      .map { case (c, i) => if (i == 0) c else c.drop(1) }.mkString
    assert(rebuilt == "abcdefghij")
    intercept[IllegalArgumentException] { Chunking.chunk(d, 4, 4) }
  }

  test("sequence packing respects the token budget and shard locality") {
    val d = (1L to 40L).map(i => (i, Seq.fill(7)("tok").mkString(" ")))
      .toDF("doc_id", "text") // 7 tokens per doc
    val packed = Chunking.packSequences(d, 21, 4) // 3 docs per sequence
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 40 && rows.forall(_._3 == 7L))
    // within every (shard, seq) the token sum never exceeds the budget
    // once a single doc fits (7 <= 21); seq ids are dense from 0
    rows.groupBy(r => (r._2, r._4)).foreach { case ((_, _), grp) =>
      assert(grp.map(_._3).sum <= 21L)
    }
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val seqs = grp.map(_._4).distinct.sorted
      assert(seqs.toList == (0L until seqs.length).toList)
    }
    // deterministic: same input -> identical assignment
    val again = Chunking.packSequences(d, 21, 4).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows.forall(r => again(r._1) == r._4))
  }

  test("exact moments reproduce Spark's var_samp and covar_samp") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val m = SparkEntry.queries("q24_exact_moments")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = li.select(col("l_returnflag"),
        floor(col("l_quantity") + 0.5).as("q"),
        floor(col("l_discount") * 100 + 0.5).as("d"))
      .groupBy("l_returnflag")
      .agg(var_samp(col("q")).as("vq"), covar_samp(col("q"), col("d")).as("cqd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((flag, row) <- m) {
      val den = row.getLong(5).toDouble
      assert(math.abs(row.getLong(2) / den - ref(flag)._1) < 1e-6, s"var($flag)")
      assert(math.abs(row.getLong(4) / den - ref(flag)._2) < 1e-6, s"covar($flag)")
    }
  }

  test("cosineDupPairs hot-cell guard bounds a degenerate all-identical corpus") {
    // worst case for cell blocking: every vector is identical, so all 200
    // land in one cell and the ungated compare would be all-pairs. With
    // maxCell below the cell size the cell is dropped (bounded work, zero
    // pairs); with the default guard above it, all C(200,2) pairs emit.
    val degenerate = spark.range(200).select(col("id").as("vec_id"),
      typedLit(Array.fill(4)(1.0f)).as("embedding"))
    assert(Similarity.cosineDupPairs(degenerate, 0L, maxCell = 16).count() == 0)
    assert(Similarity.cosineDupPairs(degenerate, 999000L).count() == 200L * 199 / 2)
  }

  test("cosineDupPairs auto-k equals explicit k=32 below the 32-centroid floor") {
    // n=500 at sf0.001..0.01 keeps auto-k at the floor, so the default
    // policy must be bit-identical to the old fixed k=32 (oracle safety)
    val auto = Similarity.cosineDupPairs(embs, 450000L).collect().toSet
    val fixed = Similarity.cosineDupPairs(embs, 450000L, numCentroids = 32)
      .collect().toSet
    assert(auto == fixed)
  }

  test("bigram LM score ranks fluent repetition above gibberish") {
    import spark.implicits._
    // "the cat sat" repeated => every bigram transition is common;
    // the gibberish doc's bigrams are singletons => far lower avg logprob
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "the cat sat on the mat"),
      (3L, "zq wv xj kp qn mz"),
      (4L, "one")).toDF("doc_id", "text") // single token: no bigrams
    val scored = TextAnalysis.lmScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!scored.contains(4L)) // <2 tokens: excluded
    assert(scored(1L)._1 == 8 && scored(2L)._1 == 5 && scored(3L)._1 == 5)
    // repetitive doc scores strictly higher (closer to 0) than gibberish
    assert(scored(1L)._2 > scored(3L)._2)
    assert(scored(2L)._2 > scored(3L)._2)
    // scores are log-probabilities: never positive
    assert(scored.values.forall(_._2 <= 0))
    // deterministic across runs (sorted fold)
    val again = TextAnalysis.lmScore(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == scored)
  }

  test("paragraph dedup flags shared windows across documents") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$shared unique one two three four five six seven eight"),
      (2L, s"$shared other words here that do not repeat at all"),
      (3L, "entirely different content with no shared windows anywhere ok"))
      .toDF("doc_id", "text")
    val d = TextAnalysis.paragraphDedup(docs, parTokens = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1 and 2 share their first 10-token window; doc 3 shares none
    assert(d(1L) == ((2L, 1L, 500L)), d.toString)
    assert(d(2L) == ((2L, 1L, 500L)), d.toString)
    assert(d(3L)._2 == 0L && d(3L)._3 == 0L)
    // paragraphs compose with the near-dup stack: the paragraph relation
    // has one row per (doc, window)
    assert(TextAnalysis.paragraphs(docs, 10).count() == 5)
  }

  test("url filter extracts hosts, psl-aware domains, and drops blocklisted") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://news.bbc.co.uk/story/1"),     // multi-part suffix
      (2L, "http://www.example.com/a?b=c"),
      (3L, "https://blocked.org/x"),
      (4L, "https://sub.deep.blocked.org/y"),     // subdomain of blocked
      (5L, "https://keep.net:8080/z"),            // port excluded from host
      (6L, "not a url at all"))
      .toDF("doc_id", "url")
    val kept = UrlOps.filterByBlocklist(rows, "url", Seq("blocked.org").toDF("domain"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("host"), r.getAs[String]("domain"))).toMap
    assert(!kept.contains(3L) && !kept.contains(4L))
    assert(kept(1L) == (("news.bbc.co.uk", "bbc.co.uk")))
    assert(kept(2L) == (("www.example.com", "example.com")))
    assert(kept(5L) == (("keep.net", "keep.net")))
    assert(kept(6L) == (("", ""))) // non-URLs pass through, unannotated
  }

  test("centroidsK row-count hint yields identical centroids, no count job") {
    // ParquetMeta reads footers only (pure hadoop-fs + parquet-mr on the
    // driver — it cannot launch a Spark job by construction) and must
    // agree exactly with a full count
    val metaN = graft.io.ParquetMeta.rowCount(spark, s"$sf/embeddings.parquet")
    assert(metaN == embs.count())
    val withHint = Similarity.centroidsK(embs, 32, rowCountHint = Some(metaN))
      .select("c_id").collect().map(_.getLong(0)).sorted.toSeq
    val without = Similarity.centroidsK(embs, 32)
      .select("c_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(withHint == without)
  }

  test("lineDedup strips corpus-frequent lines, keeps order and blanks") {
    val fx = Seq(
      (1L, "HEADER\nalpha one\n\nbeta two\nFOOTER"),
      (2L, "HEADER\ngamma three\nFOOTER"),
      (3L, "HEADER\ndelta four\nFOOTER"),
      (4L, "HEADER\nalpha one\nFOOTER"), // dup content line: below threshold
      (5L, "HEADER\nFOOTER")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(fx, minDupCount = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // HEADER/FOOTER appear 5x >= 3 -> dropped everywhere; "alpha one"
    // appears 2x < 3 -> kept; blank line kept; order preserved
    assert(out(1L) == ((5L, 3L, "alpha one\n\nbeta two")))
    assert(out(2L) == ((3L, 1L, "gamma three")))
    assert(out(4L) == ((3L, 1L, "alpha one")))
    assert(out(5L) == ((2L, 0L, "")))
  }

  test("substringDedup finds cross-doc and self-repeat spans, merges islands") {
    val shared = "common one two three four"
    val fx = Seq(
      (1L, s"x1 x2 $shared y1 y2"), // span tokens [3,7]
      (2L, s"z1 $shared z2"), // span [2,6]
      (3L, "p q r s t"), // no duplicates
      (4L, "m n o m n o m n o"), // self-repeat: whole doc one span
      (5L, s"$shared u1 u2 u3 u4 $shared") // two islands, gap > k
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(fx, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((9L, 5L, 1L, "x1 x2 y1 y2")))
    assert(out(2L) == ((7L, 5L, 1L, "z1 z2")))
    assert(out(3L) == ((5L, 0L, 0L, "p q r s t")))
    assert(out(4L) == ((9L, 9L, 1L, "")))
    assert(out(5L) == ((14L, 10L, 2L, "u1 u2 u3 u4")))
  }

  test("substringDedup: docs shorter than k never count as duplicated") {
    val fx = Seq((1L, "same short"), (2L, "same short"), (3L, "same short"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(fx, k = 3).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getLong(2) == 0L && r.getString(4) == "same short"))
  }

  test("substringDedup: NULL text behaves as an empty document") {
    val fx = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(fx, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((4L, 0L, 0L, "a b c d")))
    // size(NULL) must not leak a -1 token count
    assert(out(2L) == ((0L, 0L, 0L, "")))
  }

  test("semantic dedup clusters cell-confined cosine neighbors, keeps min id") {
    val fx = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.99f, 0.01f)),
      (3L, Array(0.98f, 0.02f)),
      (4L, Array(0f, 1f)),
      (5L, Array(0.01f, 0.99f)),
      (6L, Array(-1f, 0.1f))).toDF("vec_id", "embedding")
    val out = Dedup.semantic(fx, 950000L, numCentroids = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((1L, 3L, 1L)))
    assert(out(2L) == ((1L, 3L, 0L)))
    assert(out(3L) == ((1L, 3L, 0L)))
    assert(out(4L) == ((4L, 2L, 1L)))
    assert(out(5L) == ((4L, 2L, 0L)))
    assert(out(6L) == ((6L, 1L, 1L)))
  }

  test("semantic dedup on the corpus: representatives cover every cluster") {
    val d = Dedup.semantic(embs, 300000L)
    assert(d.count() == embs.count())
    // exactly one representative per cluster, and it is the minimum id
    val perCluster = d.groupBy("cluster_id")
      .agg(sum("keep").as("reps"), min("vec_id").as("mn"),
        first("cluster_id").as("cid"))
    assert(perCluster.filter(col("reps") =!= 1L).count() == 0)
    assert(perCluster.filter(col("mn") =!= col("cid")).count() == 0)
  }

  test("domainMix hits the target mixture with the binding domain kept whole") {
    val d = docs.select(col("doc_id"), col("source"))
    val mixed = Sampling.domainMix(d, "doc_id", "source",
      Map("src1" -> 500, "src2" -> 300, "src3" -> 200))
    val kept = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = d.filter(col("source").isin("src1", "src2", "src3"))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only weighted domains survive
    assert(mixed.select("source").distinct().count() <= 3)
    // src1 is binding at equal input counts (largest weight): kept whole
    assert(kept("src1") == orig("src1"))
    // ratios roughly follow 5:3:2 (hash sampling at tiny n is noisy)
    assert(kept("src2") < kept("src1") && kept("src3") < kept("src2"))
    // deterministic: rerun selects the identical doc set
    val again = Sampling.domainMix(d, "doc_id", "source",
      Map("src1" -> 500, "src2" -> 300, "src3" -> 200))
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
  }

  test("shuffledPositions: dense, deterministic, equals the single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val d = (1L to 300L).toDF("doc_id")
    val got = Sampling.shuffledPositions(d, seed = "s1")
      .as[(Long, Long)].collect().toMap
    // dense permutation of 0..n-1
    assert(got.values.toSeq.sorted == (0L until 300L))
    // equals the global-window reference order
    val h = md5(concat(lit("s1"), col("doc_id").cast("string")))
    val want = d.withColumn("pos",
      row_number().over(Window.orderBy(h.asc, col("doc_id").asc)).cast("long") - 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // deterministic across calls; a different seed permutes differently
    assert(Sampling.shuffledPositions(d, "s1").as[(Long, Long)].collect().toMap == got)
    assert(Sampling.shuffledPositions(d, "s2").as[(Long, Long)].collect().toMap != got)
  }

  test("selectByBudget equals the single-window reference; boundary exact") {
    import org.apache.spark.sql.expressions.Window
    val d = (1L to 200L)
      .map(i => (i, (i * 37) % 101, 1L + (i % 7))) // (id, score, tokens)
      .toDF("doc_id", "score", "n_tokens")
    val budget = 300L
    val got = Sampling.selectByBudget(d, budget)
      .select("doc_id").as[Long].collect().toSet
    // reference: one global running-total window
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < 200, "partial selection")
    // the kept set's token total never exceeds the budget, and adding
    // the next-ranked doc would
    val toks = d.as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(got.toSeq.map(toks).sum <= budget)
    // degenerate budgets
    assert(Sampling.selectByBudget(d, 0L).count() == 0)
    assert(Sampling.selectByBudget(d, 1000000L).count() == 200)
  }

  test("hybrid RRF: rank-based fusion — both-list docs dominate, single-list docs still score") {
    val res = Retrieval.hybridRrfTopK(docs, embs,
      Seq("spark", "query", "merge"), queryVecId = 7L, k = 10)
      .collect()
    assert(res.length == 10)
    // ranks are 1..k by fused score descending, ties by id
    assert(res.map(_.getLong(res.head.fieldIndex("rank"))).toSeq ==
      (1L to 10L))
    val scores = res.map(_.getLong(res.head.fieldIndex("rrf_e9"))).toSeq
    assert(scores == scores.sorted.reverse)
    // the fused score is EXACTLY the sum of its two e9-rounded terms
    res.foreach { r =>
      def term(f: String): Long =
        if (r.isNullAt(r.fieldIndex(f))) 0L
        else math.floor(1e9 / (60.0 + r.getLong(r.fieldIndex(f))) + 0.5).toLong
      assert(r.getLong(r.fieldIndex("rrf_e9")) == term("r_lex") + term("r_vec"))
    }
    // the query doc itself is never a candidate
    assert(!res.exists(_.getLong(0) == 7L))
    // a doc ranked #1 on BOTH lists would beat any single-list doc:
    // verify the weaker invariant that holds for real data — every
    // both-list doc outscores a doc whose single rank is strictly worse
    // than both of its ranks
    val both = res.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(both.nonEmpty, "fixture query should have overlapping lists")
    // IVF variant fuses identically (rank math unchanged), candidates
    // confined to the probed cell
    val ivf = Retrieval.hybridRrfTopKIvf(docs, embs,
      Seq("spark", "query", "merge"), queryVecId = 7L, k = 10)
      .collect()
    assert(ivf.length == 10)
    assert(!ivf.exists(_.getLong(0) == 7L))
    // lexical ranks agree between the two variants (same lex branch)
    val lexOf = res.filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ivf.filter(!_.isNullAt(1)).foreach { r =>
      lexOf.get(r.getLong(0)).foreach(rl => assert(rl == r.getLong(1)))
    }
  }
}
