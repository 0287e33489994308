package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared text primitives. All expressions are chosen to have exact
  * DuckDB-SQL equivalents (so every operator built on them is
  * oracle-checkable) and to stay inside whole-stage codegen: pure
  * built-in higher-order functions, no UDFs, no shuffles beyond the
  * operator's own aggregation.
  */
object TextOps {

  /** Ensure at least default parallelism for compute-heavy per-row work.
    * Testdata-sized inputs are single-row-group parquet (one scan task);
    * a cheap early repartition buys every core. At real scale inputs
    * already have >= cores partitions and this is a no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    spreadDecision(df, target) match {
      case Some(true)  => df.repartition(target)
      case Some(false) => df
      // structurally undecidable: pay the physical-plan probe
      case None =>
        if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }

  /** Decide `numPartitions < target` WITHOUT building the physical plan
    * when the (already-analyzed) logical plan answers it structurally:
    * the `.rdd` probe plans + DAGs the whole subtree just to read a
    * partition count — a measured 20-80 ms fixed tax per operator entry
    * that every fresh DataFrame pays again. Covered cases: a pinned
    * checkpoint leaf (exact RDD partition count, free) and a plain
    * Project/Filter chain over ONE file relation (Spark's own
    * maxSplitBytes arithmetic bounds the scan's partition count from
    * both sides). Anything else — joins, aggregates, exchanges already
    * in the tree — returns None and takes the probe, so behavior never
    * changes where the structure is not obvious.
    */
  private def spreadDecision(df: DataFrame, target: Int): Option[Boolean] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Project => LProject, SubqueryAlias}
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    @annotation.tailrec
    def leafOf(p: LogicalPlan): LogicalPlan = p match {
      case LProject(_, c)      => leafOf(c)
      case LFilter(_, c)       => leafOf(c)
      case SubqueryAlias(_, c) => leafOf(c)
      case other               => other
    }
    leafOf(df.queryExecution.analyzed) match {
      case lr: LogicalRDD => Some(lr.rdd.getNumPartitions < target)
      case rel: LogicalRelation =>
        rel.relation match {
          case fs: HadoopFsRelation =>
            // Partition-pruned scans: location.sizeInBytes is the UNPRUNED
            // total, so both bounds below would reason about the wrong
            // byte count (stripped Filters may prune partitions). Take
            // the probe — it plans the pruned scan (r17 ADVICE).
            if (fs.partitionSchema.nonEmpty) return None
            val conf = df.sparkSession.sessionState.conf
            val openCost = conf.filesOpenCostInBytes
            val maxSplit = conf.filesMaxPartitionBytes
            val totalBytes = fs.location.sizeInBytes
            if (totalBytes <= 0) return Some(true)
            // The file count makes both bounds sound for MULTI-file
            // relations (the r17 single-openCost bound under-counted
            // splits for many-small-file scans and could repartition
            // DOWN, against the documented invariant — r17 ADVICE). The
            // listing is already cached by the FileIndex (it sized
            // sizeInBytes from it).
            val nFiles = fs.location.inputFiles.length.toLong
            if (nFiles <= 0) return Some(true)
            // Spark's own split arithmetic (FilePartition.maxSplitBytes):
            // every file is weighted len + openCost; bin capacity =
            // min(maxSplit, max(openCost, weighted / minPartitionNum)).
            val minPartitionNum =
              conf.filesMinPartitionNum.getOrElse(target)
            val weighted = totalBytes + nFiles * openCost
            val cap = math.max(1L, math.min(maxSplit,
              math.max(openCost, weighted / math.max(1, minPartitionNum))))
            // partitions <= chunks (every bin holds >= 1 chunk), and
            // chunks = sum(ceil(len_i / cap)) <= ceil(total / cap) +
            // nFiles (each file's ceil rounds up at most once)
            val upperBound =
              math.ceil(totalBytes.toDouble / cap).toLong + nFiles
            // a bin closes only when the NEXT chunk would push its
            // accumulated weight past cap, so a closed bin holds at most
            // cap + openCost of weight: bins >= ceil(weighted / (cap +
            // openCost)) — conservative on the Some(false) side
            val lowerBound =
              math.ceil(weighted.toDouble / (cap + openCost)).toLong
            if (upperBound < target) Some(true)
            else if (lowerBound >= target) Some(false)
            else None
          case _ => None
        }
      case _ => None
    }
  }

  /** 128-bit internal grouping/join key: two independently-seeded
    * xxhash64 halves over the input (the second folds a literal seed in
    * first). For keys that never reach declared output values this
    * replaces md5-of-concatenated-strings: both halves are codegen'd
    * long arithmetic straight over the input bytes (or array elements —
    * no concat buffer is ever built), and the shuffle/join key is a
    * 16-byte struct instead of a 32-char string. Two halves, not one:
    * a single 64-bit key collides with near-certainty at 100 TB anchor
    * volumes (birthday bound ~5e9), which would silently erode the
    * exact-dedup contracts; 128 bits keeps the same collision posture
    * as the md5 it replaces (r18 measured the single-hash variant ~0.4 s
    * faster on substring_dedup and rejected it on that contract).
    * (Guide §4: built-in codegen expressions on the hot path.)
    */
  private[ext] def key128(c: Column): Column =
    struct(xxhash64(c).as("k0"), xxhash64(lit(42L), c).as("k1"))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** `n`-word shingles; whole text as a single shingle when shorter.
    * (Word shingles, not char shingles: ~50 tokens/doc ⇒ ~50 shingles,
    * which keeps MinHash linear in corpus size at 100 TB.)
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** 31-bit base hash of a shingle: low 31 bits of the first 60 bits of
    * its md5. One md5 per shingle; the permutation family is arithmetic
    * (multiply-shift mod 2^31-1), so k permutations cost k multiplies,
    * not k hashes — and every step is exact bigint math reproducible in
    * any engine.
    */
  def hash31(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
      .bitwiseAND(lit(2147483647L))

  val MersennePrime31: Long = 2147483647L // 2^31 - 1

  /** Deterministic (a_p, b_p) multiply-shift parameters, shared with the
    * DuckDB oracle (see [[graft.OracleSql]]).
    */
  def minhashParams(perms: Int): Seq[(Long, Long)] =
    (0 until perms).map { p =>
      val a = ((p + 1) * 2654435761L) % MersennePrime31
      val b = (p * 40503L + 17L) % MersennePrime31
      (a, b)
    }

  /** Permuted hash value for permutation parameters (a, b). */
  def permute(h31: Column, a: Long, b: Long): Column =
    (lit(a) * h31 + lit(b)) % MersennePrime31
}

/** Deduplication operators for LLM training-data pipelines (north-star
  * EXT surface; SURVEY §2.8). Each is a declarative plan: hash-groupBy
  * for exact dedup (one partial-aggregated shuffle), window-rank for
  * latest-wins, MinHash+LSH banding for near-dup candidate pairs (the
  * 100 TB path: no O(n²) comparisons, shuffles only on band keys).
  */
object Dedup {
  import TextOps._

  /** Exact dedup by normalized-text hash: one row per distinct content,
    * keeping the smallest id; `n_dups` counts the collapsed group.
    * GroupBy on the 128-bit hash (not the full text) keeps shuffle rows
    * narrow at scale.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    TextOps.spread(docs)
      .withColumn("text_hash", md5(lower(trim(col(textCol)))))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Newest record per key — upsert-compaction / write-time dedup
    * (generalizes the reference's `deduplicate_insert`,
    * dagster_delta/handler.py:113-114).
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signatures: explode shingles to rows (one md5 each), then
    * `perms` arithmetic permutations as partial-aggregated `min`s in a
    * single groupBy — the 100 TB shape: hashing is one pass, the only
    * shuffle carries (id, 31-bit hash) rows, and map-side combine
    * collapses them before the exchange.
    */
  def minhashSignatures(
      docs: DataFrame,
      perms: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = shingles(tokens(col(textCol)), 3)
    val exploded = TextOps.spread(docs)
      .select(col(idCol), explode(sh).as("s"))
      .select(col(idCol), hash31(col("s")).as("h31"))
    val aggs = minhashParams(perms).zipWithIndex.map { case ((a, b), p) =>
      min(permute(col("h31"), a, b)).as(s"mh$p")
    }
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band_id, band_key) LSH banding rows for `perms` MinHash
    * permutations in bands of `rowsPerBand`.
    */
  def minhashBands(
      docs: DataFrame,
      perms: Int = 16,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigDf = minhashSignatures(docs, perms, idCol, textCol)
    val nBands = perms / rowsPerBand
    val bands = array((0 until nBands).map { b =>
      val keyCols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      md5(concat_ws("|", keyCols: _*))
    }: _*)
    sigDf.select(col(idCol), posexplode(bands).as(Seq("band_id", "band_key")))
  }

  /** Near-duplicate candidate pairs: docs sharing any LSH band. The only
    * wide shuffle is the self-equi-join on (band_id, band_key); Catalyst
    * plans it as a hash join keyed on the band, so cost is Σ bucket² —
    * linear once degenerate bands are capped (below).
    */
  def minhashPairs(
      docs: DataFrame,
      perms: Int = 16,
      rowsPerBand: Int = 4,
      maxDocsPerBand: Int = 500): DataFrame = {
    // Materialize the band relation ONCE (eager localCheckpoint): the
    // self-join references it twice, and without materialization each
    // side re-runs the whole shingle→md5→permute→min pipeline — a second
    // full corpus-hash pass at 100 TB (same fix as components()).
    val b = minhashBands(docs, perms, rowsPerBand).localCheckpoint(eager = true)
    // Hot-band guard: a degenerate band key (boilerplate pages at web
    // scale) turns the band self-join quadratic in that bucket. Bands
    // with more than `maxDocsPerBand` members are dropped wholesale —
    // they carry near-zero LSH signal, and docs that truly match still
    // pair through their other, informative bands. The hot list holds
    // degenerate keys only, so it is tiny: materialize it and anti-join
    // by broadcast — one partial-aggregated count plus a narrow join,
    // no extra wide shuffle, and worst-case join work is bounded by
    // O(#bands · maxDocsPerBand²) regardless of corpus degeneracy.
    val hot = b.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxDocsPerBand)
      .select("band_id", "band_key")
      .localCheckpoint(eager = true)
    val kept = b.join(broadcast(hot), Seq("band_id", "band_key"), "left_anti")
    val a = kept.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val c = kept.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    val pairs = a.join(c, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    // Seal the (small) pair set and release the corpus-sized band
    // relation NOW — without this every call leaks its checkpointed
    // bands for the session's lifetime (see Scratch).
    Scratch.seal(pairs, b, hot)
  }

  /** Connected components over near-duplicate candidate pairs: every doc
    * in a transitively-connected dup cluster is labeled with the
    * cluster's smallest doc id (`component`). Distributed min-label
    * propagation: per round, one keyed join of labels across the
    * symmetrized edge list + one partial-aggregated min — shuffles key on
    * vertex ids only, never all-pairs, and the vertex set is confined to
    * docs that appear in a pair (a vanishing fraction of the corpus).
    * Rounds needed = cluster diameter; near-dup clusters are
    * shallow (long chains mean the similarity threshold, not the data,
    * is wrong), and `maxIters` bounds the worst case. Labels are
    * localized every round via persist so lineage stays flat; the
    * convergence check is a metadata-scale count.
    */
  def components(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIters: Int = 20,
      localEdgeThreshold: Long = 5000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = pairs.sparkSession
    // symmetrize in ONE scan (explode both directions per pair) — a
    // two-branch union would evaluate the whole upstream pairs plan
    // twice (at 100 TB that's a second full corpus-hash pass).
    // localCheckpoint (eager) rather than persist: the upstream here is
    // the full LSH candidate pipeline, the most expensive plan in the
    // suite, and a persist is only a cache HINT — under memory pressure
    // blocks evict and the count() below plus the collect()/loop after
    // it each silently re-run the whole pipeline. The checkpoint
    // materializes exactly once, truncates lineage so nothing CAN
    // recompute it, and its blocks spill to local disk instead of
    // evicting; the ContextCleaner reclaims them once unreferenced.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(eager = true)
    locally {
      // The edge set (pairs only among near-dups) is a vanishing fraction
      // of the corpus; when it fits driver memory, union-find locally —
      // O(E α(E)) with zero extra Spark rounds. The distributed loop
      // below is the path for corpora whose dup graph alone exceeds the
      // driver (its per-round shuffles key on vertex ids, never
      // all-pairs), and both paths converge to the same min-label
      // fixpoint.
      // ONE job decides the route AND fetches the edges: a bounded
      // limit-collect replaces the old count()-then-collect() pair (two
      // full reads of the edge checkpoint). At most threshold+1 rows
      // reach the driver — the same driver-memory budget the count
      // guard enforced, discarded in the rare over-threshold case.
      // clamp BEFORE the +1: thresholds near Long.MaxValue overflowed to
      // a negative limit, and thresholds >= Int.MaxValue made the old
      // probe.length guard vacuously true (a >2B-edge graph would have
      // been force-collected); past the clamp the distributed loop is
      // the only route that can hold the edges anyway (r17 ADVICE)
      val localCap = math.min(localEdgeThreshold, Int.MaxValue - 1L).toInt
      val probe = edges.select("src", "dst")
        .limit(localCap + 1)
        .collect()
      if (probe.length <= localCap) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x // path compression
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        probe.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min root wins => labels are cluster minima
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val rows = parent.keys.toSeq.sorted.map(v =>
          org.apache.spark.sql.Row(v, find(v)))
        import org.apache.spark.sql.types._
        Scratch.release(edges) // labels are local now; drop the edge blocks
        return spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          StructType(Seq(StructField("doc_id", LongType, nullable = false),
            StructField("component", LongType, nullable = false))))
      }
      var labels = edges.select(col("src").as("doc_id"))
        .distinct()
        .withColumn("component", col("doc_id"))
        .persist(MEMORY_AND_DISK)
      var it = 0
      var converged = false
      // labels only ever decrease, so the (exact, overflow-safe) label sum
      // is strictly monotone until the fixpoint — equal sums ⇔ converged,
      // one cheap agg instead of a join-compare per round
      def labelSum(df: DataFrame): java.math.BigDecimal = df
        .agg(sum(col("component").cast("decimal(38,0)"))).first().getDecimal(0)
      var prevSum = labelSum(labels)
      while (!converged && it < maxIters) {
        val viaNeighbor = edges
          .join(labels.select(col("doc_id").as("dst"),
            col("component").as("n_comp")), "dst")
          .select(col("src").as("doc_id"), col("n_comp").as("component"))
        val minned = labels.union(viaNeighbor)
          .groupBy("doc_id")
          .agg(min("component").as("component"))
        // pointer jump (component := component's own label): collapses
        // chains exponentially, so rounds = O(log diameter) instead of
        // O(diameter) — a label is always a vertex id, so the self-join
        // key always resolves
        val next = minned
          .join(minned.select(col("doc_id").as("c2"),
            col("component").as("c2l")),
            col("component") === col("c2"), "left")
          .select(col("doc_id"),
            coalesce(col("c2l"), col("component")).as("component"))
          .persist(MEMORY_AND_DISK)
        val s = labelSum(next)
        labels.unpersist()
        labels = next
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        it += 1
      }
      // flatten the loop lineage (labels' lineage spans every round) and
      // release the loop cache + the edge checkpoint now that the label
      // set is sealed; the sealed output is registered for Scratch.drain
      val out = Scratch.seal(labels, edges)
      labels.unpersist()
      out
    }
  }

  /** Train/eval contamination report (the decontamination pass every
    * benchmark-respecting pipeline runs): for each probe (eval) doc, how
    * many of its distinct n-gram shingles appear ANYWHERE in the corpus
    * (train side), and the overlap in permille. Plan shape at 100 TB:
    * corpus shingles collapse to a distinct set (partial-agg shuffle
    * keyed on the shingle), probes left-semi join that set on the same
    * key — never doc×doc, cost linear in total shingle volume. Raise `n`
    * (8-13 is the usual decontam range) to tighten the match.
    */
  def contamination(
      corpus: DataFrame,
      probe: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = array_distinct(shingles(tokens(col(textCol)), n))
    val corpusShingles = TextOps.spread(corpus)
      .select(explode(sh).as("s"))
      .distinct()
    // one probe pass: LEFT join the (distinct) corpus set with a marker,
    // then total + hit counts fall out of a single aggregation — the
    // probe's shingles are distinct per doc and the corpus side is
    // distinct, so the join cannot duplicate rows
    probe.select(col(idCol), explode(sh).as("s"))
      .join(corpusShingles.withColumn("__hit", lit(1)), Seq("s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hit"))
      .select(col(idCol),
        col("n_shingles").cast("long").as("n_shingles"),
        col("n_hit").cast("long").as("n_hit"),
        floor(lit(1000.0) * col("n_hit") / col("n_shingles"))
          .cast("long").as("contam_permille"))
  }

  /** Keep one canonical doc per near-dup cluster (the smallest id — the
    * standard "first seen wins" policy) plus every unpaired doc: the
    * cluster members that are NOT their component's label are dropped
    * with one anti-join keyed on the id.
    */
  def canonical(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    canonicalFromComponents(docs, components(pairs), idCol)

  /** [[canonical]] over precomputed [[components]] labels — use this
    * when the caller also needs the cluster labels, so the component
    * computation runs once.
    */
  def canonicalFromComponents(
      docs: DataFrame,
      comp: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val losers = comp
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-ranked survivor selection: per duplicate cluster keep the
    * member with the BEST `scoreCol` (tie → smallest id) — the curation
    * policy that keeps the longest / highest-quality copy instead of
    * [[canonical]]'s "smallest id wins". Unpaired docs survive
    * untouched. Cost: the component labels (pair-sized, tiny next to
    * the corpus) join the doc scores once, one per-cluster argmax
    * window over that SMALL relation, and one anti-join back — the
    * corpus is never shuffled on anything but the id key.
    */
  def canonicalByScore(
      docs: DataFrame,
      pairs: DataFrame,
      scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    // components() emits (doc_id, component) regardless of idCol —
    // rename ITS key to the caller's, then every reference below is
    // uniformly idCol (the earlier doc_id-fixed join broke any
    // non-default idCol at analysis)
    val comp = components(pairs)
      .select(col("doc_id").as(idCol), col("component"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col(scoreCol).desc, col(idCol))
    val losers = comp
      .join(docs.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(idCol)
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash signature as a '0'/'1' string. Per-token bits come
    * from the token's md5; each bit of the signature is the sign of the
    * per-bit vote over distinct tokens.
    *
    * Plan: explode distinct tokens (md5 computed once per token row),
    * then the 64 bit-votes packed into 16 longs of four 16-bit lanes
    * each — each md5 hex digit's 4 bits spread into lanes through a
    * 16-entry literal lookup (one `instr` + one `element_at` per digit),
    * summed with plain long addition. That cuts the aggregate from 64
    * complex sum columns to 16 trivial ones, which is what dominated
    * bench time (janino compile of the 64-column plan), while the
    * shuffle stays one narrow partial-aggregated groupBy. The vote
    * `sum(±1) > 0` is recovered as `2*ones > n`. Lane width bounds docs
    * at 65,535 distinct tokens (a lane carry would corrupt its
    * neighbor) — far above any real document's distinct-token count.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val exploded = TextOps.spread(docs)
      .select(col(idCol),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .select(col(idCol), md5(col("tok")).as("h"))
    // lut(d) = d's 4 bits spread to lanes 0,16,32,48
    val lut = array((0 until 16).map { d =>
      lit(((d & 1).toLong) |
        (((d >> 1) & 1).toLong << 16) |
        (((d >> 2) & 1).toLong << 32) |
        (((d >> 3) & 1).toLong << 48))
    }: _*)
    def digit(pos: Int): Column = // 1-based hex digit of the md5
      call_function("instr", lit("0123456789abcdef"),
        substring(col("h"), pos, 1)).cast("int")
    val packs = (0 until 16).map(j => sum(element_at(lut, digit(j + 1))).as(s"p$j"))
    val agg = exploded
      .groupBy(idCol)
      .agg(count(lit(1)).as("n"), packs: _*)
    val bits = (0 until 64).map { b =>
      val j = b / 4 // hex digit
      val l = b % 4 // lane
      val ones = shiftright(col(s"p$j"), 16 * l).bitwiseAND(lit(0xFFFFL))
      when(ones * 2 > col("n"), "1").otherwise("0")
    }
    agg.select(col(idCol), concat(bits: _*).as("simhash"))
  }

  /** SimHash near-duplicate pairs: LSH banding over the 64-bit signature
    * (4 chunks of 16 bits — any pair within Hamming distance that leaves
    * one chunk untouched becomes a candidate), then exact Hamming
    * filtering. Join shuffles on the 16-bit chunk, never all-pairs.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 6,
      maxBucket: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val chunks = array((0 until 4).map(b =>
      substring(col("simhash"), b * 16 + 1, 16)): _*)
    // Materialize the banded relation ONCE — the self-join below
    // references it twice, and each side would otherwise re-run the full
    // simhash pipeline (explode + md5 + lane-packed agg) over the corpus.
    val banded = sigs
      .select(col(idCol), col("simhash"),
        posexplode(chunks).as(Seq("band_id", "chunk")))
      .localCheckpoint(eager = true)
    // Degenerate-bucket guard: a chunk value shared by b docs yields
    // O(b²) candidates; buckets above `maxBucket` are dropped (hot
    // buckets carry near-zero LSH signal — they mean the chunk is
    // uninformative for this corpus). This bounds worst-case work to
    // O(#buckets · maxBucket²) regardless of corpus degeneracy. The hot
    // list is tiny (degenerate chunks only): materialize + broadcast
    // anti-join instead of a window count, so the guard adds no wide
    // shuffle over band rows.
    val hot = banded.groupBy("band_id", "chunk")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucket)
      .select("band_id", "chunk")
      .localCheckpoint(eager = true)
    val bands = banded.join(broadcast(hot), Seq("band_id", "chunk"), "left_anti")
    val a = bands.select(col("band_id"), col("chunk"),
      col(idCol).as("doc_a"), col("simhash").as("sa"))
    val b = bands.select(col("band_id"), col("chunk"),
      col(idCol).as("doc_b"), col("simhash").as("sb"))
    // Exact Hamming distance as popcount-of-xor over four 16-bit lanes
    // parsed straight off the '0'/'1' signature — value-identical to the
    // old split-into-64-strings + zip_with + HOF-aggregate form, which
    // allocated 128 single-char strings per compared pair and ran in the
    // final (AQE-coalesced, single-partition) stage: an 0.8 s SERIAL
    // tail at sf0.1 (r18 profile). Computing it BEFORE the distinct also
    // lets the exchange carry (doc_a, doc_b, hamming) rows instead of
    // two 64-char signatures (guide §2.3 project early / filter before
    // the exchange; the filter prunes failed candidates pre-shuffle).
    // Same output set: hamming is a function of the pair, so
    // filter+distinct commute.
    def lane(c: Column, i: Int): Column =
      conv(substring(c, i * 16 + 1, 16), 2, 10).cast("long")
    val hamming = (0 until 4)
      .map(i => bit_count(lane(col("sa"), i).bitwiseXOR(lane(col("sb"), i))))
      .reduce(_ + _)
    val pairs = a.join(b, Seq("band_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
    // Seal the (small) pair set and release the corpus-sized banded
    // relation NOW (see Scratch).
    Scratch.seal(pairs, banded, hot)
  }

  /** Token-set Jaccard near-duplicate pairs in exact integer arithmetic
    * (permille), LSH-first: candidates come from [[minhashPairs]] (docs
    * sharing any MinHash band — the banded join shuffles on band keys,
    * never all-pairs), then each candidate is exactly verified with the
    * zero-allocation two-pointer [[graft.functions.SortedIntersectCount]]
    * over per-doc pre-sorted distinct token arrays. Work is
    * O(corpus) hashing + O(candidates) verification — the earlier
    * within-block all-pairs compare was O(Σ block²), which at 100× the
    * data meant ~10,000× the comparisons. LSH recall caveat: a true
    * near-dup pair missed by all bands is not emitted; with 16
    * permutations in 4 bands the miss probability at Jaccard ≥ 0.2 is
    * the standard (1 - s⁴)⁴ curve — tighten bands for higher recall.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      minPermille: Int,
      perms: Int = 16,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val cand = minhashPairs(docs, perms, rowsPerBand)
    // sort each token set ONCE per document; candidate verification is a
    // two-pointer merge per pair, no hash-set builds. The relation is
    // joined TWICE (doc_a side, doc_b side) — pin it once or each side
    // re-tokenizes and re-sorts the whole corpus (a second corpus pass
    // at 100 TB on top of the one minhashPairs already hashed).
    val toks = array_sort(array_distinct(TextOps.tokens(col(textCol))))
    val base = {
      val raw = docs.select(col(idCol), toks.as("toks"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    cand
      .join(base.select(col(idCol).as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(base.select(col(idCol).as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("inter", call_function(
        graft.functions.GraftFunctions.SortedIntersectName, col("ta"), col("tb")))
      .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
      .withColumn("jac_permille", floor(lit(1000) * col("inter") / col("uni")).cast("long"))
      .filter(col("jac_permille") >= minPermille)
      .select("doc_a", "doc_b", "inter", "uni", "jac_permille")
  }

  /** Line-level dedup (CCNet/RefinedWeb boilerplate removal): drop every
    * instance of a non-blank line whose corpus-wide occurrence count
    * (keyed on the md5 of the space-trimmed line) reaches `minDupCount`
    * — navigation bars, cookie banners, copyright footers — and
    * reassemble each document from its surviving lines in order.
    *
    * Scale shape: explode to (doc, pos, line) rows — narrow; ONE wide
    * shuffle for the line-frequency count (partial-aggregated, rows are
    * 16-byte hashes); a shuffle join back on the hash; one groupBy(doc)
    * to reassemble. No driver-side state, no collect — the duplicate
    * set stays distributed (at web scale it is far too big to
    * broadcast). Blank lines never count as boilerplate (they'd always
    * cross the threshold and destroy paragraph structure).
    *
    * Returns (idCol, n_lines, n_kept, clean_text).
    */
  def lineDedup(
      docs: DataFrame,
      minDupCount: Long = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // the line relation is consumed twice (boilerplate count + the join
    // back) — pin it once or each side replays the split+md5 pass
    val lines = {
      val raw = TextOps.spread(docs)
        .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
        .withColumn("blank", trim(col("line")) === "")
        // internal count/join key only (outputs are counts + clean_text)
        .withColumn("lk", key128(trim(col("line"))))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    val boiler = lines.filter(!col("blank"))
      .groupBy("lk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minDupCount)
      .select(col("lk"), lit(true).as("__boiler"))
    lines.join(boiler, Seq("lk"), "left")
      .withColumn("keep", col("blank") || col("__boiler").isNull)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls `when` leaves for dropped lines;
        // array_sort orders the (pos, line) structs by position
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
  }

  /** Exact-substring dedup (the Lee et al. "Deduplicating Training Data
    * Makes Language Models Better" ExactSubstr case, re-expressed
    * without a suffix array): a token position is duplicated iff it lies
    * inside some substring of ≥ `k` tokens that occurs more than once in
    * the corpus — which is exactly "covered by a `k`-token shingle whose
    * corpus-wide occurrence count (same-doc repeats included) is ≥ 2".
    * Covered anchor windows are merged into maximal duplicated spans per
    * document (gaps-and-islands: a new span starts only when the next
    * anchor no longer overlaps or abuts the previous window), and each
    * document is reassembled from the tokens outside all its spans.
    *
    * Scale shape — linear in shingle volume, the property the suffix
    * array buys on one machine: anchors are (doc, pos, 16-byte hash)
    * rows; ONE partial-aggregated count shuffle on the hash (the
    * duplicate-shingle set stays distributed — at web scale it is far
    * too big to broadcast); a shuffle join back on the hash; span-merge
    * is one window keyed on the doc over duplicated anchors only; the
    * reassembly joins token positions against the few spans of their own
    * doc (equi on doc + range post-filter). No driver-side state.
    *
    * Returns (idCol, n_tokens, n_dup_tokens, n_spans, clean_text).
    */
  def substringDedup(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 1, "duplicate-window length must exceed one token")
    // a NULL text tokenizes to NULL — treat it as an empty document
    // (n_tokens 0, nothing duplicated) instead of letting size(NULL)
    // poison the stats downstream
    // the token relation feeds THREE consumers (anchors, the position
    // explode, the final stats) and the anchor relation TWO (the
    // duplicate-count aggregation and the join back) — pin each once
    // (eager localCheckpoint, the pair-generator lifecycle) or every
    // consumer replays the tokenize / the slice+concat+md5-per-anchor
    // pass, the two most expensive stages of this pipeline (a second
    // and third full corpus-hash pass at 100 TB)
    val toks = {
      val raw = TextOps.spread(docs)
        .select(col(idCol),
          coalesce(TextOps.tokens(col(textCol)),
            array().cast("array<string>")).as("toks"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    // anchor i (1-based) covers tokens [i, i+k-1]; a doc shorter than k
    // tokens cannot contain a >= k-token duplicate and contributes none
    val anchors = {
      val raw = toks
        .filter(size(col("toks")) >= k)
        .select(col(idCol),
          explode(sequence(lit(1), size(col("toks")) - (k - 1))).as("pos"),
          col("toks"))
        // the anchor key is internal (outputs are counts + clean_text):
        // hash the k-token window ARRAY directly — tokens cannot contain
        // whitespace, so window identity equals the old concat-string
        // identity — and skip both the per-anchor concat buffer and the
        // md5 (the two hottest per-row costs of this pipeline, r17
        // profile: 15.7 s executor in this stage at sf0.1)
        .select(col(idCol), col("pos"),
          key128(slice(col("toks"), col("pos"), lit(k))).as("h"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    val dup = anchors.groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select("h")
    val w = Window.partitionBy(idCol).orderBy("pos")
    // gap > k means the windows neither overlap nor abut (gap == k is
    // two adjacent windows -> one contiguous duplicated region)
    val spans = anchors.join(dup, Seq("h"))
      .select(col(idCol), col("pos"))
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1).otherwise(0))
      .withColumn("__span", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__span"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    val spanStats = spans.groupBy(idCol).agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s") + 1).as("n_dup_tokens"))
    val pos = toks
      .select(col(idCol), posexplode(col("toks")).as(Seq("q0", "tok")))
      .withColumn("q", col("q0") + 1)
    val kept = pos.join(spans.withColumnRenamed(idCol, "__sid"),
        pos(idCol) === col("__sid") &&
          col("q") >= col("s") && col("q") <= col("e"),
        "left_anti")
      .groupBy(idCol)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("q"), col("tok")))),
          x => x.getField("tok")),
        " ").as("clean_text"))
    toks.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(spanStats, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Semantic dedup over an embedding column (the SemDeDup shape,
    * Abbas et al. 2023): cluster the corpus into IVF cells, score
    * cosine similarity only WITHIN cells, connect pairs above the
    * threshold into components, and keep one representative (the
    * minimum id) per component. Composes [[Similarity.cosineDupPairs]]
    * (cell-confined candidates — never all-pairs; degenerate cells are
    * hard-capped) with [[components]] (hybrid union-find), so the only
    * corpus-wide passes are the centroid assignment and the per-cell
    * pair scoring.
    *
    * Returns one row per vector: (idCol, cluster_id, cluster_size,
    * keep) — `cluster_id` is the component minimum (singletons are
    * their own cluster), `keep` = 1 for the representative.
    */
  def semantic(
      embeddings: DataFrame,
      minSimE6: Long,
      numCentroids: Int = 0,
      maxCell: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rowCountHint: Option[Long] = None): DataFrame = {
    val pairs = Similarity.cosineDupPairs(
      embeddings, minSimE6, numCentroids, maxCell, idCol, vecCol, rowCountHint)
    val comp = components(pairs, "id_a", "id_b")
      .select(col("doc_id").as(idCol), col("component"))
    val wc = Window.partitionBy("cluster_id")
    embeddings.select(col(idCol).cast("long").as(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("component"), col(idCol)))
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        when(col("cluster_id") === col(idCol), 1L).otherwise(0L).as("keep"))
  }
}

/** Text analysis: token/char statistics, heuristic language ID, quality
  * scoring, BPE-ish token counting, content fingerprinting
  * (SURVEY §2.8 / north-star text-analysis surface). All exact integer
  * outputs so the DuckDB oracle hash-matches.
  */
object TextAnalysis {
  import TextOps._

  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      array_max(transform(toks, t => length(t))).as("max_token_len"),
      length(col("text")).as("n_chars_computed"))
  }

  /** Exact global top-`k` most frequent word `n`-grams — the corpus
    * boilerplate detector (feeds the hot-band story: the n-grams this
    * surfaces are the ones that degenerate LSH bands). One
    * partial-aggregated count shuffle (map-side combine collapses
    * repeats before the exchange) followed by `orderBy(...).limit(k)`,
    * which Spark plans as TakeOrderedAndProject: per-partition top-k
    * merged on the driver, never a global sort of the n-gram space.
    * Deterministic tie-break by n-gram text.
    */
  def frequentNgrams(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 20,
      textCol: String = "text"): DataFrame = {
    require(n > 0 && k > 0, "n and k must be positive")
    spread(docs)
      .select(explode(shingles(tokens(col(textCol)), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }

  /** Character-trigram language ID ([[LangProfiles]]): rank-weighted
    * top-trigram profiles per language as plan reference objects, one
    * codegen'd scan per row summing profile weights over every trigram
    * occurrence ([[graft.functions.TrigramLangScore]]), argmax with
    * alphabetical tie-break. Narrow per-row pass, no shuffle — the same
    * plan shape as the 4-word-dictionary toy this replaces, with a
    * model that actually separates languages.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = LangProfiles.langs
    val scoresCol = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.TrigramLangScore(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(textCol),
        langs.toArray, LangProfiles.trigramWeights))
    val scored = docs.select(col("doc_id"), scoresCol.as("__scores"))
    // null text → zero scores → 'unk' (mirrors the oracle's LEFT JOIN)
    val s = langs.indices.map(i => coalesce(col("__scores")(i), lit(0L)))
    val best = greatest(s: _*)
    // langs is sorted ascending, so first-equal = alphabetical tie-break
    val pred = langs.indices.drop(1).foldLeft(
      when(s.head === best, langs.head)) { (acc, i) =>
      acc.when(s(i) === best, langs(i))
    }
    scored.select(
      col("doc_id"),
      when(best > 0, pred).otherwise("unk").as("pred_lang"),
      best.as("score"))
  }

  /** Model-based quality classification ([[QualityModel]]): fasttext
    * style hashed-unigram logistic scorer, trained deterministically at
    * init on embedded prose/junk seeds, scored as one exact-integer
    * codegen'd scan per row ([[graft.functions.HashedLinearScore]]) —
    * the model-based complement to the heuristic [[qualityScore]] and
    * gopher rules. Output: (doc_id, score_e6, pred_good ∈ {0,1}).
    */
  def qualityClassify(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val score = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.HashedLinearScore(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(textCol),
        QualityModel.weightsE6, QualityModel.biasE6))
    docs.select(
      col("doc_id"),
      // null text has no token rows in the oracle: score = bias
      coalesce(score, lit(QualityModel.biasE6)).as("score_e6"))
      .withColumn("pred_good",
        when(col("score_e6") > 0, 1L).otherwise(0L))
  }

  /** Quality scoring: punctuation count, stopword count/ratio — the
    * usual cheap pre-filters before expensive pipeline stages.
    */
  def qualityScore(
      docs: DataFrame,
      /** Extra input columns to carry through (e.g. `source` for a
        * downstream per-source gate) — carried here instead of a
        * doc_id self-join after the fact, which would scan twice.
        */
      carry: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col("text"))
    val stop = array(Seq("the", "a", "of", "and", "is", "to", "in").map(lit): _*)
    val nTok = size(toks)
    val nStop = size(filter(toks, t => array_contains(stop, t)))
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
    docs.select(
      col("doc_id") +: carry.map(col) :+
        nTok.as("n_tokens") :+
        nStop.as("n_stopwords") :+
        nPunct.as("n_punct") :+
        floor(lit(1000) * nStop / nTok).cast("long").as("stop_permille"): _*)
  }

  /** BM25 relevance of every document to a fixed query-term set (the
    * Robertson/Spärck Jones formulation with Lucene's +1 idf smoothing).
    * Only documents matching ≥1 term are emitted.
    *
    * Plan shape at 100 TB: one narrow explode of matched terms, one
    * partial-aggregated (doc, term) count shuffle, broadcast joins for
    * the tiny per-term df and 1-row corpus stats — never doc×doc and
    * the vocabulary never leaves the executors.
    *
    * Exactness: each (doc, term) partial score is micro-rounded to e6
    * fixed point BEFORE the per-doc sum, so the total is an exact
    * bigint sum — order-free, hence engine-identical (summing raw
    * doubles would depend on partial-agg order). Constants stay
    * symbolic (`k1 + 1.0`, not `2.2`) so both engines fold the same
    * IEEE operations.
    */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val terms = queryTerms.distinct
    val termLits = array(terms.map(lit): _*)
    val toks = tokens(col("text"))
    val base = spread(docs).select(col("doc_id"), toks.as("toks"),
      size(toks).cast("long").as("dl"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    // tf is unique per (doc, term) by construction, so the per-term
    // document frequency is a plain row count over tf — deriving dfs
    // from a pinned tf drops a WHOLE corpus tokenize+explode pass (the
    // old dfs branch re-read and re-intersected every document; same
    // derivation tfidfTopK already uses). Pinned because it feeds both
    // dfs and the scoring join.
    val tf = {
      val raw = base
        .select(col("doc_id"), col("dl"),
          explode(filter(col("toks"), t => array_contains(termLits, t))).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5)
      / (col("df") + 0.5) + 1.0)
    val tfd = col("tf").cast("double")
    val partial = idf * (tfd * (lit(k1) + lit(1.0))) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_term_e6", floor(partial * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_match_terms"),
        sum(col("score_term_e6")).as("score_e6"))
  }

  /** Per-document top-k keyword extraction by smoothed tf-idf
    * (sklearn's `smooth_idf` form: `tf/dl · (ln((N+1)/(df+1)) + 1)`),
    * micro-rounded to e6 fixed point per (doc, term) — a single
    * rounded value per output row, so cross-engine double parity holds
    * without order-free summing tricks.
    *
    * Plan shape at 100 TB: one narrow token explode, a partial-agged
    * (doc, term) count shuffle, a term-keyed shuffle join against the
    * vocabulary document frequencies (the vocabulary is corpus-sized —
    * never broadcast), then a per-doc top-k window that reuses the
    * doc-keyed partitioning. Never doc×doc, never a global sort.
    */
  def tfidfTopK(
      docs: DataFrame,
      k: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = tokens(col(textCol))
    val base = spread(docs).select(col("doc_id"), toks.as("toks"),
      size(toks).cast("long").as("dl"))
    // N counts every document (null/empty text included) — the idf
    // denominator is corpus size, not matched-doc count. Counted on the
    // RAW docs frame: deriving it from `base` shuffled the whole corpus
    // text through spread()'s repartition just to count rows (column
    // pruning removed the tokenize but not the exchange).
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    // tf is self-joined below (dfs derives from it) — pin it with an
    // eager checkpoint so the explode+aggregate pipeline runs ONCE, not
    // once per join side (ReuseExchange is not trusted across a
    // self-join of an expensive pipeline; see NOTES). Registered so
    // Scratch.drain() releases the blocks between pipelines.
    val tf = {
      val raw = base
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term") =!= "") // empty text tokenizes to [""]
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    // each (doc, term) appears once in tf, so df is a plain count
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs").cast("double") + lit(1.0)) /
      (col("df") + lit(1.0))) + lit(1.0)
    val score = (col("tf").cast("double") / col("dl")) * idf
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_e6").desc, col("term"))
    tf.join(dfs, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_e6", floor(score * 1e6 + lit(0.5)).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "rank", "score_e6")
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, public
    * heuristics; exact thresholds are configurable knobs): per-document
    * rule booleans plus the conjunction `keep`. All rules are per-row
    * integer/array arithmetic — one narrow pass, no shuffle, pushable
    * below any downstream join at 100 TB:
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] characters (permille fixed point)
    *   - symbol ratio: '#' or '…'-like symbols ≤ 10% of tokens
    *   - bullet ratio: ≤ 90% of lines start with a bullet
    *   - alpha ratio: ≥ 80% of tokens contain a letter
    */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    // No higher-order functions here: aggregate/filter are
    // CodegenFallback and would knock the whole stage out of
    // whole-stage codegen on the corpus-wide path. Token-level counts
    // are computed over the normalized text with token-boundary-aware
    // regexes instead — a token is a maximal \S+ run of
    // `lower(trim(text))` (exactly what `tokens` splits on), `\S*X\S*`
    // consumes a whole token per match and cannot span whitespace, so
    // regexp_count == "number of tokens containing X".
    val toks = tokens(col("text"))
    val norm = lower(trim(col("text")))
    val nTok = size(toks)
    // sum of token lengths == length of tokens concatenated with no sep
    val sumLen = length(array_join(toks, "")).cast("long")
    val meanLenPermille =
      floor(lit(1000) * sumLen / greatest(nTok, lit(1))).cast("long")
    val nSymbol = regexp_count(norm, lit("""\S*(?:#|\.\.\.)\S*"""))
    val lines = split(col("text"), "\n")
    val nLines = greatest(size(lines), lit(1))
    // a line is a bullet iff after stripping SPACES (trim's charset) it
    // starts with '-' or '*'. Anchor on `(?:^|\n)`, NOT (?m)^ — Java's
    // multiline ^ also fires after CR, NEL, LS and PS, line starts the
    // oracle's split-on-'\n' line model would never see
    val nBullet = regexp_count(col("text"), lit("(?:^|\n) *[-*]"))
    val nAlpha = regexp_count(norm, lit("""\S*[a-z]\S*"""))
    val wordsOk = nTok >= minWords && nTok <= maxWords
    val meanLenOk = meanLenPermille >= 3000 && meanLenPermille <= 10000
    val symbolOk = nSymbol * 10 <= nTok
    val bulletOk = nBullet * 10 <= nLines * 9
    val alphaOk = nAlpha * 5 >= nTok * 4
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_words"),
      meanLenPermille.as("mean_word_len_permille"),
      wordsOk.as("words_ok"),
      meanLenOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      alphaOk.as("alpha_ok"),
      (wordsOk && meanLenOk && symbolOk && bulletOk && alphaOk).as("keep"))
  }

  /** N-gram LM quality score: a log-frequency perplexity proxy from a
    * bigram model trained on the corpus ITSELF (the standard
    * quality-filter trick when no external LM is available — fluent text
    * repeats the corpus's common transitions; gibberish bigrams are
    * singletons). Per doc: `avg over bigrams of ln(c(w1 w2) / N)` with
    * `N` = total corpus bigram count — the UNCONDITIONAL frequency, not
    * the conditional `c2/c1` MLE, which degenerates to P=1 on a
    * self-trained model for any unique sequence and would score
    * gibberish as perfectly fluent. Emitted in micro-nats
    * (engine-independent `floor(x*1e6 + 0.5)` fixed point).
    *
    * Plan shape at 100 TB: bigram explode is narrow; model counts are
    * ONE partial-agg shuffle keyed on the bigram; scoring joins shuffle
    * keyed on bigram then doc_id — all linear, the vocabulary is never
    * collected or broadcast (the lone scalar N arrives by broadcast).
    * The per-doc fold runs over a list sorted by the exact INTEGER
    * count, so the double summation order is engine-deterministic.
    */
  def lmScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // NOT pinned/spread: measured at sf0.1, the bigram double-reference
    // is served by Spark's ReuseExchange here (both consumers sit
    // directly on the identical count exchange), so eager checkpoints
    // and a parallelizing repartition only ADDED jobs (1.2 s → 1.5 s
    // profiled — reverted; see OPTIMIZATION_r17.md)
    // r18 re-adjudication (VERDICT item 6): BOTH escape hatches from the
    // double-consumer shape measured/reasoned losers, so the join-back
    // stands. (a) plain spread (no pin): 1.6 -> 4.3 s profiled — the
    // round-robin exchange gives every task its own vocabulary-sized
    // partial-agg hash map (32x the agg work) and the heavy stage ran
    // twice; (b) one-pass groupBy(w1,w2).agg(count, collect_list(doc))
    // + explode: per-key collected doc lists are unbounded state — a hot
    // bigram at 100 TB holds billions of ids in ONE aggregation buffer
    // (guide §2.5); the join-back fan-out is the scale-correct shape.
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bigrams = toks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bigramCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val total = bigramCounts.agg(sum(col("c2")).as("n_total"))
    bigrams
      .join(bigramCounts, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("c2"))).as("cs"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n_bigrams"),
        floor((expr("aggregate(cs, 0D, (acc, x) -> acc + ln(x))")
            / size(col("cs")) - log(col("n_total").cast("double")))
          * lit(1e6) + lit(0.5)).cast("long")
          .as("avg_logprob_micro"))
  }

  /** Documents exploded into fixed-token-window "paragraphs" (the
    * corpus has no structural newlines, so windows stand in for
    * paragraphs exactly like [[Chunking.chunk]]'s char windows — on
    * real data swap in a `split(text, "\n\n")` explode). Narrow: no
    * shuffle, pipelines into whatever consumes it. A paragraph relation
    * composes directly with the doc-level dedup stack —
    * `Dedup.minhashPairs(paragraphs(...).withColumnRenamed(...))` gives
    * near-dup paragraph pairs.
    */
  def paragraphs(
      docs: DataFrame,
      parTokens: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(parTokens > 0, "parTokens must be positive")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .withColumn("nw",
        ceil(size(col("toks")).cast("double") / parTokens).cast("int"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), greatest(col("nw") - 1, lit(0))),
        i => concat_ws(" ",
          slice(col("toks"), i * parTokens + 1, lit(parTokens)))))
        .as(Seq("par_idx", "paragraph")))
  }

  /** Paragraph-level exact dedup (the C4/RefinedWeb-style span dedup):
    * per document, the fraction of its fixed-token-window paragraphs
    * whose content hash appears more than once ANYWHERE in the corpus.
    * Plan at 100 TB: narrow paragraph explode → md5 so the shuffle key
    * is 32 bytes regardless of paragraph length → ONE partial-agg
    * shuffle keyed on the hash for global frequencies → join back keyed
    * the same → per-doc regroup. Linear, no broadcast of anything
    * corpus-sized.
    */
  def paragraphDedup(
      docs: DataFrame,
      parTokens: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // consumed twice (frequency count + the join back) — pin once or
    // each side replays the paragraph split + md5 pass
    val pars = {
      // internal frequency key only (outputs are per-doc counts)
      val raw = paragraphs(docs, parTokens, idCol, textCol)
        .select(col("doc_id"), key128(col("paragraph")).as("h"))
        .localCheckpoint(eager = true)
      Scratch.register(raw)
      raw
    }
    val freq = pars.groupBy("h").agg(count(lit(1)).as("freq"))
    pars.join(freq, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paragraphs"),
        sum(when(col("freq") > 1, 1L).otherwise(0L)).as("n_dup_paragraphs"))
      .select(col("doc_id"), col("n_paragraphs"), col("n_dup_paragraphs"),
        floor(lit(1000) * col("n_dup_paragraphs") / col("n_paragraphs"))
          .cast("long").as("dup_permille"))
  }

  /** BPE-ish token count: letter runs, digit runs, single symbols. */
  def bpeishCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpeish"))

  /** Text cleaning: Unicode NFC normalization (composed/decomposed
    * accents unify — the pre-hash step that keeps dedup from treating
    * `é` and `e`+combining-acute as different documents), control /
    * format character strip (`\p{Cc}\p{Cf}`, newline and tab first
    * folded to spaces so words stay separated), whitespace collapse,
    * trim. One narrow per-row pass; regex classes chosen for identical
    * semantics in Java regex and RE2 (the DuckDB twin).
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nfc = org.apache.spark.sql.graft.GraftInternal.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(textCol)))
    docs.select(
      col("doc_id"),
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(nfc, "[\\t\\n\\r]", " "),
          "[\\p{Cc}\\p{Cf}]", ""),
        " +", " ")).as("text_norm"))
  }

  /** REAL byte-level BPE token count ([[BpeModel]]'s embedded,
    * deterministically-trained merge table; [[bpeishCount]] remains the
    * regex approximation for comparison). Narrow per-row codegen pass —
    * the count column that feeds sequence packing and token-budget
    * selection when BPE-accurate budgets matter.
    */
  def bpeCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      org.apache.spark.sql.graft.GraftInternal.column(
        graft.functions.BpeCount(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(textCol)))
        .as("n_bpe"))

  /** Content fingerprint: min-md5 over 3-word shingles (a 1-permutation
    * MinHash) — robust to reordering-free small edits. Explode + min-agg
    * so each shingle is hashed exactly once.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val sh = shingles(tokens(col("text")), 3)
    TextOps.spread(docs).select(col("doc_id"), explode(sh).as("s"))
      .groupBy("doc_id")
      .agg(min(md5(col("s"))).as("fingerprint"))
  }

  /** Per-source corpus stats — the domain-level view a pipeline uses for
    * contamination checks and sampling budgets: document count, total
    * tokens (exact), mean document length in permille precision. One
    * partial-aggregated groupBy on `source`.
    */
  def sourceStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        floor(lit(1000) * sum(col("n_tok")) / count(lit(1)))
          .cast("long").as("mean_tokens_permille"))

  /** Repetition ratio: distinct 3-word shingles over total shingles, in
    * permille — low values flag boilerplate/looping text (the standard
    * repetition filter in corpus-quality pipelines). Explode + two-phase
    * count/count-distinct groupBy: the per-row array formulation
    * recomputes the shingle array once per use site (CollapseProject),
    * while here each shingle materializes exactly once and the shuffle
    * carries narrow (doc_id, shingle) rows with map-side combine.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val sh = shingles(tokens(col("text")), 3)
    TextOps.spread(docs)
      .select(col("doc_id"), explode(sh).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("s")).as("n_distinct"))
      .select(col("doc_id"),
        col("n_shingles").cast("long").as("n_shingles"),
        col("n_distinct").cast("long").as("n_distinct"),
        floor(lit(1000) * col("n_distinct") / col("n_shingles"))
          .cast("long").as("distinct_permille"))
  }

  /** PII patterns kept to the regex subset Java and RE2 agree on (no
    * lookaround, ASCII word boundaries) so counts and redactions are
    * engine-reproducible.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII detection + redaction — the scrub pass every training-data
    * pipeline runs before release: per-doc counts of emails / IPv4s /
    * phone numbers and the text with each occurrence replaced by a typed
    * placeholder. Pure per-row codegen'd regex work, no shuffle; the
    * redacted text is emitted as an md5 + length so downstream audits
    * compare content without shipping it.
    */
  def piiScrub(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(redacted).as("redacted_md5"),
      length(redacted).cast("long").as("redacted_len"))
  }
}

/** Corpus shaping between a cleaned dataset and a training run:
  * fixed-window chunking and token-budget sequence packing
  * (SURVEY §2.8 north-star surface).
  */
object Chunking {
  import org.apache.spark.sql.expressions.Window

  /** Content-defined chunking (rolling-hash boundaries, the CDC analog
    * of fixed windows): a token ENDS its chunk when its 31-bit md5 hash
    * is ≡ 0 (mod `avgTokens`) — so chunk boundaries depend only on
    * CONTENT, and an insertion near the head of a document re-chunks
    * O(1) chunks instead of shifting every downstream window (the
    * property that makes near-dup detection and incremental re-chunking
    * stable at 100 TB). Expected chunk length is `avgTokens` tokens.
    *
    * Scale: one narrow explode + one window keyed on the doc id + one
    * grouped re-assembly — shuffles carry (doc_id, pos, token) rows,
    * never corpus×corpus.
    */
  def chunkByContent(
      docs: DataFrame,
      avgTokens: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(avgTokens > 0, "avgTokens must be positive")
    val ex = TextOps.spread(docs)
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("bd",
        when(TextOps.hash31(col("tok")) % avgTokens === 0, 1L).otherwise(0L))
    // chunk id = boundaries strictly BEFORE this token (a boundary token
    // is the last of its chunk)
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    ex.withColumn("chunk_id", coalesce(sum(col("bd")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("chunk"),
        count(lit(1)).as("n_tokens"))
  }

  /** Fixed-size character windows with `overlap` carried between
    * consecutive windows; one output row per (doc, window), `chunk_id`
    * numbered from 0, last window may be short, and an empty document
    * still yields its single empty chunk so no doc silently disappears.
    *
    * Scale: a pure narrow explode — no shuffle, no state; at 100 TB it
    * runs entirely map-side and pipelines into the next stage.
    */
  def chunk(
      docs: DataFrame,
      chunkLen: Int,
      overlap: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkLen > 0, "chunkLen must be positive")
    require(overlap >= 0 && overlap < chunkLen,
      s"overlap must be in [0, chunkLen); got $overlap for chunkLen $chunkLen")
    val step = chunkLen - overlap
    val txt = coalesce(col(textCol), lit(""))
    val starts = sequence(lit(0), greatest(length(txt) - 1, lit(0)), lit(step))
    docs.select(col(idCol), txt.as("__graft_text"),
        posexplode(starts).as(Seq("pos", "start")))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("__graft_text").substr(col("start") + 1, lit(chunkLen)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Sliding TOKEN windows with `overlap` tokens carried between
    * consecutive windows — the embedding-pipeline chunker (models
    * budget tokens, not characters; overlap preserves context across
    * boundaries). One row per (doc, window), `chunk_id` from 0, last
    * window may be short, empty docs keep their single empty chunk.
    * A window is emitted only when it contributes tokens BEYOND the
    * carried overlap (start bound `len − overlap − 1`, not `len − 1`) —
    * otherwise a doc whose length lands in the overlap region would end
    * with a chunk fully contained in the previous one, a duplicate
    * embedding downstream. Same narrow shuffle-free explode shape as
    * [[chunk]].
    */
  def chunkTokens(
      docs: DataFrame,
      chunkTokens: Int,
      overlap: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens); got $overlap for $chunkTokens")
    val step = chunkTokens - overlap
    val toks = TextOps.tokens(coalesce(col(textCol), lit("")))
    val starts = sequence(lit(0),
      greatest(size(col("__toks")) - lit(overlap) - 1, lit(0)), lit(step))
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(starts).as(Seq("pos", "s")))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_id"),
        array_join(
          slice(col("__toks"), col("s") + 1, lit(chunkTokens)), " ").as("chunk"),
        size(slice(col("__toks"), col("s") + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"))
  }

  /** Contiguous sequence packing: documents are concatenated in
    * deterministic (shard, id) order and split into training sequences
    * of at most `budget` whitespace tokens — `seq_id` is the running
    * token count's bin. A document longer than the budget spans
    * sequences (chunk first if that matters).
    *
    * Scale: the order-dependent prefix sum is confined to
    * `numShards` hash shards ([[Sampling.hashBucket]] — md5, engine
    * and partitioning independent), so the sort+window shuffles
    * shard-local slices instead of imposing one global total order;
    * shards pack (and later read) independently and in parallel.
    */
  def packSequences(
      docs: DataFrame,
      budget: Int,
      numShards: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val base = docs.select(
      col(idCol),
      Sampling.hashBucket(col(idCol), numShards).as("shard"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        floor(col("tok_before") / budget).cast("long").as("seq_id"))
  }
}
