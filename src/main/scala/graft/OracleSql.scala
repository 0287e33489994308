package graft

import scala.collection.immutable.ListMap

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]].
  *
  * Mirrors the Spark plans in exact integer arithmetic (see the
  * output-type discipline note on [[SparkEntry]]); the text/similarity
  * oracles recompute md5-based MinHash/SimHash and the sequential-fold dot
  * product so values are bit-identical across engines.
  */
object OracleSql {

  private def cents(x: String) = s"CAST(round(($x) * 100) AS BIGINT)"

  private val priceC = cents("l_extendedprice")
  private val discC = cents("l_discount")
  private val taxC = cents("l_tax")

  // DuckDB list comprehension of whitespace tokens / 3-word shingles
  private val TOKS = """regexp_split_to_array(lower(trim(text)), '\s+')"""
  private val DOCS_TOKS = s"SELECT doc_id, $TOKS AS toks FROM documents"

  /** BPE twin: the merge table is rendered from the SAME
    * [[graft.ext.BpeModel]] the Spark kernel bakes in. Final states are
    * the rows that reached rank NumMerges+1.
    */
  private lazy val bpeCountSql: String = {
    val mergeValues = graft.ext.BpeModel.merges.zipWithIndex.map {
      case ((l, r), i) => s"(${i + 1}, ' $l $r ', ' $l$r ')"
    }.mkString(", ")
    val endRank = graft.ext.BpeModel.merges.length + 1
    s"""WITH RECURSIVE
        dw AS (SELECT doc_id, unnest(toks) AS w FROM ($DOCS_TOKS)),
        words AS (SELECT DISTINCT w FROM dw WHERE w <> ''),
        m(rank, pat, rep) AS (VALUES $mergeValues),
        enc(w, sym, rank) AS (
          SELECT w,
                 ' ' || trim(regexp_replace(hex(encode(w)), '(..)', '\\1 ', 'g')) || ' ',
                 1
          FROM words
          UNION ALL
          SELECT e.w,
                 CASE WHEN position(m.pat IN e.sym) > 0
                      THEN substr(e.sym, 1, position(m.pat IN e.sym) - 1) || m.rep ||
                           substr(e.sym, position(m.pat IN e.sym) + length(m.pat))
                      ELSE e.sym END,
                 CASE WHEN position(m.pat IN e.sym) > 0 THEN e.rank ELSE e.rank + 1 END
          FROM enc e JOIN m ON m.rank = e.rank
        ),
        wc AS (SELECT w, len(string_split(trim(sym), ' ')) AS n
               FROM enc WHERE rank = $endRank)
        SELECT d.doc_id, CAST(COALESCE(SUM(wc.n), 0) AS BIGINT) AS n_bpe
        FROM documents d
        LEFT JOIN dw ON dw.doc_id = d.doc_id AND dw.w <> ''
        LEFT JOIN wc ON wc.w = dw.w
        GROUP BY d.doc_id"""
  }
  private val SHINGLES =
    """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       ELSE [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]
       END"""

  /** Sequential-fold dot product in double (matches Spark's
    * `aggregate(zip_with(...))` fold order).
    */
  private def dot(a: String, b: String) =
    s"list_sum([($a[i]::DOUBLE) * ($b[i]::DOUBLE) for i in range(1, len($a)+1)])"

  private def simE6(a: String, b: String) =
    s"CAST(round((${dot(a, b)}) / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) * 1000000) AS BIGINT)"

  /** Micro-rounded L2 distance via the dot expansion — mirrors
    * `Similarity.distE6`'s `(⟨a,a⟩ − 2·⟨a,b⟩) + ⟨b,b⟩` op order exactly
    * (three shared folds, symbolic 2.0, round on the positive value),
    * including the clamp-to-0 before the sqrt (near-duplicate vectors
    * can round the expansion a hair negative; DuckDB's sqrt ERRORS on
    * negatives where Spark yields NaN).
    */
  private def distE6(a: String, b: String) =
    s"CAST(round(sqrt(greatest((${dot(a, a)}) - 2.0 * (${dot(a, b)}) + (${dot(b, b)}), 0.0)) * 1000000) AS BIGINT)"

  private def dotE6(a: String, b: String) =
    s"CAST(round((${dot(a, b)}) * 1000000) AS BIGINT)"

  /** Shared MinHash CTE chain (16 perms, 4 rows/band) over `docsToks`
    * (a `SELECT doc_id, ... AS toks` source), ending in a `bands`
    * relation — reused by the LSH pair query, the LSH-first Jaccard
    * verify, and the capped-pairs fixture.
    */
  private def minhashCtesFrom(docsToks: String): String = {
    val perms = 16
    val rowsPerBand = 4
    val P = graft.ext.TextOps.MersennePrime31
    val params = graft.ext.TextOps.minhashParams(perms)
    val sig = params.zipWithIndex
      .map { case ((a, b), p) => s"min(($a * h31 + $b) % $P) AS mh$p" }
      .mkString(", ")
    val bands = (0 until perms / rowsPerBand).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => s"mh${b * rowsPerBand + r}::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band_id, md5($key) AS band_key FROM sig"
    }.mkString(" UNION ALL ")
    s"""d AS ($docsToks),
        shd AS (SELECT doc_id, $SHINGLES AS sh FROM d),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shd),
        hh AS (SELECT doc_id,
                      (('0x' || substring(md5(s), 1, 15))::BIGINT & 2147483647) AS h31
               FROM ex),
        sig AS (SELECT doc_id, $sig FROM hh GROUP BY doc_id),
        bands AS ($bands)"""
  }

  private val minhashCtes: String = minhashCtesFrom(DOCS_TOKS)

  /** Extra CTEs + pair join over the band relation, modeling
    * `Dedup.minhashPairs`'s DEFAULT hot-band cap (maxDocsPerBand=500)
    * exactly: bands with more than 500 member docs are dropped before
    * the self-join, in Spark AND here — so every oracle built on the
    * pair feed (LSH pairs, Jaccard verify, clusters, survivors) stays
    * semantics-identical at any corpus degeneracy, not just when no
    * band happens to exceed the cap.
    */
  private val minhashKeptCtes =
    """, mhfreq AS (SELECT band_id, band_key, count(*) AS c
                    FROM bands GROUP BY band_id, band_key),
        mhkept AS (SELECT b.doc_id, b.band_id, b.band_key
                   FROM bands b JOIN mhfreq f
                     ON b.band_id = f.band_id AND b.band_key = f.band_key
                   WHERE f.c <= 500)"""

  private val minhashPairsSelect =
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM mhkept a JOIN mhkept b
         ON a.band_id = b.band_id AND a.band_key = b.band_key
        AND a.doc_id < b.doc_id"""

  private val minhashSql: String =
    s"WITH $minhashCtes$minhashKeptCtes $minhashPairsSelect"

  /** Boilerplate text shared by every 5th document in the hot-band-cap
    * fixture — kept in lockstep with `SparkEntry.qMinhashCappedPairs`,
    * which references this constant.
    */
  val CappedBoilerplate: String =
    "the quick brown fox jumps over the lazy dog again and again today"

  /** Capped LSH pairs over the duplicate-heavy fixture: bands with more
    * than 50 member docs are dropped before the pair join, modeling
    * `Dedup.minhashPairs(maxDocsPerBand = 50)` exactly.
    */
  private val minhashCappedSql: String = {
    val fixture = "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN '" +
      CappedBoilerplate + "' ELSE text END AS text FROM documents"
    s"""WITH ${minhashCtesFrom(s"SELECT doc_id, $TOKS AS toks FROM ($fixture)")},
        freq AS (SELECT band_id, band_key, count(*) AS c
                 FROM bands GROUP BY band_id, band_key),
        kept AS (SELECT b.doc_id, b.band_id, b.band_key
                 FROM bands b JOIN freq f
                   ON b.band_id = f.band_id AND b.band_key = f.band_key
                 WHERE f.c <= 50)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id"""
  }

  private val simhashSql: String = {
    val bits = (0 until 64).map { b =>
      val pos = b / 4 + 1
      val shift = b % 4
      s"""CASE WHEN list_sum([CASE WHEN (((strpos('0123456789abcdef', substring(x, $pos, 1)) - 1) >> $shift) & 1) = 1 THEN 1 ELSE -1 END for x in hs]) > 0 THEN '1' ELSE '0' END"""
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, list_distinct($TOKS) AS toks FROM documents),
        h AS (SELECT doc_id, [md5(x) for x in toks] AS hs FROM d)
        SELECT doc_id, concat($bits) AS simhash FROM h"""
  }

  private val mergeCte =
    """WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                  FROM orders WHERE o_orderkey % 4 <> 0),
            s AS (SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
                         o_totalprice + 1 AS o_totalprice
                  FROM orders WHERE o_orderkey % 2 = 0)"""

  private val knnBruteSql = {
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 32),
        c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
        scored AS (SELECT q_id, n_id, ${simE6("q_vec", "n_vec")} AS sim_e6
                   FROM q, c WHERE n_id <> q_id),
        ranked AS (SELECT q_id, n_id, sim_e6,
                          row_number() OVER (PARTITION BY q_id ORDER BY sim_e6 DESC, n_id) AS "rank"
                   FROM scored)
        SELECT q_id, n_id, "rank", sim_e6 FROM ranked WHERE "rank" <= 5"""
  }

  /** Shared hybrid-RRF twin (mirrors `Retrieval.hybridRrfTopK[Ivf]`'s op
    * order exactly): BM25 candidates for terms spark/query/merge with
    * query doc 7 excluded from the candidate lists ONLY (corpus stats
    * still count it), fused with the dense list `vecScored` (a
    * `SELECT ... doc_id, sim_e6` body, optionally preceded by
    * `extraCtes`). Both lists bounded at 100 BEFORE ranking, k = 10,
    * kRrf = 60; each reciprocal term is e9-micro-rounded individually
    * so the fused score is an exact 2-term bigint sum.
    */
  private def hybridRrfSql(extraCtes: String, vecScored: String): String =
    s"""WITH $extraCtes
        d AS ($DOCS_TOKS),
        hbase AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
        hstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(dl) AS BIGINT) AS total_tokens FROM hbase),
        hqt AS (SELECT unnest(['spark', 'query', 'merge']) AS term),
        hdfs AS (SELECT t.term, CAST(count(*) AS BIGINT) AS df
                 FROM hbase b, hqt t
                 WHERE list_contains(b.toks, t.term) GROUP BY t.term),
        htf AS (SELECT b.doc_id, b.dl, t.term,
                       CAST(len(list_filter(b.toks, x -> x = t.term)) AS BIGINT) AS tf
                FROM hbase b, hqt t WHERE list_contains(b.toks, t.term)),
        hp AS (SELECT htf.doc_id,
                      CAST(floor(
                        ln((s.n_docs::DOUBLE - hdfs.df + 0.5) / (hdfs.df + 0.5) + 1.0)
                        * (htf.tf::DOUBLE * (1.2 + 1.0))
                        / (htf.tf::DOUBLE + 1.2 * (1.0 - 0.75
                            + 0.75 * htf.dl / (s.total_tokens::DOUBLE / s.n_docs)))
                        * 1000000 + 0.5) AS BIGINT) AS score_term_e6
               FROM htf JOIN hdfs ON hdfs.term = htf.term, hstats s),
        lexall AS (SELECT doc_id, CAST(sum(score_term_e6) AS BIGINT) AS score_e6
                   FROM hp WHERE doc_id <> 7 GROUP BY doc_id),
        lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS r_lex
                FROM (SELECT * FROM lexall ORDER BY score_e6 DESC, doc_id LIMIT 100)),
        vecsc AS ($vecScored),
        vec AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY sim_e6 DESC, doc_id) AS BIGINT) AS r_vec
                FROM (SELECT * FROM vecsc ORDER BY sim_e6 DESC, doc_id LIMIT 100)),
        fused AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, r_lex, r_vec,
                         COALESCE(CAST(floor(1000000000.0 / (60 + r_lex) + 0.5) AS BIGINT), 0)
                         + COALESCE(CAST(floor(1000000000.0 / (60 + r_vec) + 0.5) AS BIGINT), 0) AS rrf_e9
                  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
        fusedtop AS (SELECT * FROM fused ORDER BY rrf_e9 DESC, doc_id LIMIT 10)
        SELECT doc_id, r_lex, r_vec, rrf_e9,
               CAST(row_number() OVER (ORDER BY rrf_e9 DESC, doc_id) AS BIGINT) AS "rank"
        FROM fusedtop"""

  private val knnBruteL2Sql = {
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 32),
        c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
        scored AS (SELECT q_id, n_id, ${distE6("q_vec", "n_vec")} AS dist_e6
                   FROM q, c WHERE n_id <> q_id),
        ranked AS (SELECT q_id, n_id, dist_e6,
                          row_number() OVER (PARTITION BY q_id ORDER BY dist_e6 ASC, n_id) AS "rank"
                   FROM scored)
        SELECT q_id, n_id, "rank", dist_e6 FROM ranked WHERE "rank" <= 5"""
  }

  private val knnBruteDotSql = {
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 32),
        c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
        scored AS (SELECT q_id, n_id, ${dotE6("q_vec", "n_vec")} AS sim_e6
                   FROM q, c WHERE n_id <> q_id),
        ranked AS (SELECT q_id, n_id, sim_e6,
                          row_number() OVER (PARTITION BY q_id ORDER BY sim_e6 DESC, n_id) AS "rank"
                   FROM scored)
        SELECT q_id, n_id, "rank", sim_e6 FROM ranked WHERE "rank" <= 5"""
  }

  /** Fixed-k centroid stride (mirrors Similarity.centroidsK: k=32,
    * stride = ceil(n/k) -- centroid count independent of corpus size). */
  private val centStride =
    "(SELECT GREATEST(1, CAST(ceil(count(*) / 32.0) AS BIGINT)) FROM embeddings)"

  /** Auto-k centroid stride (mirrors cosineDupPairs' default policy:
    * k = max(32, ceil(sqrt(n))), stride = ceil(n/k)). */
  private val autoCentStride =
    """(SELECT GREATEST(1, CAST(ceil(count(*) /
       GREATEST(32.0, ceil(sqrt(count(*))))) AS BIGINT)) FROM embeddings)"""

  /** Oracle for IVF over k-means-refined centroids: replays the 2 Lloyd
    * iterations exactly — assignment by rounded cosine argmax, new
    * centroids as fixed-point elementwise means cast to float.
    */
  /** PQ twins: stride-seeded codebooks (16 sub-centroids), m=16 subspaces
    * of 4 elements over the dim-64 embeddings. Distances use the dot
    * expansion ‖x‖² − 2⟨x,c⟩ + ‖c‖² with the same sequential folds as
    * the Spark side, micro-rounded, idx tie-break.
    */
  private val pqStride16 =
    "(SELECT GREATEST(1, CAST(ceil(count(*) / 16.0) AS BIGINT)) FROM embeddings)"

  /** Quality-classifier weights rendered as a VALUES list — from the
    * SAME trained [[graft.ext.QualityModel]] the Spark kernel bakes in.
    */
  private lazy val qualityWeightValues: String =
    graft.ext.QualityModel.nonZeroWeights
      .map { case (b, w) => s"($b, $w)" }.mkString(", ")

  /** Language-ID trigram profiles rendered as a VALUES list — computed
    * from the SAME [[graft.ext.LangProfiles]] the Spark kernel uses, so
    * the two sides can never drift. Trigrams are a–z/space only (the
    * shared normalization guarantees it), safe to single-quote.
    */
  private val langProfileValues: String =
    graft.ext.LangProfiles.langs.flatMap { l =>
      graft.ext.LangProfiles.profileOf(
        graft.ext.LangProfiles.seedTexts.toMap.apply(l))
        .map { case (tg, w) => s"('$l', '$tg', $w)" }
    }.mkString(", ")

  private def pqD2(x: String, c: String) =
    s"CAST(round((${dot(x, x)} - 2*${dot(x, c)} + ${dot(c, c)}) * 1000000) AS BIGINT)"

  /** Coarse-Lloyd CTE builders shared by every k-means oracle twin:
    * assignment by rounded-metric argmax (cosine for the L2 family,
    * raw dot for MIPS — the ONLY difference between the training
    * loops), recompute as the fixed-point elementwise mean cast to
    * float (empty cells drop — mirrors [[Similarity.kmeansCentroids]]).
    * One copy, or the VecSumE6 replay arithmetic could silently drift
    * between twins.
    */
  private def lloydAssignCte(
      centCte: String, name: String, byDot: Boolean): String = {
    val score =
      if (byDot) dotE6("e.embedding", "c.c_vec")
      else simE6("e.embedding", "c.c_vec")
    s"""$name AS (SELECT vec_id, embedding, c_id AS cell FROM
          (SELECT e.vec_id, e.embedding, c.c_id,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY $score DESC, c.c_id) AS rn
           FROM embeddings e, $centCte c) WHERE rn = 1)"""
  }

  private def lloydRecomputeCte(assignCte: String, name: String): String =
    s"""${name}_s AS (SELECT cell, i,
            CAST(sum(CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS s,
            count(*) AS n
          FROM $assignCte, UNNEST(range(1, len(embedding) + 1)) AS t(i)
          GROUP BY cell, i),
        $name AS (SELECT cell AS c_id,
            list(CAST(CAST(s AS DOUBLE) / 1000000.0 / n AS FLOAT) ORDER BY i) AS c_vec
          FROM ${name}_s GROUP BY cell)"""

  /** Two coarse-Lloyd passes over `embeddings` from the stride seeds
    * (`c0` → `af`), metric-parameterized.
    */
  private def lloydTwoPassCtes(byDot: Boolean): String =
    s"""c0 AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $centStride = 0),
        ${lloydAssignCte("c0", "a1", byDot)},
        ${lloydRecomputeCte("a1", "c1")},
        ${lloydAssignCte("c1", "a2", byDot)},
        ${lloydRecomputeCte("a2", "c2")},
        ${lloydAssignCte("c2", "af", byDot)}"""

  private val pqCtes: String = {
    val xs = "e.embedding[js.j*4+1:js.j*4+4]"
    val cs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
                      embedding AS c_vec
               FROM embeddings WHERE vec_id % $pqStride16 = 0),
        js AS (SELECT unnest(range(0, 16)) AS j),
        codes AS (SELECT vec_id, j, idx AS code FROM (
          SELECT e.vec_id, js.j, c.idx,
                 row_number() OVER (PARTITION BY e.vec_id, js.j
                   ORDER BY ${pqD2(xs, cs)}, c.idx) AS rn
          FROM embeddings e, js, cb c) WHERE rn = 1)"""
  }

  private val pqCodesSql: String =
    s"""WITH $pqCtes
        SELECT vec_id, CAST(j AS BIGINT) AS j, CAST(code AS BIGINT) AS code
        FROM codes"""

  /** K-means PQ twins: codebooks are represented per-(subspace, idx)
    * SUBVECTOR throughout; two Lloyd iterations replayed exactly —
    * assignment by micro-rounded squared-L2 argmin (idx tie-break),
    * new sub-centroids as fixed-point elementwise means cast to float,
    * empty codes keeping their previous sub-centroid.
    */
  private val pqKmeansCtes: String = {
    def assign(cb: String, name: String) =
      s"""$name AS (SELECT vec_id, j, idx AS code FROM (
            SELECT es.vec_id, es.j, c.idx,
                   row_number() OVER (PARTITION BY es.vec_id, es.j
                     ORDER BY ${pqD2("es.sub", "c.sub")}, c.idx) AS rn
            FROM es, $cb c WHERE c.j = es.j) WHERE rn = 1)"""
    def recompute(codes: String, prev: String, name: String) =
      s"""${name}_s AS (SELECT co.j, co.code, t.i,
              CAST(sum(CAST(round(es2.sub[t.i]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS s,
              count(*) AS n
            FROM $codes co JOIN es es2 ON es2.vec_id = co.vec_id AND es2.j = co.j,
                 UNNEST(range(1, 5)) AS t(i)
            GROUP BY co.j, co.code, t.i),
          ${name}_m AS (SELECT j, code AS idx,
              list(CAST(CAST(s AS DOUBLE) / 1000000.0 / n AS FLOAT) ORDER BY i) AS sub
            FROM ${name}_s GROUP BY j, code),
          $name AS (SELECT * FROM ${name}_m
            UNION ALL
            SELECT p.j, p.idx, p.sub FROM $prev p
            WHERE NOT EXISTS (SELECT 1 FROM ${name}_m x
                              WHERE x.j = p.j AND x.idx = p.idx))"""
    s"""js AS (SELECT unnest(range(0, 16)) AS j),
        es AS (SELECT e.vec_id, js.j, e.embedding[js.j*4+1:js.j*4+4] AS sub
               FROM embeddings e, js),
        cb0 AS (SELECT js.j, c.idx, c.c_vec[js.j*4+1:js.j*4+4] AS sub
                FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
                             embedding AS c_vec
                      FROM embeddings WHERE vec_id % $pqStride16 = 0) c, js),
        ${assign("cb0", "k0")},
        ${recompute("k0", "cb0", "cb1")},
        ${assign("cb1", "k1")},
        ${recompute("k1", "cb1", "cb2")},
        ${assign("cb2", "codes_km")}"""
  }

  private val pqCodesKmeansSql: String =
    s"""WITH $pqKmeansCtes
        SELECT vec_id, CAST(j AS BIGINT) AS j, CAST(code AS BIGINT) AS code
        FROM codes_km"""

  private val knnPqAdcKmeansSql: String =
    s"""WITH $pqKmeansCtes,
        q AS (SELECT e.vec_id AS q_id, js.j,
                     e.embedding[js.j*4+1:js.j*4+4] AS sub
              FROM embeddings e, js WHERE e.vec_id < 32),
        dtab AS (SELECT q.q_id, q.j, c.idx, ${pqD2("q.sub", "c.sub")} AS d
                 FROM q JOIN cb2 c ON c.j = q.j),
        sc AS (SELECT d.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS adist_e6
               FROM codes_km co JOIN dtab d ON d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> d.q_id
               GROUP BY d.q_id, co.vec_id),
        ranked AS (SELECT q_id, n_id, adist_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adist_e6, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", adist_e6 FROM ranked WHERE "rank" <= 5"""

  /** Shared WITH-body of the FLAT MIPS twins (no cell confinement),
    * ending at `sc` = per-(q, n) summed inner-product tables: same
    * codes as [[knnPqAdcSql]] (L2 argmin), per-subspace DOT tables.
    */
  private val knnPqIpScCtes: String = {
    val qx = "q.q_vec[js.j*4+1:js.j*4+4]"
    val cs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""WITH $pqCtes,
        q AS (SELECT vec_id AS q_id, embedding AS q_vec
              FROM embeddings WHERE vec_id < 32),
        dtab AS (SELECT q.q_id, js.j, c.idx,
                        CAST(round((${dot(qx, cs)}) * 1000000) AS BIGINT) AS d
                 FROM q, js, cb c),
        sc AS (SELECT d.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS asim_e6
               FROM codes co JOIN dtab d ON d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> d.q_id
               GROUP BY d.q_id, co.vec_id)"""
  }

  /** Maximum-inner-product twin of [[knnPqAdcSql]]: ranking DESC on the
    * summed dot table (ties by n_id).
    */
  private val knnPqAdcIpSql: String =
    s"""$knnPqIpScCtes,
        ranked AS (SELECT q_id, n_id, asim_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY asim_e6 DESC, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", asim_e6 FROM ranked WHERE "rank" <= 5"""

  /** Flat two-stage MIPS twin: IP-ADC shortlist of 4·k = 20 per query
    * over the WHOLE corpus (no cells), exact rounded-dot rerank.
    */
  private val knnPqIpRerankSql: String =
    s"""$knnPqIpScCtes,
        slranked AS (SELECT q_id, n_id,
                            row_number() OVER (PARTITION BY q_id
                              ORDER BY asim_e6 DESC, n_id) AS rn
                     FROM sc),
        sl AS (SELECT q_id, n_id FROM slranked WHERE rn <= 20),
        ex AS (SELECT sl.q_id, sl.n_id,
                      ${dotE6("qe.embedding", "ne.embedding")} AS sim_e6
               FROM sl JOIN embeddings qe ON qe.vec_id = sl.q_id
                       JOIN embeddings ne ON ne.vec_id = sl.n_id),
        rr AS (SELECT q_id, n_id, sim_e6,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY sim_e6 DESC, n_id) AS "rank"
               FROM ex)
        SELECT q_id, n_id, "rank", sim_e6 FROM rr WHERE "rank" <= 5"""

  /** Shared WITH-body of the IVF-IP (MIPS) twins, ending at `sc` =
    * per-(q, n) summed inner-product tables within the query's cell:
    * coarse assignment by rounded-DOT argmax (not cosine), raw-vector
    * PQ codes (shared [[pqCtes]] — no residuals), per-query dot tables
    * restricted to the query's own cell. The plain search ranks `sc`
    * DESC directly; the rerank twin shortlists it then exact-dot
    * reranks.
    */
  private val knnIvfIpScCtes: String = {
    val qx = "q.q_vec[js.j*4+1:js.j*4+4]"
    val cs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""WITH $pqCtes,
        cent AS (SELECT vec_id AS c_id, embedding AS c_vec
                 FROM embeddings WHERE vec_id % $centStride = 0),
        scoredA AS (SELECT e.vec_id, e.embedding, c_id,
                           ${dotE6("e.embedding", "c_vec")} AS c_dot
                    FROM embeddings e, cent),
        assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY c_dot DESC, c_id) AS rn
                      FROM scoredA) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, cell
              FROM assign WHERE vec_id < 32),
        dtab AS (SELECT q.q_id, js.j, c.idx,
                        CAST(round((${dot(qx, cs)}) * 1000000) AS BIGINT) AS d
                 FROM q, js, cb c),
        sc AS (SELECT q.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS asim_e6
               FROM q JOIN assign a2 ON a2.cell = q.cell
                    JOIN codes co ON co.vec_id = a2.vec_id
                    JOIN dtab d ON d.q_id = q.q_id
                     AND d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> q.q_id
               GROUP BY q.q_id, co.vec_id)"""
  }

  private val knnIvfIpSql: String =
    s"""$knnIvfIpScCtes,
        ranked AS (SELECT q_id, n_id, asim_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY asim_e6 DESC, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", asim_e6 FROM ranked WHERE "rank" <= 5"""

  /** Filtered-MIPS twin: same full-corpus IP index CTEs, candidates
    * restricted to label-0 vectors before ranking (filtering the scored
    * pairs ≡ filtering candidates — scores are per-pair).
    */
  private val knnIvfIpFilteredSql: String =
    s"""$knnIvfIpScCtes,
        fsc AS (SELECT sc.q_id, sc.n_id, sc.asim_e6
                FROM sc JOIN embeddings el ON el.vec_id = sc.n_id
                WHERE el.label = 0),
        ranked AS (SELECT q_id, n_id, asim_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY asim_e6 DESC, n_id) AS "rank"
                   FROM fsc)
        SELECT q_id, n_id, "rank", asim_e6 FROM ranked WHERE "rank" <= 5"""

  /** Two-stage MIPS twin: inner-product ADC shortlist of 4·k = 20 per
    * query (same ranking as the plain IVF-IP oracle), then EXACT
    * rounded dot over the shortlisted pairs' full vectors decides the
    * final top-5 (DESC, id tie-break).
    */
  private val knnIpRerankSql: String =
    s"""$knnIvfIpScCtes,
        slranked AS (SELECT q_id, n_id,
                            row_number() OVER (PARTITION BY q_id
                              ORDER BY asim_e6 DESC, n_id) AS rn
                     FROM sc),
        sl AS (SELECT q_id, n_id FROM slranked WHERE rn <= 20),
        ex AS (SELECT sl.q_id, sl.n_id,
                      ${dotE6("qe.embedding", "ne.embedding")} AS sim_e6
               FROM sl JOIN embeddings qe ON qe.vec_id = sl.q_id
                       JOIN embeddings ne ON ne.vec_id = sl.n_id),
        rr AS (SELECT q_id, n_id, sim_e6,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY sim_e6 DESC, n_id) AS "rank"
               FROM ex)
        SELECT q_id, n_id, "rank", sim_e6 FROM rr WHERE "rank" <= 5"""

  /** IVF-IP with Lloyd-refined coarse cells: the two k-means passes
    * replayed with DOT-argmax assignment (the inner-product quantizer's
    * loop — same fixed-point mean recompute as the cosine twin), then
    * the SAME raw-vector PQ codes ([[pqCtes]] — no residual stage means
    * coarse refinement never touches the books), per-query dot tables
    * confined to the refined cell, rank DESC.
    */
  private val knnIvfIpKmeansSql: String = {
    val qx = "q.q_vec[js.j*4+1:js.j*4+4]"
    val cs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""WITH $pqCtes,
        ${lloydTwoPassCtes(byDot = true)},
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, cell
              FROM af WHERE vec_id < 32),
        dtab AS (SELECT q.q_id, js.j, c.idx,
                        CAST(round((${dot(qx, cs)}) * 1000000) AS BIGINT) AS d
                 FROM q, js, cb c),
        sc AS (SELECT q.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS asim_e6
               FROM q JOIN af ax ON ax.cell = q.cell
                    JOIN codes co ON co.vec_id = ax.vec_id
                    JOIN dtab d ON d.q_id = q.q_id
                     AND d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> q.q_id
               GROUP BY q.q_id, co.vec_id),
        ranked AS (SELECT q_id, n_id, asim_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY asim_e6 DESC, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", asim_e6 FROM ranked WHERE "rank" <= 5"""
  }

  private val knnPqAdcSql: String = {
    val qx = "q.q_vec[js.j*4+1:js.j*4+4]"
    val cs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""WITH $pqCtes,
        q AS (SELECT vec_id AS q_id, embedding AS q_vec
              FROM embeddings WHERE vec_id < 32),
        dtab AS (SELECT q.q_id, js.j, c.idx, ${pqD2(qx, cs)} AS d
                 FROM q, js, cb c),
        sc AS (SELECT d.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS adist_e6
               FROM codes co JOIN dtab d ON d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> d.q_id
               GROUP BY d.q_id, co.vec_id),
        ranked AS (SELECT q_id, n_id, adist_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adist_e6, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", adist_e6 FROM ranked WHERE "rank" <= 5"""
  }

  /** IVF-PQ residual twin: coarse cells by rounded-cosine argmax (same
    * assignment as knnIvfSql), residual = (v − centroid) per element as
    * the correctly-rounded FLOAT difference, PQ codebooks stride-seeded
    * over the RESIDUALS, codes by micro-rounded squared-L2 argmin, ADC
    * restricted to the query's own cell (nprobe = 1).
    */
  /** Shared WITH-body of the stride-seeded IVF-PQ twins, ending at
    * `sc` = per-(q,n) ADC distances — the plain ADC oracle ranks it
    * directly; the rerank oracle shortlists it then reranks exactly.
    */
  private val knnIvfPqScCtes: String = {
    val rx = "rr.r[js.j*4+1:js.j*4+4]"
    val rcs = "c.c_vec[js.j*4+1:js.j*4+4]"
    s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $centStride = 0),
        scored AS (SELECT e.vec_id, e.embedding, c_id,
                          ${simE6("e.embedding", "c_vec")} AS c_sim
                   FROM embeddings e, cent),
        assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                      FROM scored) WHERE rn = 1),
        resid AS (SELECT a.vec_id, a.cell,
                         list_transform(range(1, len(a.embedding) + 1),
                           i -> (a.embedding[i]::DOUBLE - c.c_vec[i]::DOUBLE)::FLOAT) AS r
                  FROM assign a JOIN cent c ON c.c_id = a.cell),
        rcb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, r AS c_vec
                FROM resid WHERE vec_id % $pqStride16 = 0),
        js AS (SELECT unnest(range(0, 16)) AS j),
        codes AS (SELECT vec_id, cell, j, idx AS code FROM (
          SELECT rr.vec_id, rr.cell, js.j, c.idx,
                 row_number() OVER (PARTITION BY rr.vec_id, js.j
                   ORDER BY ${pqD2(rx, rcs)}, c.idx) AS rn
          FROM resid rr, js, rcb c) WHERE rn = 1),
        q AS (SELECT rr.vec_id AS q_id, rr.cell, js.j, $rx AS sub
              FROM resid rr, js WHERE rr.vec_id < 32),
        dtab AS (SELECT q.q_id, q.cell, q.j, c.idx,
                        ${pqD2("q.sub", "c.c_vec[q.j*4+1:q.j*4+4]")} AS d
                 FROM q, rcb c),
        sc AS (SELECT d.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS adist_e6
               FROM codes co JOIN dtab d
                 ON d.cell = co.cell AND d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> d.q_id
               GROUP BY d.q_id, co.vec_id)"""
  }

  private val knnIvfPqAdcSql: String =
    s"""$knnIvfPqScCtes,
        ranked AS (SELECT q_id, n_id, adist_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adist_e6, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", adist_e6 FROM ranked WHERE "rank" <= 5"""

  /** Filtered-search twin: same full-corpus index CTEs, candidates
    * restricted to label-0 vectors before ranking (filtering the
    * scored pairs ≡ filtering candidates — scores are per-pair).
    */
  private val knnIvfPqFilteredSql: String =
    s"""$knnIvfPqScCtes,
        fsc AS (SELECT sc.q_id, sc.n_id, sc.adist_e6
                FROM sc JOIN embeddings el ON el.vec_id = sc.n_id
                WHERE el.label = 0),
        ranked AS (SELECT q_id, n_id, adist_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adist_e6, n_id) AS "rank"
                   FROM fsc)
        SELECT q_id, n_id, "rank", adist_e6 FROM ranked WHERE "rank" <= 5"""

  /** Two-stage twin: ADC shortlist of 4·k = 20 per query (same ranking
    * as the plain ADC oracle), then EXACT cosine over the shortlisted
    * pairs' full vectors decides the final top-5.
    */
  private val knnIvfPqRerankSql: String =
    s"""$knnIvfPqScCtes,
        slranked AS (SELECT q_id, n_id,
                            row_number() OVER (PARTITION BY q_id
                              ORDER BY adist_e6, n_id) AS rn
                     FROM sc),
        sl AS (SELECT q_id, n_id FROM slranked WHERE rn <= 20),
        ex AS (SELECT sl.q_id, sl.n_id,
                      ${simE6("qe.embedding", "ne.embedding")} AS sim_e6
               FROM sl JOIN embeddings qe ON qe.vec_id = sl.q_id
                       JOIN embeddings ne ON ne.vec_id = sl.n_id),
        rr AS (SELECT q_id, n_id, sim_e6,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY sim_e6 DESC, n_id) AS "rank"
               FROM ex)
        SELECT q_id, n_id, "rank", sim_e6 FROM rr WHERE "rank" <= 5"""

  /** Full-composition twin: k-means coarse cells (2 Lloyd iterations,
    * same CTEs as knnIvfKmeansSql), residuals to the REFINED centroids,
    * per-subspace k-means PQ books over the residuals (same recipe as
    * pqKmeansCtes, parameterized to the residual relation), ADC
    * confined to the query's own cell.
    */
  private val knnIvfPqKmeansSql: String = {
    def pqAssign(cb: String, name: String) =
      s"""$name AS (SELECT vec_id, j, idx AS code FROM (
            SELECT es.vec_id, es.j, c.idx,
                   row_number() OVER (PARTITION BY es.vec_id, es.j
                     ORDER BY ${pqD2("es.sub", "c.sub")}, c.idx) AS rn
            FROM es, $cb c WHERE c.j = es.j) WHERE rn = 1)"""
    def pqRecompute(codes: String, prev: String, name: String) =
      s"""${name}_s AS (SELECT co.j, co.code, t.i,
              CAST(sum(CAST(round(es2.sub[t.i]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS s,
              count(*) AS n
            FROM $codes co JOIN es es2 ON es2.vec_id = co.vec_id AND es2.j = co.j,
                 UNNEST(range(1, 5)) AS t(i)
            GROUP BY co.j, co.code, t.i),
          ${name}_m AS (SELECT j, code AS idx,
              list(CAST(CAST(s AS DOUBLE) / 1000000.0 / n AS FLOAT) ORDER BY i) AS sub
            FROM ${name}_s GROUP BY j, code),
          $name AS (SELECT * FROM ${name}_m
            UNION ALL
            SELECT p.j, p.idx, p.sub FROM $prev p
            WHERE NOT EXISTS (SELECT 1 FROM ${name}_m x
                              WHERE x.j = p.j AND x.idx = p.idx))"""
    s"""WITH ${lloydTwoPassCtes(byDot = false)},
        resid AS (SELECT a.vec_id, a.cell,
                         list_transform(range(1, len(a.embedding) + 1),
                           i -> (a.embedding[i]::DOUBLE - c.c_vec[i]::DOUBLE)::FLOAT) AS r
                  FROM af a JOIN c2 c ON c.c_id = a.cell),
        js AS (SELECT unnest(range(0, 16)) AS j),
        es AS (SELECT rr.vec_id, js.j, rr.r[js.j*4+1:js.j*4+4] AS sub
               FROM resid rr, js),
        cb0 AS (SELECT js.j, c.idx, c.c_vec[js.j*4+1:js.j*4+4] AS sub
                FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
                             r AS c_vec
                      FROM resid WHERE vec_id % $pqStride16 = 0) c, js),
        ${pqAssign("cb0", "k0")},
        ${pqRecompute("k0", "cb0", "cb1")},
        ${pqAssign("cb1", "k1")},
        ${pqRecompute("k1", "cb1", "cb2")},
        ${pqAssign("cb2", "codes_km")},
        codes AS (SELECT k.vec_id, rr.cell, k.j, k.code
                  FROM codes_km k JOIN resid rr ON rr.vec_id = k.vec_id),
        q AS (SELECT es.vec_id AS q_id, rr.cell, es.j, es.sub
              FROM es JOIN resid rr ON rr.vec_id = es.vec_id
              WHERE es.vec_id < 32),
        dtab AS (SELECT q.q_id, q.cell, q.j, c.idx,
                        ${pqD2("q.sub", "c.sub")} AS d
                 FROM q JOIN cb2 c ON c.j = q.j),
        sc AS (SELECT d.q_id, co.vec_id AS n_id,
                      CAST(sum(d.d) AS BIGINT) AS adist_e6
               FROM codes co JOIN dtab d
                 ON d.cell = co.cell AND d.j = co.j AND d.idx = co.code
               WHERE co.vec_id <> d.q_id
               GROUP BY d.q_id, co.vec_id),
        ranked AS (SELECT q_id, n_id, adist_e6,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adist_e6, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", adist_e6 FROM ranked WHERE "rank" <= 5"""
  }

  private val knnIvfKmeansSql: String = {
    s"""WITH ${lloydTwoPassCtes(byDot = false)},
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, cell FROM af WHERE vec_id < 32),
        n AS (SELECT vec_id AS n_id, embedding AS n_vec, cell FROM af),
        sc AS (SELECT q_id, n_id, ${simE6("q_vec", "n_vec")} AS sim_e6
               FROM q JOIN n USING(cell) WHERE n_id <> q_id),
        ranked AS (SELECT q_id, n_id, sim_e6,
                          row_number() OVER (PARTITION BY q_id ORDER BY sim_e6 DESC, n_id) AS "rank"
                   FROM sc)
        SELECT q_id, n_id, "rank", sim_e6 FROM ranked WHERE "rank" <= 5"""
  }

  private val knnIvfSql = {
    s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $centStride = 0),
        scored AS (SELECT e.vec_id, e.embedding, c_id,
                          ${simE6("e.embedding", "c_vec")} AS c_sim
                   FROM embeddings e, cent),
        assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                      FROM scored) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, cell FROM assign WHERE vec_id < 32),
        n AS (SELECT vec_id AS n_id, embedding AS n_vec, cell FROM assign),
        sc2 AS (SELECT q_id, n_id, ${simE6("q_vec", "n_vec")} AS sim_e6
                FROM q JOIN n USING(cell) WHERE n_id <> q_id),
        ranked AS (SELECT q_id, n_id, sim_e6,
                          row_number() OVER (PARTITION BY q_id ORDER BY sim_e6 DESC, n_id) AS "rank"
                   FROM sc2)
        SELECT q_id, n_id, "rank", sim_e6 FROM ranked WHERE "rank" <= 5"""
  }

  private val base: Map[String, String] = ListMap(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
            CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_cents,
            CAST(sum($priceC) AS BIGINT) AS sum_base_cents,
            CAST(sum($priceC * (100 - $discC)) AS BIGINT) AS sum_disc_e4,
            CAST(sum($priceC * (100 - $discC) * (100 + $taxC)) AS BIGINT) AS sum_charge_e6,
            count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY 1, 2""",

    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05""",

    "q03_revenue_by_nation" ->
      s"""SELECT n_name,
            CAST(sum($priceC * (100 - $discC)) AS BIGINT) AS revenue_e4,
            count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY 1""",

    "q04_brand_volume" ->
      s"""SELECT p_brand, count(*) AS n_items,
            CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_cents,
            count(DISTINCT l_suppkey) AS n_suppliers
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1""",

    "q05_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 3""",

    "q06_running_total" ->
      s"""SELECT o_custkey, o_orderkey,
            CAST(sum(${cents("o_totalprice")})
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS running_cents
          FROM orders""",

    "q07_cust_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')""",

    "q08_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         GROUP BY 1""",

    "q09_global_topk" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 20""",

    "q10_distinct_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1""",

    "q11_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
            coalesce(l_linestatus, 'ALL') AS status,
            CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_cents,
            count(*) AS n_rows
          FROM lineitem
          GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q12_set_ops" ->
      """SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0""",

    "q13_events_json" ->
      """SELECT event_id, user_id, event_type,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events""",

    "q14_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep
                    FROM events),
              l AS (SELECT *, lag(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) AS prev FROM e),
              n AS (SELECT *, CASE WHEN prev IS NOT NULL AND ep - prev > 1800 THEN 1 ELSE 0 END AS nw FROM l),
              s AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                    FROM n)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ep) AS start_epoch, max(ep) AS end_epoch,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
         FROM s GROUP BY 1, 2""",

    "q15_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep
                    FROM events),
              l AS (SELECT user_id, event_id, ep FROM e WHERE event_type = 'click'),
              r AS (SELECT user_id, ep, max(event_id) AS purchase_event_id,
                           ep AS purchase_epoch
                    FROM e WHERE event_type = 'purchase' GROUP BY user_id, ep)
         SELECT l.event_id, l.user_id, l.ep AS click_epoch,
                r.purchase_event_id, r.purchase_epoch
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ep >= r.ep""",

    "q16_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
            coalesce(o_orderpriority, 'ALL') AS priority,
            CAST(sum(${cents("o_totalprice")}) AS BIGINT) AS sum_total_cents,
            count(*) AS n_orders
          FROM orders
          GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "q17_scalar_funcs" ->
      s"""SELECT o_orderkey,
            strftime(o_orderdate, '%Y-%m') AS order_month,
            CAST(year(o_orderdate) AS BIGINT) AS order_year,
            CAST(day(o_orderdate) AS BIGINT) AS order_dom,
            o_orderstatus || '#' || o_orderpriority AS tag,
            upper(substring(o_orderpriority, 1, 4)) AS prio4,
            CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
            o_orderkey % 7 AS key_mod7,
            abs(o_orderkey - 1000) AS key_absdiff,
            CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS bucket,
            ${cents("o_totalprice")} AS total_cents
          FROM orders""",

    // HLL sketches are engine-specific, so the oracle checks the
    // accuracy contract: Spark emits per-group within-tolerance booleans
    // (|approx - exact| <= 5% of exact), the twin emits literal trues.
    "q18_approx_distinct" ->
      """SELECT l_returnflag,
                true AS parts_within_tol,
                true AS orders_within_tol
         FROM lineitem GROUP BY l_returnflag""",

    "q22_pivot" -> {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val cols = types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
        .mkString(", ")
      s"SELECT user_id, $cols FROM events GROUP BY 1"
    },

    "q23_quantile_disc" ->
      """WITH ranked AS (
           SELECT o_orderstatus, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
                  count(*) OVER (PARTITION BY o_orderstatus) AS n
           FROM orders)
         SELECT o_orderstatus, 'p50' AS q, min(o_totalprice) AS value
         FROM ranked WHERE rn = CAST(ceil(0.5 * n) AS INT) GROUP BY 1
         UNION ALL
         SELECT o_orderstatus, 'p90' AS q, min(o_totalprice) AS value
         FROM ranked WHERE rn = CAST(ceil(0.9 * n) AS INT) GROUP BY 1""",

    "q20_bucket_join" ->
      s"""SELECT o_custkey, count(*) AS n_items,
            CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_cents
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1""",

    "q21_range_join" ->
      """WITH e AS (SELECT event_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep
                    FROM events)
         SELECT a.event_id AS a_id, b.event_id AS b_id, b.ep - a.ep AS diff
         FROM e a JOIN e b
           ON a.event_id < b.event_id AND abs(a.ep - b.ep) <= 1""",

    "q19_salted_agg" ->
      """SELECT event_type,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
                count(*) AS n_rows
         FROM events GROUP BY 1""",

    "merge_update_only" ->
      s"""$mergeCte
          SELECT t.o_orderkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
          FROM t LEFT JOIN s ON s.o_orderkey = t.o_orderkey""",

    "merge_dedup_insert" ->
      s"""$mergeCte
          SELECT * FROM t
          UNION ALL
          SELECT s.* FROM s
          WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)""",

    "merge_upsert" ->
      s"""$mergeCte,
          u AS (SELECT t.o_orderkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
                FROM t LEFT JOIN s ON s.o_orderkey = t.o_orderkey)
          SELECT * FROM u
          UNION ALL
          SELECT s.* FROM s
          WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)""",

    "merge_schema_evolution" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey % 4 <> 0),
              s AS (SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
                           o_totalprice + 1 AS o_totalprice,
                           'n' || CAST(o_orderkey AS VARCHAR) AS o_note
                    FROM orders WHERE o_orderkey % 2 = 0),
              u AS (SELECT t.o_orderkey,
                     CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
                     CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
                     CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
                     CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_note
                          ELSE CAST(NULL AS VARCHAR) END AS o_note
                    FROM t LEFT JOIN s ON s.o_orderkey = t.o_orderkey)
          SELECT * FROM u
          UNION ALL
          SELECT s.* FROM s
          WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)""",

    "merge_replace_delete_unmatched" ->
      s"""$mergeCte
          SELECT s.* FROM s
          WHERE EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)""",

    // multi-clause conditional merge: matched & key%3=0 -> take source row;
    // other matched -> delete; unmatched source & key%8=0 -> insert
    "merge_clauses" ->
      s"""$mergeCte
          SELECT s.* FROM t JOIN s ON s.o_orderkey = t.o_orderkey
          WHERE s.o_orderkey % 3 = 0
          UNION ALL
          SELECT t.* FROM t
          WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
          UNION ALL
          SELECT s.* FROM s
          WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)
            AND s.o_orderkey % 8 = 0""",

    // upsert confined to the o_orderstatus='O' scope: only in-scope target
    // rows update; inserts are source rows unmatched within the scope;
    // out-of-scope rows pass through untouched
    "merge_partition_scoped" ->
      s"""$mergeCte,
          tin AS (SELECT * FROM t WHERE o_orderstatus = 'O'),
          tout AS (SELECT * FROM t WHERE o_orderstatus <> 'O'),
          u AS (SELECT tin.o_orderkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE tin.o_custkey END AS o_custkey,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE tin.o_orderstatus END AS o_orderstatus,
                 CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE tin.o_totalprice END AS o_totalprice
                FROM tin LEFT JOIN s ON s.o_orderkey = tin.o_orderkey)
          SELECT * FROM u
          UNION ALL
          SELECT s.* FROM s
          WHERE NOT EXISTS (SELECT 1 FROM tin WHERE tin.o_orderkey = s.o_orderkey)
          UNION ALL
          SELECT * FROM tout""",

    "table_roundtrip" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                l_returnflag, l_quantity, l_shipdate
         FROM lineitem WHERE l_returnflag IN ('A', 'R')""",

    // row tracking: two key-ordered single-file batches (< 3000 first)
    // make the assigned id equal the global o_orderkey rank, and the
    // OPTIMIZE rewrite between write and read proves the ids survive
    // compaction (materialized column wins over fresh baseRowIds)
    // ids = key rank at assignment time; the COW UPDATE (%7 -> 'X')
    // preserves every id and the COW DELETE (%13) removes only its own.
    // row versions: write v0 (<3000), append v1, OPTIMIZE v2 preserves,
    // UPDATE v3 stamps only its matches, DELETE v4 leaves survivors
    "table_row_tracking" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                     ELSE o_orderstatus END AS o_orderstatus,
                row_id,
                CAST(CASE WHEN o_orderkey % 7 = 0 THEN 3
                          WHEN o_orderkey < 3000 THEN 0
                          ELSE 1 END AS BIGINT) AS row_version
         FROM (SELECT o_orderkey, o_orderstatus,
                      CAST(row_number() OVER (ORDER BY o_orderkey) - 1
                        AS BIGINT) AS row_id
               FROM orders)
         WHERE o_orderkey % 13 <> 0""",

    // materialized view with derived avg/count forms: model the
    // post-DML source (delete %5, then +1000 cents on %7 of the
    // SURVIVORS), aggregate, and derive avg as the SAME exact-long
    // division readView performs (never DuckDB's avg() accumulator)
    "matview_avg" ->
      """SELECT prio,
                CAST(sum(price_c) AS DOUBLE) / count(price_c) AS avg_price_c,
                count(price_c) AS n_price,
                count(*) AS n_all,
                CAST(sum(price_c) AS BIGINT) AS sum_price_c
         FROM (SELECT o_orderpriority AS prio,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o_orderkey % 7 = 0 THEN 1000
                               ELSE 0 END AS price_c
               FROM orders WHERE o_orderkey % 5 <> 0)
         GROUP BY prio""",

    // min/max matview: survivors = keys % 5 <> 0, prices bumped on
    // % 7 = 0, then everything at-or-above the 40M-cent ceiling deleted
    // (the extremum-recompute path); oracle = plain recompute
    "matview_minmax" ->
      """SELECT prio,
                min(price_c) AS min_price_c,
                max(price_c) AS max_price_c,
                CAST(sum(price_c) AS BIGINT) AS sum_price_c,
                count(*) AS n_all
         FROM (SELECT o_orderpriority AS prio,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o_orderkey % 7 = 0 THEN 1000
                               ELSE 0 END AS price_c
               FROM orders WHERE o_orderkey % 5 <> 0)
         WHERE price_c < 40000000
         GROUP BY prio""",

    // the FULL matview composition: survivors = keys % 5 <> 0, prices
    // bumped AND buckets moved on % 7 = 0, then the 40M-cent price
    // ceiling deleted — all five aggregates recomputed plainly
    "matview_full" ->
      """SELECT prio,
                CAST(sum(price_c) AS BIGINT) AS sum_price_c,
                min(price_c) AS min_price_c,
                max(price_c) AS max_price_c,
                count(DISTINCT cust_b) AS nd_cust,
                count(*) AS n_all
         FROM (SELECT o_orderpriority AS prio,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o_orderkey % 7 = 0 THEN 1000
                               ELSE 0 END AS price_c,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN ((o_custkey % 97) + 1) % 97
                           ELSE o_custkey % 97 END AS cust_b
               FROM orders WHERE o_orderkey % 5 <> 0)
         WHERE price_c < 40000000
         GROUP BY prio""",

    // transparent aggregate rewrite: the Spark side asserts the plan
    // reads the VIEW (never the source); this twin recomputes the same
    // aggregates from the churned source, so a hash match proves the
    // view-served answer is bit-exact
    "matview_rewrite" ->
      """SELECT prio,
                CAST(sum(price_c) AS BIGINT) AS s,
                count(*) AS n,
                count(price_c) AS nv,
                CAST(sum(price_c) AS DOUBLE) / count(price_c) AS a,
                min(price_c) AS mn,
                max(price_c) AS mx,
                count(DISTINCT cust_b) AS nd
         FROM (SELECT o_orderpriority AS prio,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o_orderkey % 7 = 0 THEN 1000
                               ELSE 0 END AS price_c,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN ((o_custkey % 97) + 1) % 97
                           ELSE o_custkey % 97 END AS cust_b
               FROM orders WHERE o_orderkey % 5 <> 0)
         GROUP BY prio""",

    // rollup rewrite: the query collapses `prio` out of a (prio, stat)
    // view — the rule re-aggregates the summary; this twin recomputes
    // from the churned source grouped the query's way
    "matview_rollup_rewrite" ->
      """SELECT stat,
                CAST(sum(price_c) AS BIGINT) AS s,
                count(*) AS n,
                count(price_c) AS nv,
                CAST(sum(price_c) AS DOUBLE) / count(price_c) AS a,
                min(price_c) AS mn,
                max(price_c) AS mx
         FROM (SELECT o_orderstatus AS stat,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        + CASE WHEN o_orderkey % 7 = 0 THEN 1000
                               ELSE 0 END AS price_c
               FROM orders WHERE o_orderkey % 5 <> 0)
         GROUP BY stat""",

    // count(DISTINCT) matview: survivors = keys % 5 <> 0, bucket moved
    // ((b+1) % 97) on % 7 = 0; oracle = plain count(DISTINCT) recompute
    "matview_count_distinct" ->
      """SELECT prio,
                count(DISTINCT cust_b) AS nd_cust,
                count(*) AS n_all
         FROM (SELECT o_orderpriority AS prio,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN ((o_custkey % 97) + 1) % 97
                           ELSE o_custkey % 97 END AS cust_b
               FROM orders WHERE o_orderkey % 5 <> 0)
         GROUP BY prio""",

    // default column values: the append omitted src_tag -> 'bulk'
    "table_default_cols" ->
      """SELECT o_orderkey, o_totalprice, 'seed' AS src_tag FROM orders
         UNION ALL
         SELECT o_orderkey + 20000000 AS o_orderkey, o_totalprice,
                'bulk' AS src_tag
         FROM orders WHERE o_orderkey % 3 = 0""",

    // bloom-filter point lookup must lose no rows to wrong pruning
    "point_lookup_bloom" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE doc_id IN (7, 123, 400, 444)""",

    // clone pinned at v0 (pre-append), then DELETE l_returnflag='N' on
    // the clone only — output is the source's original rows minus 'N'
    "table_clone" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                l_returnflag, l_quantity, l_shipdate
         FROM lineitem WHERE l_returnflag <> 'N'""",

    // generated columns: first write computes them, the shifted append
    // supplies them — the union models both commits
    "table_generated_cols" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate,
                CAST(year(o_orderdate) AS BIGINT) AS o_year,
                o_orderkey % 7 AS okey_bucket
         FROM orders
         UNION ALL
         SELECT o_orderkey + 10000000, o_totalprice, o_orderdate,
                CAST(year(o_orderdate) AS BIGINT) AS o_year,
                (o_orderkey + 10000000) % 7 AS okey_bucket
         FROM orders""",

    "table_replace_where" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus <> 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0""",

    "table_dynamic_overwrite" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus <> 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0""",

    "table_convert" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",

    "table_rename" ->
      "SELECT o_orderkey, o_totalprice AS price FROM orders",

    "table_time_travel" ->
      "SELECT o_orderkey, o_totalprice FROM orders",

    "table_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR) AS o_flag FROM orders
         UNION ALL
         SELECT o_orderkey, o_custkey, 'new' AS o_flag FROM orders
         WHERE o_orderkey % 10 = 0""",

    // the source dir is copied twice (second run must be an exact
    // no-op — doubled rows would hash-mismatch), then extended once
    "copy_into" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
         UNION ALL
         SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1""",

    // CSV landing zone, read with the TARGET schema (long+string
    // columns round-trip text exactly); second run is an exact no-op
    "copy_into_csv" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderkey % 4 = 0""",

    // both generations surface as BIGINT after the metadata-only
    // widening; gen-2 values exceed int range on purpose
    "table_type_widening" ->
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS qty FROM orders
         WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_custkey + 3000000000 AS qty FROM orders
         WHERE o_orderkey % 2 = 1""",

    "table_slice_time_window" ->
      """SELECT o_orderkey, o_totalprice,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month
         FROM orders
         WHERE date_trunc('month', o_orderdate) >= TIMESTAMP '1995-03-01 00:00:00'
           AND date_trunc('month', o_orderdate) < TIMESTAMP '1995-09-01 00:00:00'""",

    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS text_hash,
                min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",

    "dedup_latest" ->
      """SELECT user_id, event_id, event_type, value
         FROM (SELECT user_id, event_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",

    "minhash_lsh_pairs" -> minhashSql,

    // incremental dedup against the persisted fingerprint store: bands
    // over ALL docs, store side (doc_id % 3 <> 0) hot-capped at 500
    // like DedupIndex.build; a batch doc (doc_id % 3 = 0) survives iff
    // no store band matches and no smaller-id batch doc shares a band
    "dedup_incremental" ->
      s"""WITH $minhashCtes,
          sb0 AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
          sfreq AS (SELECT band_id, band_key, count(*) AS c
                    FROM sb0 GROUP BY band_id, band_key),
          sb AS (SELECT b.doc_id, b.band_id, b.band_key
                 FROM sb0 b JOIN sfreq f
                   ON b.band_id = f.band_id AND b.band_key = f.band_key
                 WHERE f.c <= 500),
          bb AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
          beaten AS (
            SELECT DISTINCT b.doc_id
            FROM bb b JOIN sb s
              ON b.band_id = s.band_id AND b.band_key = s.band_key
            UNION
            SELECT DISTINCT a.doc_id
            FROM bb a JOIN bb b2
              ON a.band_id = b2.band_id AND a.band_key = b2.band_key
             AND b2.doc_id < a.doc_id)
          SELECT doc_id FROM documents
          WHERE doc_id % 3 = 0
            AND doc_id NOT IN (SELECT doc_id FROM beaten)""",

    // read-only decontamination probe: batch docs (doc_id % 3 = 0) with
    // ANY banded match in the hot-capped store — the hits, not survivors
    "dedup_probe" ->
      s"""WITH $minhashCtes,
          sb0 AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
          sfreq AS (SELECT band_id, band_key, count(*) AS c
                    FROM sb0 GROUP BY band_id, band_key),
          sb AS (SELECT b.doc_id, b.band_id, b.band_key
                 FROM sb0 b JOIN sfreq f
                   ON b.band_id = f.band_id AND b.band_key = f.band_key
                 WHERE f.c <= 500),
          bb AS (SELECT * FROM bands WHERE doc_id % 3 = 0)
          SELECT DISTINCT b.doc_id
          FROM bb b JOIN sb s
            ON b.band_id = s.band_id AND b.band_key = s.band_key""",

    "minhash_capped_pairs" -> minhashCappedSql,

    "simhash_signature" -> simhashSql,

    "simhash_band_pairs" -> {
      val bands = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band_id, substring(simhash, ${b * 16 + 1}, 16) AS chunk, simhash FROM sigs")
        .mkString(" UNION ALL ")
      s"""WITH sigs AS ($simhashSql),
          bands0 AS ($bands),
          bands AS (SELECT * FROM
                      (SELECT *, count(*) OVER (PARTITION BY band_id, chunk) AS bn
                       FROM bands0)
                    WHERE bn <= 32),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.simhash AS sa, b.simhash AS sb
                   FROM bands a JOIN bands b
                     ON a.band_id = b.band_id AND a.chunk = b.chunk
                    AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
                 CAST(len([i for i in range(1, 65) if sa[i:i] <> sb[i:i]]) AS BIGINT) AS hamming
          FROM cand
          WHERE len([i for i in range(1, 65) if sa[i:i] <> sb[i:i]]) <= 6"""
    },

    // LSH-first: MinHash band candidates, exactly verified on distinct
    // token sets (same contract as Dedup.ngramJaccardPairs)
    "ngram_jaccard_pairs" ->
      s"""WITH $minhashCtes$minhashKeptCtes,
          cand AS ($minhashPairsSelect),
          tk AS (SELECT doc_id, list_distinct($TOKS) AS toks FROM documents),
          p AS (SELECT c.doc_a, c.doc_b,
                       CAST(len(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS inter,
                       CAST(len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)) AS BIGINT) AS uni
                FROM cand c
                JOIN tk ta ON ta.doc_id = c.doc_a
                JOIN tk tb ON tb.doc_id = c.doc_b)
          SELECT doc_a, doc_b, inter, uni,
                 CAST(floor(1000 * inter / uni) AS BIGINT) AS jac_permille
          FROM p
          WHERE CAST(floor(1000 * inter / uni) AS BIGINT) >= 200""",

    "text_token_stats" ->
      s"""WITH d AS ($DOCS_TOKS)
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                 CAST(list_max([length(x) for x in toks]) AS BIGINT) AS max_token_len,
                 CAST(length(text) AS BIGINT) AS n_chars_computed
          FROM d JOIN documents USING (doc_id)""",

    // trigram-profile language ID: profiles are rendered from the SAME
    // LangProfiles the Spark kernel bakes into the plan; scoring sums
    // profile weights over every trigram occurrence of the shared
    // normalization, argmax with (score desc, lang asc) tie-break
    "text_lang_id" ->
      s"""WITH prof(lang, tg, w) AS (VALUES $langProfileValues),
          d AS (SELECT doc_id,
                       ' ' || regexp_replace(lower(text), '[^a-z]+', ' ', 'g') || ' ' AS s
                FROM documents),
          tgs AS (SELECT doc_id, s[i:i+2] AS tg
                  FROM d, UNNEST(range(1, len(s) - 1)) AS t(i)),
          sc AS (SELECT g.doc_id, p.lang, CAST(sum(p.w) AS BIGINT) AS score
                 FROM tgs g JOIN prof p ON p.tg = g.tg
                 GROUP BY 1, 2),
          best AS (SELECT doc_id, lang, score,
                          row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
                   FROM sc)
          SELECT d.doc_id,
                 COALESCE(b.lang, 'unk') AS pred_lang,
                 COALESCE(b.score, CAST(0 AS BIGINT)) AS score
          FROM d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1""",

    // hashed-unigram logistic quality classifier: exact integer sum of
    // e6 bucket weights over token occurrences + bias
    "text_quality_classifier" ->
      s"""WITH w(b, wt) AS (VALUES ${qualityWeightValues}),
          d AS (SELECT doc_id, $TOKS AS toks FROM documents),
          tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
          tb AS (SELECT doc_id,
                        ('0x' || substr(md5(tok), 1, 15))::BIGINT % ${graft.ext.QualityModel.Buckets} AS b
                 FROM tk),
          sc AS (SELECT tb.doc_id,
                        CAST(sum(COALESCE(w.wt, 0)) AS BIGINT) AS s
                 FROM tb LEFT JOIN w ON w.b = tb.b
                 GROUP BY tb.doc_id)
          SELECT d.doc_id,
                 CAST(${graft.ext.QualityModel.biasE6} + COALESCE(sc.s, 0) AS BIGINT) AS score_e6,
                 CAST(CASE WHEN ${graft.ext.QualityModel.biasE6} + COALESCE(sc.s, 0) > 0
                      THEN 1 ELSE 0 END AS BIGINT) AS pred_good
          FROM d LEFT JOIN sc ON sc.doc_id = d.doc_id""",

    "text_quality_score" ->
      s"""WITH d AS ($DOCS_TOKS)
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len([x for x in toks if list_contains(['the','a','of','and','is','to','in'], x)]) AS BIGINT) AS n_stopwords,
                 CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
                 CAST(floor(1000 * len([x for x in toks if list_contains(['the','a','of','and','is','to','in'], x)]) / len(toks)) AS BIGINT) AS stop_permille
          FROM d JOIN documents USING (doc_id)""",

    "text_bpeish_count" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
         FROM documents""",

    // real byte-level BPE: the merge table below is RENDERED from
    // graft.ext.BpeModel (the same object the Spark kernel uses).
    // Replay: per DISTINCT word, hex the UTF-8 bytes into symbols, then
    // a recursive CTE applies merges in rank order — one leftmost
    // occurrence per step (repeated-leftmost ≡ one left-to-right pass
    // per rank, since a merge's parts are created only by earlier
    // merges); a word's final state is its row at rank N+1.
    "text_bpe_count" -> bpeCountSql,

    // corpus-self-trained bigram LM perplexity proxy; the per-doc fold
    // runs over a list sorted by the exact INTEGER (c1, c2) pair so the
    // double summation order matches Spark's sorted aggregate() fold
    "text_lm_score" ->
      s"""WITH d AS ($DOCS_TOKS),
          d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
          bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                 FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
                       FROM d2)),
          b2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
          n AS (SELECT CAST(sum(c2) AS BIGINT) AS n_total FROM b2),
          j AS (SELECT bg.doc_id, b2.c2 FROM bg JOIN b2 USING (w1, w2)),
          l AS (SELECT doc_id, list_sort(list(c2)) AS cs
                FROM j GROUP BY doc_id)
          SELECT doc_id,
                 CAST(len(cs) AS BIGINT) AS n_bigrams,
                 CAST(floor((list_sum([ln(x::DOUBLE) for x in cs]) / len(cs)
                        - ln(n_total::DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                   AS avg_logprob_micro
          FROM l, n""",

    // fixed-token-window "paragraphs", md5-keyed global frequency, per-doc
    // duplicated-window fraction (window size 10 tokens, matching
    // TextAnalysis.paragraphDedup's default)
    "paragraph_dedup" ->
      s"""WITH d AS ($DOCS_TOKS),
          p AS (SELECT doc_id,
                       md5(array_to_string(toks[(i*10+1):(i*10+10)], ' ')) AS h
                FROM (SELECT doc_id, toks,
                             unnest(range(0, greatest(CAST(ceil(len(toks) / 10.0) AS BIGINT), 1))) AS i
                      FROM d)),
          f AS (SELECT h, count(*) AS freq FROM p GROUP BY 1)
          SELECT doc_id,
                 count(*) AS n_paragraphs,
                 CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paragraphs,
                 CAST(floor(1000 * sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS dup_permille
          FROM p JOIN f USING (h)
          GROUP BY doc_id""",

    // deterministic synthetic URLs from (source, doc_id); registrable
    // domain is public-suffix-aware (same embedded PSL subset as
    // graft.ext.UrlOps); blocklisted domains drop
    "url_filter" -> {
      val psl = graft.ext.UrlOps.MultiPartSuffixes
        .map(s => s"'$s'").mkString(", ")
      s"""WITH u AS (
            SELECT doc_id,
                   'https://' ||
                   (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
                   source || '.' ||
                   (['com', 'co.uk', 'org', 'com.au'])[CAST(doc_id % 4 + 1 AS INT)] ||
                   '/doc/' || doc_id::VARCHAR AS url
            FROM documents),
          h AS (SELECT doc_id, url,
                       lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
                FROM u),
          d AS (SELECT doc_id, url, host, string_split(host, '.') AS ls FROM h),
          r AS (SELECT doc_id, url, host,
                       CASE WHEN len(ls) <= 2 THEN host
                            WHEN list_contains([$psl], ls[-2] || '.' || ls[-1])
                              THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
                            ELSE ls[-2] || '.' || ls[-1] END AS domain
                FROM d)
          SELECT doc_id, url, host, domain FROM r
          WHERE domain NOT IN ('src1.com', 'src4.com.au', 'src7.co.uk', 'src10.org')"""
    },

    "text_fingerprint" ->
      s"""WITH d AS ($DOCS_TOKS),
          shd AS (SELECT doc_id, $SHINGLES AS sh FROM d)
          SELECT doc_id, list_min([md5(x) for x in sh]) AS fingerprint FROM shd""",

    "text_source_stats" ->
      s"""WITH d AS (SELECT source, len($TOKS) AS n_tok,
                            length(text) AS n_chars
                     FROM documents)
          SELECT source,
                 count(*) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars,
                 CAST(floor(1000 * sum(n_tok) / count(*)) AS BIGINT) AS mean_tokens_permille
          FROM d GROUP BY source""",

    // repetition ratio: distinct/total 3-word shingles, permille
    "text_repetition" ->
      s"""WITH d AS ($DOCS_TOKS),
          shd AS (SELECT doc_id, $SHINGLES AS sh FROM d)
          SELECT doc_id,
                 CAST(len(sh) AS BIGINT) AS n_shingles,
                 CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
                 CAST(floor(1000 * len(list_distinct(sh)) / len(sh)) AS BIGINT) AS distinct_permille
          FROM shd""",

    "knn_brute_topk" -> knnBruteSql,
    "knn_brute_l2" -> knnBruteL2Sql,
    "knn_brute_dot" -> knnBruteDotSql,

    "knn_ivf_topk" -> knnIvfSql,
    // cluster-balanced diversity selection: same stride-centroid
    // assignment CTEs as knn_ivf, then a per-cell cap ranked by
    // similarity-to-centroid ascending
    "cluster_balanced_select" ->
      s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $centStride = 0),
          scored AS (SELECT e.vec_id, c_id,
                            ${simE6("e.embedding", "c_vec")} AS c_sim
                     FROM embeddings e, cent),
          assign AS (SELECT vec_id, c_id AS cell, c_sim AS c_sim_e6 FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                        FROM scored) WHERE rn = 1),
          ranked AS (SELECT vec_id, cell, c_sim_e6,
                            row_number() OVER (PARTITION BY cell ORDER BY c_sim_e6 ASC, vec_id) AS rank_in_cell
                     FROM assign)
          SELECT vec_id, cell, c_sim_e6,
                 CAST(rank_in_cell AS BIGINT) AS rank_in_cell
          FROM ranked WHERE rank_in_cell <= 10""",

    "knn_ivf_kmeans" -> knnIvfKmeansSql,

    "pq_codes" -> pqCodesSql,
    "pq_codes_kmeans" -> pqCodesKmeansSql,
    "knn_pq_adc_kmeans" -> knnPqAdcKmeansSql,

    "knn_pq_adc" -> knnPqAdcSql,

    "knn_pq_adc_ip" -> knnPqAdcIpSql,

    "knn_ivf_ip" -> knnIvfIpSql,
    "knn_ivf_ip_kmeans" -> knnIvfIpKmeansSql,
    "knn_ip_rerank" -> knnIpRerankSql,
    "knn_ivf_ip_filtered" -> knnIvfIpFilteredSql,
    "knn_pq_ip_rerank" -> knnPqIpRerankSql,
    // the persisted IP index shares the inline IVF-IP oracle: build
    // stores ivfIpTopK's exact quantizer choices, search replays its
    // plan stages from the stored codes — bit-identical by construction
    "knn_index_ip" -> knnIvfIpSql,

    "knn_ivfpq_adc" -> knnIvfPqAdcSql,
    // the persisted-index search is bit-identical to the inline IVF-PQ
    // ADC path by construction (shared stages, exact artifact
    // round-trip) — the SAME oracle SQL checks both
    "knn_index_search" -> knnIvfPqAdcSql,
    // the persisted-index rerank is bit-identical to the inline rerank
    // by construction (shared shortlist + exact stages, quantizers
    // round-trip through table properties) — sharing the SQL checks it
    "knn_index_rerank" -> knnIvfPqRerankSql,
    "knn_ivfpq_rerank" -> knnIvfPqRerankSql,
    "knn_ivfpq_filtered" -> knnIvfPqFilteredSql,
    "knn_ivfpq_kmeans" -> knnIvfPqKmeansSql,

    "cosine_dup_pairs" ->
      s"""WITH cent AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $autoCentStride = 0),
          scored AS (SELECT e.vec_id, e.embedding, c_id,
                            ${simE6("e.embedding", "c_vec")} AS c_sim
                     FROM embeddings e, cent),
          assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                        FROM scored) WHERE rn = 1),
          guarded AS (SELECT vec_id, embedding, cell FROM
                        (SELECT *, count(*) OVER (PARTITION BY cell) AS cn FROM assign)
                      WHERE cn <= 4096)
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ${simE6("a.embedding", "b.embedding")} AS sim_e6
          FROM guarded a JOIN guarded b USING(cell)
          WHERE a.vec_id < b.vec_id
            AND ${simE6("a.embedding", "b.embedding")} >= 450000""",

    "multimodal_project" ->
      """SELECT d.doc_id, d.lang, d.source, d.n_chars,
                CAST(e.label AS BIGINT) AS label,
                CAST(len(e.embedding) AS BIGINT) AS embedding_dim
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""",

    "binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                md5(text) AS payload_md5
         FROM documents""",

    // replays syntheticImages' pixel arithmetic codec-free: even doc_id
    // = 16x8 gray sample(i)=(31*doc_id+i)%256; odd = 8x8 RGB with
    // r=(doc_id+i) g=(2*doc_id+i) b=(3*doc_id+i), each %256. The Spark
    // side pushes these pixels through a REAL PNG encode+ImageIO decode.
    "image_decode_stats" ->
      """SELECT d.doc_id,
                CAST(CASE WHEN d.doc_id % 2 = 0 THEN 16 ELSE 8 END AS BIGINT) AS width,
                CAST(8 AS BIGINT) AS height,
                CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
                CAST((SELECT CASE WHEN d.doc_id % 2 = 0
                        THEN SUM((d.doc_id * 31 + t.i) % 256)
                        ELSE SUM((d.doc_id + t.i) % 256
                               + (d.doc_id * 2 + t.i) % 256
                               + (d.doc_id * 3 + t.i) % 256) END
                      FROM generate_series(0, 127) t(i)
                      WHERE d.doc_id % 2 = 0 OR t.i < 64) AS BIGINT) AS pix_sum
         FROM documents d""",

    "embedding_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
                CAST(min(len(embedding)) AS BIGINT) AS min_dim,
                CAST(max(len(embedding)) AS BIGINT) AS max_dim
         FROM embeddings GROUP BY 1""",

    "embedding_centroid_sums" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS ord,
                CAST(sum(CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6,
                count(*) AS n
         FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
         GROUP BY 1, 2""",

    // L2 normalize (float unit vector), projected to exact e6 per element
    "embedding_normalize" ->
      s"""WITH n AS (SELECT vec_id, embedding,
                            sqrt(${dot("embedding", "embedding")}) AS nrm
                     FROM embeddings),
          u AS (SELECT vec_id,
                       CASE WHEN nrm > 0
                            THEN [(x::DOUBLE / nrm)::FLOAT for x in embedding]
                            ELSE embedding END AS unit
                FROM n)
          SELECT vec_id, CAST(i AS BIGINT) AS ord,
                 CAST(floor(unit[i]::DOUBLE * 1000000 + 0.5) AS BIGINT) AS unit_e6
          FROM u, UNNEST(range(1, len(unit) + 1)) AS t(i)""",

    // symmetric per-vector int8 quantization: q = floor(x*127/scale + 0.5)
    "embedding_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
                           list_max([abs(x::DOUBLE) for x in embedding]) AS scale
                    FROM embeddings),
          q AS (SELECT vec_id,
                       CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_e6,
                       CASE WHEN scale > 0
                            THEN [CAST(floor(x::DOUBLE * 127 / scale + 0.5) AS BIGINT) for x in embedding]
                            ELSE [CAST(0 AS BIGINT) for x in embedding] END AS qs
                FROM s)
          SELECT vec_id, scale_e6, CAST(i AS BIGINT) AS ord, qs[i] AS q
          FROM q, UNNEST(range(1, len(qs) + 1)) AS t(i)""",

    // transitive closure of the MinHash candidate pairs; component =
    // min reachable doc id (the unique fixpoint min-label propagation
    // converges to, so the iterative Spark plan and the recursive CTE
    // agree exactly)
    "dedup_clusters" ->
      s"""WITH RECURSIVE cand AS ($minhashSql),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                    UNION SELECT doc_b, doc_a FROM cand),
          reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.r)
          SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v""",

    // SemDeDup: IVF-cell-confined cosine pairs (same centroid/guard CTEs
    // as cosine_dup_pairs, threshold 0.30) -> components (min label) ->
    // one row per vector with its cluster, size, and representative flag
    "semantic_dedup" ->
      s"""WITH RECURSIVE cent AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id % $autoCentStride = 0),
          scored AS (SELECT e.vec_id, e.embedding, c_id,
                            ${simE6("e.embedding", "c_vec")} AS c_sim
                     FROM embeddings e, cent),
          assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                        FROM scored) WHERE rn = 1),
          guarded AS (SELECT vec_id, embedding, cell FROM
                        (SELECT *, count(*) OVER (PARTITION BY cell) AS cn FROM assign)
                      WHERE cn <= 4096),
          cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                   FROM guarded a JOIN guarded b USING(cell)
                   WHERE a.vec_id < b.vec_id
                     AND ${simE6("a.embedding", "b.embedding")} >= 300000),
          edges AS (SELECT id_a AS src, id_b AS dst FROM cand
                    UNION SELECT id_b, id_a FROM cand),
          reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.r),
          comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
          lab AS (SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS cluster_id
                  FROM embeddings e LEFT JOIN comp c ON c.v = e.vec_id)
          SELECT vec_id, cluster_id,
                 CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
                 CAST(CASE WHEN cluster_id = vec_id THEN 1 ELSE 0 END AS BIGINT) AS keep
          FROM lab""",

    "dedup_survivors" ->
      s"""WITH RECURSIVE cand AS ($minhashSql),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                    UNION SELECT doc_b, doc_a FROM cand),
          reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.r),
          comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> component)""",

    // quality-ranked survivors: the LONGEST member of each near-dup
    // cluster wins (tie -> smallest id); same component chain, then a
    // per-cluster argmax instead of min-label
    "dedup_best_survivor" ->
      s"""WITH RECURSIVE cand AS ($minhashSql),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                    UNION SELECT doc_b, doc_a FROM cand),
          reach(v, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.r),
          comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
          ranked AS (SELECT c.doc_id,
                            row_number() OVER (PARTITION BY c.component
                              ORDER BY d.n_chars DESC, c.doc_id) AS rk
                     FROM comp c JOIN documents d USING (doc_id))
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)""",

    // exact integer second moments (hugeint partials, like Spark's
    // decimal(38,0)); var/corr are numerator/denominator pairs
    "q24_exact_moments" ->
      """WITH m AS (SELECT l_returnflag,
                           CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
                           CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
                    FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
                CAST(count(*) * sum(q * q) - sum(q) * sum(q) AS BIGINT) AS var_q_num,
                CAST(count(*) * sum(d * d) - sum(d) * sum(d) AS BIGINT) AS var_d_num,
                CAST(count(*) * sum(q * d) - sum(q) * sum(d) AS BIGINT) AS cov_qd_num,
                CAST(count(*) * (count(*) - 1) AS BIGINT) AS var_den
         FROM m GROUP BY 1""",

    "q25_window_suite" ->
      """SELECT o_orderkey, o_orderstatus,
                CAST(ntile(4) OVER win AS BIGINT) AS ntile4,
                CAST(dense_rank() OVER win AS BIGINT) AS drank,
                CAST(floor(percent_rank() OVER win * 1000000 + 0.5) AS BIGINT) AS pr_e6,
                CAST(floor(cume_dist() OVER win * 1000000 + 0.5) AS BIGINT) AS cd_e6,
                first_value(o_orderkey) OVER win AS first_key,
                nth_value(o_orderkey, 3) OVER win AS third_key
         FROM orders WHERE o_custkey % 50 = 0
         WINDOW win AS (PARTITION BY o_orderstatus
                        ORDER BY o_totalprice, o_orderkey)""",

    "text_pii_scrub" -> {
      val em = graft.ext.TextAnalysis.EmailRe
      val ip = graft.ext.TextAnalysis.Ipv4Re
      val ph = graft.ext.TextAnalysis.PhoneRe
      s"""WITH r AS (SELECT doc_id, text,
                 regexp_replace(regexp_replace(regexp_replace(text,
                   '$em', '<EMAIL>', 'g'),
                   '$ip', '<IP>', 'g'),
                   '$ph', '<PHONE>', 'g') AS red
          FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
                 CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
                 md5(red) AS redacted_md5,
                 CAST(length(red) AS BIGINT) AS redacted_len
          FROM r"""
    },

    // decontam: probe = src0, corpus = everything else; overlap of each
    // probe doc's distinct 3-gram shingles with the corpus shingle set
    "text_decontam" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents
                     WHERE source <> 'src0'),
          shd AS (SELECT doc_id, $SHINGLES AS sh FROM d),
          tr AS (SELECT DISTINCT unnest(sh) AS s FROM shd),
          pd AS (SELECT doc_id, $TOKS AS toks FROM documents
                 WHERE source = 'src0'),
          psh AS (SELECT doc_id, list_distinct($SHINGLES) AS sh FROM pd),
          pex AS (SELECT doc_id, unnest(sh) AS s FROM psh),
          hits AS (SELECT doc_id, count(*) AS n_hit
                   FROM pex JOIN tr USING (s) GROUP BY doc_id)
          SELECT t.doc_id, CAST(len(t.sh) AS BIGINT) AS n_shingles,
                 CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
                 CAST(floor(1000.0 * coalesce(h.n_hit, 0) / len(t.sh)) AS BIGINT)
                   AS contam_permille
          FROM psh t LEFT JOIN hits h USING (doc_id)""",

    "text_chunks" ->
      """SELECT doc_id,
                s // 100 AS chunk_id,
                substring(text, CAST(s + 1 AS INTEGER), 120) AS chunk,
                CAST(length(substring(text, CAST(s + 1 AS INTEGER), 120)) AS BIGINT) AS chunk_len
         FROM (SELECT doc_id, text,
                      unnest(generate_series(0, greatest(length(text) - 1, 0), 100)) AS s
               FROM documents)""",

    // sliding TOKEN windows (24 wide, step 16 = 8-token overlap);
    // DuckDB list slicing is 1-based INCLUSIVE, matching Spark's
    // slice(toks, s+1, 24) = elements s+1..s+24, both end-clamped.
    // Start bound len − overlap − 1: a window is emitted only when it
    // contributes tokens beyond the carried overlap (no trailing chunk
    // fully contained in its predecessor)
    "text_chunk_tokens" ->
      s"""WITH d AS ($DOCS_TOKS)
          SELECT doc_id,
                 CAST(s // 16 AS BIGINT) AS chunk_id,
                 array_to_string(toks[CAST(s + 1 AS INTEGER):CAST(s + 24 AS INTEGER)], ' ') AS chunk,
                 CAST(len(toks[CAST(s + 1 AS INTEGER):CAST(s + 24 AS INTEGER)]) AS BIGINT) AS n_tokens
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(0, greatest(len(toks) - 8 - 1, 0), 16)) AS s
                FROM d)""",

    "seq_pack" ->
      s"""WITH d AS (
            SELECT doc_id,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                     % 16 AS shard,
                   CAST(len($TOKS) AS BIGINT) AS n_tokens
            FROM documents)
          SELECT doc_id, shard, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS BIGINT) AS seq_id
          FROM d""",

    "sample_hash" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))::BIGINT
               % 1000 < 100""",

    // Poisson weighted sample, integer-exact: hash24·Σw < k·w·2^24
    // (HUGEINT here, decimal(38) on the Spark side — both exact)
    "sample_weighted" ->
      """WITH tw AS (SELECT CAST(SUM(n_chars) AS HUGEINT) AS w FROM documents)
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         FROM documents, tw
         WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                 AS HUGEINT) * tw.w
             < CAST(100 AS HUGEINT) * CAST(n_chars AS HUGEINT) * 16777216""",

    "source_quota" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
                  row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents) WHERE rn <= 3""",

    // per-source quantile gate: exactly ceil(n·250/1000) rows survive
    // per source, ranked by stopword permille ascending, doc_id tie —
    // integer `//` cutoff mirrors Spark's `div` exactly
    "quality_quantile_filter" ->
      s"""WITH d AS ($DOCS_TOKS),
          q AS (SELECT doc_id, source,
                       CAST(floor(1000 * len([x for x in toks if list_contains(['the','a','of','and','is','to','in'], x)]) / len(toks)) AS BIGINT) AS stop_permille
                FROM d JOIN documents USING (doc_id)),
          ranked AS (SELECT doc_id, source, stop_permille,
                            row_number() OVER (PARTITION BY source
                              ORDER BY stop_permille ASC, doc_id) AS rn,
                            count(*) OVER (PARTITION BY source) AS n
                     FROM q)
          SELECT doc_id, source, stop_permille FROM ranked
          WHERE rn <= (n * 250 + 999) // 1000""",

    "text_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(
                  nfc_normalize(text),
                  '[\t\n\r]', ' ', 'g'),
                  '[\p{Cc}\p{Cf}]', '', 'g'),
                  ' +', ' ', 'g')) AS text_norm
         FROM documents""",

    "split_assign" ->
      """SELECT doc_id,
                CASE WHEN b < 980 THEN 'train'
                     WHEN b < 990 THEN 'val'
                     ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                        % 1000 AS b
               FROM documents)""",

    // the skew-aware join must equal the PLAIN join bit-for-bit
    "skew_join" ->
      s"""SELECT o.o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(${cents("l.l_quantity")}) AS BIGINT) AS qty_cents
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY o.o_orderpriority""",

    "frequent_ngrams" ->
      s"""WITH d AS ($DOCS_TOKS),
          shd AS (SELECT doc_id, $SHINGLES AS sh FROM d),
          ex AS (SELECT doc_id, unnest(sh) AS s FROM shd)
          SELECT s AS ngram, CAST(count(*) AS BIGINT) AS cnt
          FROM ex GROUP BY s
          ORDER BY cnt DESC, ngram LIMIT 20""",

    "text_gopher_rules" ->
      s"""WITH d AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
          m AS (SELECT doc_id,
                       len(toks) AS nw,
                       CAST(floor(1000 * coalesce(list_sum([len(t) for t in toks]), 0)
                         / greatest(len(toks), 1)) AS BIGINT) AS mlp,
                       len(list_filter(toks, t ->
                         contains(t, '#') OR contains(t, '...'))) AS n_symbol,
                       greatest(len(regexp_split_to_array(text, '\\n')), 1) AS n_lines,
                       len(list_filter(regexp_split_to_array(text, '\\n'), l ->
                         starts_with(trim(l), '-') OR starts_with(trim(l), '*')))
                         AS n_bullet,
                       len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                         AS n_alpha
                FROM d)
          SELECT doc_id,
                 CAST(nw AS BIGINT) AS n_words,
                 mlp AS mean_word_len_permille,
                 (nw >= 10 AND nw <= 100000) AS words_ok,
                 (mlp >= 3000 AND mlp <= 10000) AS mean_len_ok,
                 (n_symbol * 10 <= nw) AS symbol_ok,
                 (n_bullet * 10 <= n_lines * 9) AS bullet_ok,
                 (n_alpha * 5 >= nw * 4) AS alpha_ok,
                 ((nw >= 10 AND nw <= 100000) AND (mlp >= 3000 AND mlp <= 10000)
                   AND (n_symbol * 10 <= nw) AND (n_bullet * 10 <= n_lines * 9)
                   AND (n_alpha * 5 >= nw * 4)) AS keep
          FROM m""",

    "text_bm25" ->
      s"""WITH d AS ($DOCS_TOKS),
          base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
          stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(dl) AS BIGINT) AS total_tokens FROM base),
          qt AS (SELECT unnest(['spark', 'query', 'merge']) AS term),
          dfs AS (SELECT t.term, CAST(count(*) AS BIGINT) AS df
                  FROM base b, qt t
                  WHERE list_contains(b.toks, t.term) GROUP BY t.term),
          tf AS (SELECT b.doc_id, b.dl, t.term,
                        CAST(len(list_filter(b.toks, x -> x = t.term)) AS BIGINT) AS tf
                 FROM base b, qt t WHERE list_contains(b.toks, t.term)),
          p AS (SELECT tf.doc_id,
                       CAST(floor(
                         ln((s.n_docs::DOUBLE - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                         * (tf.tf::DOUBLE * (1.2 + 1.0))
                         / (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75
                             + 0.75 * tf.dl / (s.total_tokens::DOUBLE / s.n_docs)))
                         * 1000000 + 0.5) AS BIGINT) AS score_term_e6
                FROM tf JOIN dfs ON dfs.term = tf.term, stats s)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_match_terms,
                 CAST(sum(score_term_e6) AS BIGINT) AS score_e6
          FROM p GROUP BY doc_id""",

    // hybrid RRF retrieval — BM25 candidates (same math as text_bm25,
    // query doc 7 excluded from the CANDIDATE lists only) fused with a
    // dense candidate list; each reciprocal term e9-micro-rounded
    // individually, fused score = exact 2-term bigint sum
    "hybrid_rrf_topk" -> hybridRrfSql("",
      s"""SELECT e.vec_id AS doc_id,
                 ${simE6("q.embedding", "e.embedding")} AS sim_e6
          FROM embeddings e,
               (SELECT embedding FROM embeddings WHERE vec_id = 7) q
          WHERE e.vec_id <> 7"""),

    // the indexed variant: dense candidates from the query's IVF cell
    // only (stride centroids, nprobe=1 — the knn_ivf assignment replay)
    "hybrid_rrf_ivf" -> hybridRrfSql(
      s"""cent AS (SELECT vec_id AS c_id, embedding AS c_vec
                   FROM embeddings WHERE vec_id % $centStride = 0),
          cscored AS (SELECT e.vec_id, e.embedding, c_id,
                             ${simE6("e.embedding", "c_vec")} AS c_sim
                      FROM embeddings e, cent),
          assign AS (SELECT vec_id, embedding, c_id AS cell FROM
                       (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
                        FROM cscored) WHERE rn = 1),""",
      s"""SELECT n.vec_id AS doc_id,
                 ${simE6("q.embedding", "n.embedding")} AS sim_e6
          FROM (SELECT embedding, cell FROM assign WHERE vec_id = 7) q
          JOIN assign n USING(cell)
          WHERE n.vec_id <> 7"""),

    // smoothed tf-idf keyword extraction — mirrors TextOps.tfidfTopK's
    // op order exactly: one rounded double per (doc, term) output row
    // (no summed doubles), N = ALL documents, df counted from the
    // deduped (doc, term) relation
    "text_tfidf_topk" ->
      s"""WITH d AS ($DOCS_TOKS),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          tok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                         unnest(toks) AS term FROM d),
          tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM tok WHERE term <> '' GROUP BY doc_id, dl, term),
          dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                  FROM tf GROUP BY term),
          scored AS (SELECT doc_id, tf.term AS term,
                            CAST(floor((tf.tf::DOUBLE / tf.dl)
                              * (ln((n.n_docs::DOUBLE + 1.0) / (dfs.df + 1.0)) + 1.0)
                              * 1000000 + 0.5) AS BIGINT) AS score_e6
                     FROM tf JOIN dfs ON dfs.term = tf.term, n),
          ranked AS (SELECT doc_id, term, score_e6,
                            row_number() OVER (PARTITION BY doc_id
                              ORDER BY score_e6 DESC, term) AS "rank"
                     FROM scored)
          SELECT doc_id, term, CAST("rank" AS BIGINT) AS "rank", score_e6
          FROM ranked WHERE "rank" <= 3""",

    "content_chunks" ->
      s"""WITH d AS ($DOCS_TOKS),
          ex AS (SELECT doc_id, t.i AS pos, toks[t.i] AS tok
                 FROM d, UNNEST(range(1, len(toks) + 1)) AS t(i)),
          b AS (SELECT doc_id, pos, tok,
                       CASE WHEN (('0x' || substring(md5(tok), 1, 15))::BIGINT
                              & 2147483647) % 32 = 0 THEN 1 ELSE 0 END AS bd
                FROM ex),
          c AS (SELECT doc_id, pos, tok,
                       COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS chunk_id
                FROM b)
          SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                 string_agg(tok, ' ' ORDER BY pos) AS chunk,
                 CAST(count(*) AS BIGINT) AS n_tokens
          FROM c GROUP BY doc_id, chunk_id""",

    "sample_stratified" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))::BIGINT
               % 1000 <
               CASE o_orderstatus WHEN 'F' THEN 500 WHEN 'O' THEN 100
                    WHEN 'P' THEN 1000 ELSE 0 END""",

    // domain-mixture resampling: binding source = argmin n/w (kept
    // whole); thresholds are exact integer rationals in millionths —
    // mirrors Sampling.domainMix bit for bit
    // deterministic global shuffle: the single global window here IS
    // the oracle for the distributed prefix-count formulation
    "corpus_shuffle" ->
      """SELECT doc_id,
                CAST(ROW_NUMBER() OVER (
                  ORDER BY md5('42' || CAST(doc_id AS VARCHAR)) ASC,
                           doc_id ASC) - 1 AS BIGINT) AS pos
         FROM documents""",

    // greedy quality-first selection under a token budget: the single
    // global window here IS the oracle for the distributed
    // prefix-sum formulation (Sampling.selectByBudget)
    "corpus_select" ->
      s"""WITH d AS (
            SELECT doc_id,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                     % 1000000 AS score,
                   CAST(len($TOKS) AS BIGINT) AS n_tokens
            FROM documents),
          r AS (
            SELECT doc_id, score, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
          SELECT doc_id, score, n_tokens FROM r WHERE cum <= 12000""",

    "domain_mix" ->
      """WITH wt(wsource, w) AS (
           SELECT * FROM (VALUES ('src1', 500), ('src2', 300), ('src3', 200))),
         c AS (
           SELECT d.source AS csource, any_value(wt.w) AS w,
                  count(*) AS n
           FROM documents d JOIN wt ON d.source = wt.wsource
           GROUP BY d.source),
         b AS (
           SELECT n AS nb, w AS wb FROM c
           ORDER BY n * 1.0 / w, csource LIMIT 1),
         t AS (
           SELECT c.csource,
                  (2 * b.nb * c.w * 1000000 + b.wb * c.n)
                    // (2 * b.wb * c.n) AS thr
           FROM c, b)
         SELECT d.doc_id, d.source
         FROM documents d JOIN t ON d.source = t.csource
         WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 1000000 < t.thr""",

    // line-level boilerplate removal over the same injected fixture as
    // the Spark side: header/footer (500x) and per-lang promo (64-218x)
    // cross minDupCount=5 and are dropped; original one-line texts (all
    // unique at this sf) survive
    "line_dedup" ->
      """WITH fx AS (
           SELECT doc_id,
                  'Site Navigation Home About' || chr(10) || text || chr(10)
                    || 'Subscribe now in ' || lang || chr(10)
                    || '(c) example.com all rights reserved' AS text
           FROM documents),
         l AS (
           SELECT doc_id,
                  generate_subscripts(string_split(text, chr(10)), 1) AS pos,
                  unnest(string_split(text, chr(10))) AS line
           FROM fx),
         k AS (
           SELECT doc_id, pos, line,
                  md5(trim(line)) AS lk, trim(line) = '' AS blank
           FROM l),
         d AS (
           SELECT lk FROM k WHERE NOT blank
           GROUP BY lk HAVING count(*) >= 5)
         SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN blank OR lk NOT IN (SELECT lk FROM d)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                COALESCE(string_agg(
                  CASE WHEN blank OR lk NOT IN (SELECT lk FROM d) THEN line END,
                  chr(10) ORDER BY pos), '') AS clean_text
         FROM k GROUP BY doc_id""",

    // exact-substring dedup (Lee et al. ExactSubstr, k=8): anchors are
    // 8-token shingles with count >= 2 corpus-wide; overlapping/abutting
    // anchor windows merge into spans (gaps-and-islands); docs are
    // reassembled from tokens outside all spans. Every 10th doc carries
    // an injected shared 11-token tail (guaranteed long cross-doc span).
    "substring_dedup" ->
      """WITH fx AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 10 = 0
                       THEN text || ' shared boilerplate tail sentence repeated verbatim across every tenth document here'
                       ELSE text END AS text
           FROM documents),
         d AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS toks
               FROM fx),
         a0 AS (SELECT doc_id, unnest(range(1, len(toks) - 6)) AS pos, toks
                FROM d WHERE len(toks) >= 8),
         a AS (SELECT doc_id, pos,
                      md5(array_to_string(toks[pos:pos+7], ' ')) AS h
               FROM a0),
         dup AS (SELECT h FROM a GROUP BY h HAVING count(*) >= 2),
         da AS (SELECT doc_id, pos FROM a JOIN dup USING (h)),
         sp0 AS (SELECT doc_id, pos,
                        CASE WHEN pos - lag(pos) OVER
                               (PARTITION BY doc_id ORDER BY pos) > 8
                             THEN 1 ELSE 0 END AS ns
                 FROM da),
         sp1 AS (SELECT doc_id, pos,
                        sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS sid
                 FROM sp0),
         sp AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 7 AS e
                FROM sp1 GROUP BY doc_id, sid),
         st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                       CAST(sum(e - s + 1) AS BIGINT) AS n_dup_tokens
                FROM sp GROUP BY doc_id),
         tk AS (SELECT doc_id, generate_subscripts(toks, 1) AS q,
                       unnest(toks) AS tok
                FROM d),
         kept AS (SELECT t.doc_id, t.q, t.tok FROM tk t
                  WHERE NOT EXISTS (SELECT 1 FROM sp
                    WHERE sp.doc_id = t.doc_id AND t.q BETWEEN sp.s AND sp.e)),
         cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY q) AS clean_text
                FROM kept GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
                COALESCE(st.n_dup_tokens, 0) AS n_dup_tokens,
                COALESCE(st.n_spans, 0) AS n_spans,
                COALESCE(cl.clean_text, '') AS clean_text
         FROM d LEFT JOIN st USING (doc_id) LEFT JOIN cl USING (doc_id)""",

    // a restore after a corrupting overwrite reads back the v0 content
    "table_restore" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",

    "table_truncate" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey < 100""",

    "table_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE NOT (o_totalprice > 150000.0)""",

    "table_delete_dv" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE NOT (o_totalprice > 150000.0)""",

    "table_update_dv" ->
      """SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice
         FROM orders""",

    "table_update" ->
      """SELECT o_orderkey, o_orderstatus,
                CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice
         FROM orders""",

    "sql_catalog_bucket_join" ->
      s"""SELECT o_custkey, count(*) AS n_items,
            CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_cents
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1""",

    "sql_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE NOT (o_orderstatus = 'O' AND o_totalprice < 50000.0)""",

    "sql_update" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'F' AND o_orderkey % 3 = 0
                     THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                CASE WHEN o_orderstatus = 'F' AND o_orderkey % 3 = 0
                     THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
         FROM orders""",

    // end state of the MERGE: conditional update, clause-ordered delete,
    // insert of negated keys
    "sql_merge_into" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
          s AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 5 AS o_totalprice
                FROM t WHERE o_orderkey % 10 = 0
                UNION ALL
                SELECT -o_orderkey AS o_orderkey, o_orderstatus, o_totalprice
                FROM t WHERE o_orderkey % 17 = 0),
          kept AS (SELECT t.o_orderkey, t.o_orderstatus,
                          CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                               ELSE t.o_totalprice END AS o_totalprice
                   FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
                   WHERE s.o_orderkey IS NULL OR s.o_totalprice > 100000.0),
          ins AS (SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
                  FROM s LEFT JOIN t ON s.o_orderkey = t.o_orderkey
                  WHERE t.o_orderkey IS NULL)
          SELECT * FROM kept UNION ALL SELECT * FROM ins""",

    // CDF-enabled update: exact pre/postimage pairs
    "table_changes_updates" ->
      """WITH m AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderstatus = 'P')
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 'update_preimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                 'update_postimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m""",

    // batch CDF reader, startingVersion=1: only the update commit —
    // identical pre/postimage shape to table_changes_updates
    "read_change_feed_batch" ->
      """WITH m AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderstatus = 'P')
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 'update_preimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                 'update_postimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m""",

    // same change set as read_change_feed_batch, via the SQL TVF route
    "sql_table_changes" ->
      """WITH m AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderstatus = 'P')
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 'update_preimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                 'update_postimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m""",

    "table_changes_merge" ->
      """WITH m AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey % 7 = 0)
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 'update_preimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice,
                 'update_postimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version FROM m
          UNION ALL
          SELECT -o_orderkey AS o_orderkey, o_orderstatus, o_totalprice,
                 'insert' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version
          FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey > 0""",

    "table_changes_mixed" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
               upd AS (SELECT o_orderkey, o_orderstatus,
                              CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 2
                                   ELSE o_totalprice END AS o_totalprice FROM base)
          SELECT o_orderkey, o_orderstatus, o_totalprice,
                 'update_preimage' AS _change_type,
                 CAST(1 AS BIGINT) AS _commit_version
          FROM base WHERE o_orderstatus = 'P'
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                 'update_postimage', CAST(1 AS BIGINT)
          FROM base WHERE o_orderstatus = 'P'
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete',
                 CAST(2 AS BIGINT) FROM upd
          WHERE o_orderkey % 5 <> 0 OR o_orderstatus = 'P'
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice, 'insert',
                 CAST(2 AS BIGINT) FROM base
          WHERE o_orderkey % 5 = 0 AND o_orderstatus = 'P'""",

    // net row diff of the upsert: delete+insert pair per touched key
    "table_changes" ->
      """WITH s0 AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                     FROM orders),
          s1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                        CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                             ELSE o_totalprice END AS o_totalprice
                 FROM orders),
          i AS (SELECT *, 'insert' AS _change_type
                FROM (SELECT * FROM s1 EXCEPT ALL SELECT * FROM s0)),
          d AS (SELECT *, 'delete' AS _change_type
                FROM (SELECT * FROM s0 EXCEPT ALL SELECT * FROM s1))
          SELECT *, CAST(1 AS BIGINT) AS _commit_version FROM i
          UNION ALL
          SELECT *, CAST(1 AS BIGINT) FROM d"""
  )

  // merge-on-read variants (`graft.dv=true`): matched preimages become
  // per-file deletion vectors, postimages/inserts append as new files —
  // the row contract is IDENTICAL to copy-on-write, so the DV queries
  // share the COW oracles verbatim
  val all: Map[String, String] = base ++ ListMap(
    "merge_upsert_dv" -> base("merge_upsert"),
    "merge_clauses_dv" -> base("merge_clauses"))
}
