package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with Reciprocal Rank Fusion
  * (RRF — Cormack/Clarke/Büttcher, SIGIR 2009): fuse a BM25 candidate
  * list and an embedding-similarity candidate list into one ranking,
  * `score(d) = Σ_lists 1/(kRrf + rank_list(d))`. RRF needs only RANKS,
  * never comparable scores, which is exactly why it is the standard
  * fusion for lexical+dense retrieval: BM25 scores and cosine
  * similarities live on incomparable scales.
  *
  * Plan shape at 100 TB: each branch is ONE bounded corpus pass —
  * BM25 is a term-filtered explode + partial-aggregated (doc, term)
  * shuffle ([[TextAnalysis.bm25]]), the vector branch a broadcast
  * query vector + capped top-k partial aggregation
  * ([[Similarity.bruteTopK]]) or a cell-pruned IVF probe
  * ([[Similarity.ivfTopK]]). The fusion itself touches only the two
  * ≤`nCand`-row candidate lists — the global-order windows below run
  * AFTER a distributed `TakeOrderedAndProject` bounds each list, so
  * the single-partition window sees ≤`nCand` rows no matter the corpus
  * size.
  *
  * Exactness: ranks are integers; each reciprocal term is micro-rounded
  * to e9 fixed point INDIVIDUALLY (`floor(1e9/(kRrf+rank) + 0.5)`) and
  * the fused score is their 2-term bigint sum — order-free, hence
  * engine-identical (oracle `hybrid_rrf_topk` / `hybrid_rrf_ivf`).
  */
object Retrieval {

  /** One reciprocal-rank term in e9 fixed point; NULL rank (the doc is
    * absent from that list) stays NULL for the caller's coalesce-to-0.
    */
  private def rrfTermE9(rank: Column, kRrf: Int): Column =
    floor(lit(1e9) / (lit(kRrf.toDouble) + rank) + lit(0.5)).cast("long")

  /** Top-`nCand` BM25 candidates for `queryTerms`, ranked 1.. by
    * (score desc, id) — the query document itself is excluded from the
    * CANDIDATE list only (corpus statistics still count it, exactly as
    * a real retrieval corpus would).
    */
  private def lexCandidates(
      docs: DataFrame,
      queryTerms: Seq[String],
      excludeId: Long,
      nCand: Int): DataFrame = {
    // `doc_id` is bm25's output contract (the documents-table id)
    val scored = TextAnalysis.bm25(docs, queryTerms)
      .filter(col("doc_id") =!= excludeId)
      .select(col("doc_id"), col("score_e6"))
      // distributed top-nCand (TakeOrderedAndProject), THEN the rank
      // window over the bounded list
      .orderBy(col("score_e6").desc, col("doc_id")).limit(nCand)
    scored
      .withColumn("r_lex", row_number()
        .over(Window.orderBy(col("score_e6").desc, col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("r_lex"))
  }

  /** RRF fusion of two ranked candidate lists (id, r_lex) ⋈ (id, r_vec)
    * — full-outer: a doc on one list only contributes that list's term.
    * Output: (id, r_lex, r_vec, rrf_e9, rank), top `k` by fused score.
    */
  private def fuse(
      lex: DataFrame,
      vec: DataFrame,
      k: Int,
      kRrf: Int): DataFrame = {
    val fusedScore =
      coalesce(rrfTermE9(col("r_lex"), kRrf), lit(0L)) +
        coalesce(rrfTermE9(col("r_vec"), kRrf), lit(0L))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_vec"),
        fusedScore.as("rrf_e9"))
      .orderBy(col("rrf_e9").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf_e9").desc, col("doc_id")))
        .cast("long"))
  }

  /** Hybrid top-`k`: BM25 over `queryTerms` fused with brute-force
    * cosine against the embedding of `queryVecId`. The baseline —
    * exact on both branches; [[hybridRrfTopKIvf]] is the indexed scale
    * path with the identical fusion.
    *
    * `docs` follows the documents-table contract (`doc_id`, `text` —
    * bm25's input shape); `embeddings` rows are the same corpus's
    * vectors, joined by `doc_id = vecIdCol` value identity.
    */
  def hybridRrfTopK(
      docs: DataFrame,
      embeddings: DataFrame,
      queryTerms: Seq[String],
      queryVecId: Long,
      k: Int = 10,
      nCand: Int = 100,
      kRrf: Int = 60,
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val vec = Similarity.bruteTopK(embeddings,
      embeddings.filter(col(vecIdCol) === queryVecId), nCand,
      idCol = vecIdCol, vecCol = vecCol)
      .select(col("n_id").as("doc_id"), col("rank").cast("long").as("r_vec"))
    fuse(lexCandidates(docs, queryTerms, queryVecId, nCand), vec, k, kRrf)
  }

  /** [[hybridRrfTopK]] with the vector branch served by a cell-pruned
    * IVF probe instead of the exact corpus pass — the 100 TB posture:
    * the dense candidates come from the probed cells only (|cell| ≈
    * n/numCentroids comparisons), and RRF is rank-based, so swapping
    * the branch changes NOTHING about the fusion math.
    */
  def hybridRrfTopKIvf(
      docs: DataFrame,
      embeddings: DataFrame,
      queryTerms: Seq[String],
      queryVecId: Long,
      k: Int = 10,
      nCand: Int = 100,
      kRrf: Int = 60,
      numCentroids: Int = 32,
      rowCountHint: Option[Long] = None,
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val vec = Similarity.ivfTopK(embeddings,
      col(vecIdCol) === queryVecId, nCand, numCentroids,
      idCol = vecIdCol, vecCol = vecCol, rowCountHint = rowCountHint)
      .select(col("n_id").as("doc_id"), col("rank").cast("long").as("r_vec"))
    fuse(lexCandidates(docs, queryTerms, queryVecId, nCand), vec, k, kRrf)
  }
}
