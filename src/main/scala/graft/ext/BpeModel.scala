package graft.ext

/** A real byte-level BPE tokenizer (Sennrich et al.'s algorithm), with
  * the same self-contained posture as [[LangProfiles]] and
  * [[QualityModel]]: the merge table is trained ONCE, deterministically,
  * at object init from the embedded seed corpora, and the DuckDB oracle
  * renders the SAME table from this object — the two engines cannot
  * drift.
  *
  * Model shape:
  *   - pre-tokenize with the repo's shared idiom (`lower(trim(text))`
  *     split on whitespace); merges never cross word boundaries;
  *   - a word is its UTF-8 byte sequence; symbols render as UPPERCASE
  *     hex pairs (matching DuckDB's `hex()`), so a merged symbol is the
  *     concatenation of its parts' hex — unambiguous by construction;
  *   - training: count adjacent symbol pairs across the word-frequency
  *     table, merge the most frequent pair (ties: lexicographic on
  *     (left, right) hex), repeat [[NumMerges]] times;
  *   - encoding applies merges IN RANK ORDER, one left-to-right
  *     non-overlapping pass each — canonical BPE apply: a merge's parts
  *     can only be produced by strictly earlier merges, so an earlier
  *     merge can never become newly applicable later, and one ordered
  *     pass per merge is exact (and exactly replayable as N bounded
  *     steps of a recursive CTE on the oracle side).
  *
  * Scale shape: scoring is a per-row codegen'd scan (no shuffle) with a
  * per-executor word→count memo — synthetic and natural corpora alike
  * repeat words, so the per-word merge loop amortizes to the VOCABULARY
  * size, not the token count.
  */
object BpeModel {

  val NumMerges = 200

  /** Seed corpus: both quality classes + the 12 language-ID seeds —
    * diverse byte patterns including multi-byte UTF-8.
    */
  private def seedCorpus: Seq[String] =
    QualityModel.goodSeeds ++ QualityModel.badSeeds ++
      LangProfiles.seedTexts.map(_._2)

  private def wordsOf(text: String): Seq[String] =
    text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty)

  /** UTF-8 bytes as uppercase hex-pair symbols (DuckDB `hex()` parity). */
  def byteSymbols(word: String): Vector[String] =
    word.getBytes("UTF-8").toVector.map(b => f"$b%02X")

  /** Ordered merge table: rank r (1-based) merges `(left, right)` into
    * `left + right`.
    */
  val merges: Vector[(String, String)] = {
    val vocab = scala.collection.mutable.HashMap.empty[Vector[String], Long]
    seedCorpus.flatMap(wordsOf).foreach { w =>
      val k = byteSymbols(w)
      if (k.nonEmpty) vocab(k) = vocab.getOrElse(k, 0L) + 1L
    }
    val out = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < NumMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        val (bl, br) = best
        val merged = bl + br
        vocab.toSeq.foreach { case (syms, f) =>
          val next = mergeOnePass(syms, bl, br, merged)
          if (next ne syms) {
            vocab.remove(syms)
            vocab(next) = vocab.getOrElse(next, 0L) + f
          }
        }
        n += 1
      }
    }
    out.result()
  }

  /** One left-to-right non-overlapping pass of a single merge. Returns
    * the input vector itself (eq) when nothing merged.
    */
  private def mergeOnePass(
      syms: Vector[String], l: String, r: String, lr: String): Vector[String] = {
    var i = 0
    var hit = false
    while (!hit && i + 1 < syms.length) {
      if (syms(i) == l && syms(i + 1) == r) hit = true else i += 1
    }
    if (!hit) return syms
    val b = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        b += lr; j += 2
      } else { b += syms(j); j += 1 }
    }
    b.result()
  }

  /** Token count of one WORD: apply every merge in rank order, count
    * surviving symbols.
    */
  def wordTokenCount(word: String): Int = {
    var syms = byteSymbols(word)
    val totalHex = syms.length * 2 // invariant under merging
    merges.foreach { case (l, r) =>
      // a pair longer than the whole word can never apply — cheap skip
      if (l.length + r.length <= totalHex)
        syms = mergeOnePass(syms, l, r, l + r)
    }
    syms.length
  }

  /** Token count of a whole text (shared tokenization; empty text = 0). */
  def textTokenCount(text: String, memo: scala.collection.mutable.Map[String, Int]): Long = {
    var total = 0L
    wordsOf(text).foreach { w =>
      total += memo.getOrElseUpdate(w, {
        if (memo.size > (1 << 16)) memo.clear() // bound the per-executor memo
        wordTokenCount(w)
      })
    }
    total
  }
}
