package graft.ext

/** A fasttext-style hashed linear quality classifier for training-data
  * filtering: unigram tokens hash into `Buckets` feature buckets, a
  * logistic model over bucket counts separates prose from junk, and a
  * document's score is the exact INTEGER sum of e6-scaled bucket
  * weights over its token occurrences plus the bias — no floats at
  * scoring time, so both engines produce identical bigints.
  *
  * The model is trained ONCE, deterministically, at class init: plain
  * gradient-descent logistic regression in driver Scala over embedded
  * seed documents (coherent prose = positive, spam/gibberish/keyword
  * stuffing = negative), then weights round to e6 fixed point. The
  * oracle renders its weights from THIS object, so the twins cannot
  * drift. Heuristic quality scoring (`TextAnalysis.qualityScore`,
  * gopher rules) measures surface statistics; this is the model-based
  * complement (CCNet/fasttext's role in real pipelines), at toy seed
  * scale but with the production plan shape: per-row codegen'd scan,
  * no shuffle.
  *
  * Tokenization and hashing are the repo's shared cross-engine idioms:
  * `lower(trim(text))` split on whitespace; bucket =
  * `('0x' || substr(md5(tok), 1, 15))::BIGINT % Buckets`.
  */
object QualityModel {

  val Buckets = 1024

  val goodSeeds: Seq[String] = Seq(
    "the committee met on tuesday to review the proposal and agreed " +
      "that the budget should be revised before the end of the quarter",
    "she spent the morning reading about the history of the city and " +
      "took careful notes on the buildings that survived the fire",
    "after the storm passed the farmers walked their fields to check " +
      "the young plants and found that most of them had survived",
    "the study followed two hundred patients over five years and found " +
      "a modest improvement in outcomes for the treated group",
    "he explained that the bridge had been closed for repairs and that " +
      "traffic would be routed through the northern part of town",
    "the recipe calls for two cups of flour a pinch of salt and enough " +
      "cold water to bring the dough together into a smooth ball",
    "in the evening they sat on the porch and talked about the harvest " +
      "while the children played in the yard until the light faded",
    "the report describes how the new system reduced processing time " +
      "by nearly half while keeping error rates at historical lows",
    "when the train finally arrived the platform was crowded with " +
      "travelers carrying luggage and looking for their connections",
    "the museum opened a new exhibit about early navigation and the " +
      "instruments sailors used to find their way across the ocean",
    "researchers observed the colony for three seasons and documented " +
      "how the birds adjusted their nesting sites after the flood",
    "the council voted to expand the library hours and to fund a small " +
      "program that teaches reading to adults in the community",
    "his letter described the long journey through the mountains and " +
      "the kindness of the families who offered them shelter",
    "the company announced that the factory would add a second shift " +
      "and hire eighty workers from the surrounding villages",
    "a gentle rain fell through the night and by morning the river had " +
      "risen just enough to cover the stones along the bank")

  val badSeeds: Seq[String] = Seq(
    "buy cheap buy cheap buy cheap best price best price click here " +
      "click here click here limited offer limited offer act now",
    "winner winner you are a winner claim your prize claim your prize " +
      "free bonus free bonus casino casino casino jackpot jackpot",
    "asdkfj qwelrj zxcmv blorp qqqq wkeje sdlkfj eiounm vvbnm plokij " +
      "mnbvc xswed frtgb yhnuj ikolp qazwsx edcrfv tgbyhn",
    "cheap watches cheap bags cheap shoes replica replica replica " +
      "discount discount wholesale wholesale free shipping free shipping",
    "subscribe subscribe like and subscribe smash that button follow " +
      "follow follow link in bio link in bio promo code promo code",
    "xjq zpf wvv qqq kkk jjj dddd ssss aaaa bbbb cccc eeee ffff gggg " +
      "hhhh iiii llll mmmm nnnn oooo pppp rrrr tttt uuuu",
    "best seo best seo top ranking top ranking keywords keywords " +
      "traffic traffic backlinks backlinks cheap hosting cheap hosting",
    "win big win big no deposit no deposit bonus spins bonus spins " +
      "play now play now lucky lucky lucky jackpot city jackpot city",
    "qwerty uiop asdf ghjkl zxcv bnm qwerty uiop asdf ghjkl zxcv bnm " +
      "qwerty uiop asdf ghjkl zxcv bnm qwerty uiop asdf ghjkl",
    "free iphone free iphone enter now enter now survey survey gift " +
      "card gift card instant cash instant cash no risk no risk",
    "lkjhg fdsa poiuy trewq mnbvcx zlkjh gfdsa qpwoe irutyt lakjsd " +
      "fhgkq zmxnc bvlaks djfhg qpzmw oxnieb rvtyua",
    "hot deals hot deals flash sale flash sale today only today only " +
      "dont miss dont miss lowest price lowest price guaranteed",
    "viral trick doctors hate this one weird trick lose weight fast " +
      "lose weight fast miracle cure miracle cure secret revealed",
    "zzz zzz zzz aaa aaa aaa 111 111 222 222 333 333 444 444 555 555 " +
      "666 666 777 777 888 888 999 999 000 000",
    "earn money from home earn money from home easy cash easy cash " +
      "work from home work from home passive income passive income")

  /** Spark-parity tokenization: trim SPACES (Spark's `trim`), lower,
    * split on whitespace runs with limit -1 — Spark's `split` and
    * DuckDB's `regexp_split_to_array` both KEEP leading/trailing empty
    * tokens (text ending in a tab splits to [..., ""]), so the scorer
    * must too or the twins drift on exactly that text. This is THE
    * tokenization — training and the scoring kernel both call it, so
    * they cannot desynchronize.
    */
  def tokensOf(s: String): Array[String] = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b).toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Shared cross-engine hash:
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT % Buckets` — the first
    * 15 hex chars are the digest's high 60 bits. THE bucket function:
    * training and scoring both call it (thread-local digest; per-call
    * allocation would be measurable on the per-row scan).
    */
  def bucketOf(tok: String): Int = {
    val d = md5Local.get().digest(tok.getBytes("UTF-8"))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    ((h >>> 4) % Buckets).toInt
  }

  /** (weightsE6 indexed by bucket, biasE6) — trained once at init. */
  lazy val (weightsE6, biasE6): (Array[Long], Long) = {
    val docs: Seq[(Array[Int], Double)] =
      goodSeeds.map(t => (tokensOf(t).map(bucketOf).toArray, 1.0)) ++
        badSeeds.map(t => (tokensOf(t).map(bucketOf).toArray, 0.0))
    val w = new Array[Double](Buckets)
    var bias = 0.0
    val lr = 0.1
    val l2 = 1e-4
    for (_ <- 1 to 300; (bs, y) <- docs) {
      var z = bias
      var i = 0
      while (i < bs.length) { z += w(bs(i)); i += 1 }
      val p = 1.0 / (1.0 + math.exp(-z))
      val g = p - y
      i = 0
      while (i < bs.length) {
        val b = bs(i); w(b) -= lr * (g + l2 * w(b)); i += 1
      }
      bias -= lr * g
    }
    (w.map(x => math.round(x * 1e6)), math.round(bias * 1e6))
  }

  /** Nonzero (bucket, weightE6) pairs — what the oracle renders. */
  def nonZeroWeights: Seq[(Int, Long)] =
    weightsE6.zipWithIndex.collect { case (w, b) if w != 0L => (b, w) }
}
