package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain filtering — the provenance gate every web-scale
  * training-data pipeline runs before anything expensive: extract the
  * hostname, reduce it to the registrable domain (public-suffix-aware,
  * so `news.bbc.co.uk` blocks with `bbc.co.uk`, not `co.uk`), and
  * anti-join a blocklist.
  *
  * Scale posture: hostname/domain extraction is per-row codegen'd string
  * work (no UDF); the blocklist is tiny by nature so the anti-join is an
  * explicit `broadcast()` — the corpus never shuffles. The suffix list
  * here is a compact embedded subset of the Public Suffix List; swap in
  * the full PSL as a broadcast lookup for production coverage.
  */
object UrlOps {

  /** Multi-label public suffixes (PSL subset): a registrable domain is
    * one label deeper than its public suffix.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.nz", "co.kr", "co.id", "co.th")

  /** Lowercased hostname of a URL (empty string when not a URL). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** Public-suffix-aware registrable domain of a hostname: the last two
    * labels normally, the last three when the trailing two form a
    * multi-part public suffix (`co.uk` etc.); a bare or single-label
    * host is returned as-is.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 2, host)
      .when(array_contains(typedLit(MultiPartSuffixes), last2) && n >= 3, last3)
      .otherwise(last2)
  }

  /** Rows of `df` whose URL's registrable domain is NOT on the
    * blocklist, annotated with `host` and `domain`. The blocklist (one
    * `domain` string column) is broadcast — the big side never moves.
    */
  def filterByBlocklist(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val annotated = df
      .withColumn("host", hostOf(col(urlCol)))
      .withColumn("domain", registrableDomain(col("host")))
    annotated.join(
      broadcast(blocklist.select(lower(col("domain")).as("domain"))),
      Seq("domain"), "left_anti")
  }
}
