package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the RefinedWeb/C4 front gate
  * (Penedo et al. 2023 §3.1; Raffel et al. 2020): before any text is
  * scored, a web corpus is filtered and capped by where it CAME from.
  * Per-document column algebra end to end (host parse, registered-domain
  * fold), so the whole gate runs at scan stage; the only shuffle is the
  * per-domain cap's count, keyed on the domain — the natural partition
  * key of a crawl.
  *
  * [[registeredDomain]] is the pragmatic eTLD+1: last two host labels,
  * except a built-in set of common two-level public suffixes (co.uk,
  * com.au, …) where it keeps three. The full public-suffix list is a data
  * file, not an algorithm — at production scale, broadcast-join the PSL
  * instead; every downstream operator here only sees a domain column and
  * does not care how it was derived.
  *
  * Host extraction is a single anchored regex shared VERBATIM with the
  * DuckDB oracle (both engines run RE2-compatible dialects), so the whole
  * pipeline is hash-oracled, not just row-counted.
  */
object UrlCuration {

  /** Two-level public suffixes folded by [[registeredDomain]]. */
  val TwoLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "co.in",
      "com.br", "co.za", "com.cn")

  /** The host-extraction regex — also the oracle's. Group 1 = authority
    * minus userinfo/port/path.
    */
  val HostRegex = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

  /** Lower-cased host of a URL; empty string when there is no scheme. */
  def host(url: Column): Column = lower(regexp_extract(url, HostRegex, 1))

  /** Registered domain (pragmatic eTLD+1) of a URL — see object doc. */
  def registeredDomain(url: Column): Column = {
    val parts = split(host(url), "\\.")
    val n = size(parts)
    val lastTwo = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val lastThree =
      concat_ws(".", element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(n >= 3 && lastTwo.isin(TwoLevelSuffixes: _*), lastThree)
      .when(n >= 2, lastTwo)
      .otherwise(host(url))
  }

  /** Drop documents whose registered domain is on a blocklist. The
    * blocklist (one `domain` column) is the broadcast side — bounded by
    * the same probe-guard pattern as the dedup drop lists: past
    * `maxBroadcastDomains` entries it degrades to a shuffle join rather
    * than a driver OOM.
    */
  def applyBlocklist(
      docs: DataFrame,
      urlCol: String,
      blocklist: DataFrame,
      maxBroadcastDomains: Int = 4000000): DataFrame = {
    // '' (the fold of every unparseable URL) is never a blockable domain —
    // a stray empty blocklist entry would otherwise drop the whole
    // unparseable slice of the corpus in one anti-join
    val bl = blocklist.select(lower(col("domain")).as("__bl_domain"))
      .where(col("__bl_domain") =!= "").distinct()
      .localCheckpoint(true) // probe + anti-join read one materialization
    val guarded =
      if (bl.limit(maxBroadcastDomains + 1).count() <= maxBroadcastDomains)
        broadcast(bl)
      else bl
    docs
      .withColumn("__domain", registeredDomain(col(urlCol)))
      .join(guarded, col("__domain") === col("__bl_domain"), "left_anti")
      .drop("__domain")
  }

  /** Keep at most `maxPerDomain` documents per registered domain, chosen
    * deterministically (md5 order on the id — the corpus-wide coin every
    * other sampler here uses). The anti-SEO cap: one link-farm domain with
    * 50M pages contributes `maxPerDomain` documents, not 50M. One shuffle
    * keyed on the domain; the rank-filter is the shape
    * `WindowTopKRewrite` turns into a bounded heap.
    */
  def domainCap(
      docs: DataFrame,
      urlCol: String,
      maxPerDomain: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(maxPerDomain >= 1, s"domainCap: maxPerDomain $maxPerDomain must be >= 1")
    val w = Window.partitionBy(col("__domain"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    // Schemeless/malformed URLs have no host; grouping them under the ''
    // domain would silently cap the whole unparseable slice of the corpus
    // at maxPerDomain. Give each such row its own per-id key instead —
    // they pass through uncapped (and the distinct keys also mean no hot
    // partition when a corpus is mostly unparseable).
    docs
      .withColumn("__domain",
        when(coalesce(host(col(urlCol)), lit("")) === "",
          concat(lit("__unparsed__:"), col(idCol).cast("string")))
          .otherwise(registeredDomain(col(urlCol))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerDomain)
      .drop("__domain", "__rn")
  }

  /** Canonical URL form — the Common-Crawl-style URL-dedup key. The same
    * page is crawled under fragment/tracking/case/port variants; folding
    * them BEFORE content dedup removes the cheapest duplicate class with
    * string algebra alone (no shingling, no signatures). Steps, each a
    * per-row regex/array operation in the Java∩RE2∩DuckDB dialect:
    *
    *   1. drop the fragment (`#…` never reaches the server),
    *   2. lowercase scheme + authority only (paths are case-sensitive),
    *   3. strip explicit default ports (`:80` on http, `:443` on https),
    *   4. drop tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`,
    *      `mc_cid`, `mc_eid`) and SORT the survivors — param order is
    *      not semantic, so `?a=1&b=2` ≡ `?b=2&a=1`,
    *   5. strip the lone trailing slash of a root path.
    *
    * Scan-stage, zero shuffle, trivially recomputable by an oracle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefixRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val lowered = concat(lower(regexp_extract(noFrag, prefixRe, 0)),
      regexp_replace(noFrag, prefixRe, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    val base = regexp_replace(noPort, "\\?.*$", "")
    val baseTrim =
      regexp_replace(base, "^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
    val query = regexp_extract(noPort, "\\?(.*)$", 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => length(p) > 0 &&
        !p.rlike("^(utm_[a-zA-Z]+|gclid|fbclid|ref|mc_cid|mc_eid)=")))
    when(size(keptParams) > 0,
      concat(baseTrim, lit("?"), array_join(keptParams, "&")))
      .otherwise(baseTrim)
  }

  /** URL-level dedup table: one row per canonical URL with its variant
    * count and the deterministic keeper (minimum id). One map-combined
    * shuffle on the canonical key — the cheapest dedup tier, run before
    * any content-based pass.
    */
  def urlDedup(
      docs: DataFrame,
      urlCol: String,
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keeper_id"))

  /** Scheme/host/path-shape features for URL-quality heuristics — pure
    * projection (path depth, query-string flag, port flag).
    */
  def urlFeatures(docs: DataFrame, urlCol: String): DataFrame =
    docs
      .withColumn("url_host", host(col(urlCol)))
      .withColumn("url_domain", registeredDomain(col(urlCol)))
      .withColumn("url_path",
        regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/[^?#]*)", 1))
      .withColumn("url_depth",
        when(col("url_path") === "", 0)
          .otherwise(size(split(col("url_path"), "/")) - 1).cast("long"))
      .withColumn("url_has_query", col(urlCol).contains("?"))
}
