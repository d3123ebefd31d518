package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level quality filtering — the C4/RefinedWeb-style curation
  * gate applied before any per-document text analysis: extract each
  * document's source host and REGISTERED domain (the unit blocklists and
  * per-domain quotas operate on), then drop documents whose registered
  * domain appears on a blocklist.
  *
  * Registered-domain extraction is the eTLD+1 rule: the last label pair,
  * or the last THREE labels when the final pair is itself a two-part
  * public suffix (`co.uk`, `com.au`, …). The embedded suffix set is a
  * deliberately small, commonly-hit subset of the public-suffix list —
  * the full PSL is a runtime data file a deployment supplies via
  * `twoPartSuffixes`; the extraction logic is suffix-set-agnostic.
  *
  * Scale shape: extraction is pure per-row projection (codegen'd regex +
  * array ops, shuffle-free); the blocklist filter is ONE anti-join whose
  * right side is a domain list — even multi-million-domain lists are tens
  * of MB, so AQE broadcasts them and the corpus never shuffles. No hint
  * is forced (the [[Retrieval.tfidfTopTerms]] lesson): a pathological
  * blocklist beyond the broadcast threshold degrades to a shuffle join
  * instead of OOMing the driver.
  */
object UrlFilter {

  /** Two-part public suffixes recognized by [[registeredDomain]] by
    * default (PSL subset; see object doc).
    */
  val DefaultTwoPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.za", "com.br", "com.cn",
    "com.mx", "com.tr", "co.kr", "co.nz")

  /** Lowercased host of a URL: the authority minus any userinfo/port.
    * Null when the value has no `scheme://host` shape.
    */
  def host(url: Column): Column = {
    val authority = regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    val noUser = element_at(split(authority, "@"), -1)
    val noPort = element_at(split(noUser, ":"), 1)
    when(length(noPort) > 0, noPort)
  }

  /** Registered domain (eTLD+1) of a URL: last two host labels, or last
    * three when the trailing pair is a two-part suffix. Null for null /
    * unparseable URLs.
    */
  def registeredDomain(url: Column,
                       twoPartSuffixes: Seq[String] = DefaultTwoPartSuffixes): Column = {
    val labels = split(host(url), "\\.")
    def lastN(n: Int): Column =
      concat_ws(".", slice(labels, greatest(size(labels) - (n - 1), lit(1)), lit(n)))
    when(host(url).isNotNull,
      when(size(labels) >= 3 && lastN(2).isin(twoPartSuffixes: _*), lastN(3))
        .otherwise(lastN(2)))
  }

  /** RefinedWeb-style per-domain quota: keep at most `maxPerDomain`
    * documents per registered domain, picked by ascending `tieCol`
    * (deterministic; typically the doc id or a quality rank). Adds
    * `registered_domain` and `domain_rank` (1-based within the domain)
    * to the survivors; unparseable URLs share the null-domain group and
    * are capped like any other.
    *
    * Skew is the whole problem at corpus scale — one mega-domain can
    * hold 10⁸ documents, and a naive per-domain `row_number` sorts all
    * of them in ONE task. This runs the standard salted two-phase
    * top-N instead: phase 1 ranks within (domain, hash(tie) % salt)
    * partitions — bounding any task at rows/salt — and keeps each
    * partition's top `maxPerDomain`; phase 2 ranks the ≤ salt·N
    * survivors per domain. The global top-N is a subset of the union
    * of partial top-Ns, so the result is identical to the single-phase
    * window.
    */
  def capPerDomain(docs: DataFrame, urlCol: String, maxPerDomain: Int,
                   tieCol: String, salt: Int = 64,
                   twoPartSuffixes: Seq[String] = DefaultTwoPartSuffixes): DataFrame = {
    require(maxPerDomain > 0 && salt > 0, "maxPerDomain and salt must be positive")
    val w1 = Window
      .partitionBy(col("registered_domain"), pmod(hash(col(tieCol)), lit(salt)))
      .orderBy(col(tieCol))
    val w2 = Window.partitionBy(col("registered_domain")).orderBy(col(tieCol))
    docs
      .withColumn("registered_domain", registeredDomain(col(urlCol), twoPartSuffixes))
      .withColumn("_pr", row_number().over(w1))
      .where(col("_pr") <= maxPerDomain)
      .withColumn("domain_rank", row_number().over(w2))
      .where(col("domain_rank") <= maxPerDomain)
      .drop("_pr")
  }

  /** Drop rows whose registered domain is on `blocklist` (a one-column
    * frame of registered domains, any column name; entries lowercased).
    * Adds `host` and `registered_domain` columns to the survivors.
    * Unparseable URLs carry a null domain and SURVIVE — domain hygiene
    * is a different gate from URL validity.
    */
  def filterBlockedDomains(docs: DataFrame, urlCol: String,
                           blocklist: DataFrame,
                           twoPartSuffixes: Seq[String] = DefaultTwoPartSuffixes): DataFrame = {
    val block = blocklist
      .select(lower(trim(col(blocklist.columns.head))).as("registered_domain"))
      .distinct()
    docs
      .withColumn("host", host(col(urlCol)))
      .withColumn("registered_domain", registeredDomain(col(urlCol), twoPartSuffixes))
      .join(block, Seq("registered_domain"), "left_anti")
  }

  /** Tracking query parameters stripped by [[canonicalizeUrl]] — the
    * common redirect/analytics noise that makes one page crawl as many
    * URLs (utm_* campaign tags, Facebook/Google click ids, bare ref).
    */
  private val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** URL canonicalization — the crawl-frontier dedup rule: the same
    * page arrives under byte-different URLs (case-shifted scheme/host,
    * explicit default port, trailing slash, tracking parameters,
    * fragments, shuffled query order), and fetching each variant wastes
    * crawl budget while near-dup dedup later pays to re-discover the
    * duplication. Normalizes, in order: drop the `#fragment`; lowercase
    * scheme+host and strip an explicit `:80`/`:443`; strip one trailing
    * slash from the path; drop tracking parameters
    * ([[TrackingParamPattern]]) and sort the survivors byte-wise.
    * Everything is regex/array arithmetic identical in the driver
    * oracle — no `parse_url` (whose edge-case semantics the oracle
    * engine cannot replay). Shuffle-free per-row map work.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = regexp_extract(noFrag, "^[^/]*://[^/?]*", 0)
    val prefixNorm = regexp_replace(lower(prefix), ":(80|443)$", "")
    val rest = noFrag.substr(length(prefix) + lit(1), length(noFrag))
    val path = regexp_replace(regexp_extract(rest, "^[^?]*", 0), "/$", "")
    val q = regexp_extract(rest, "^[^?]*\\?(.*)", 1)
    val kept = filter(split(q, "&"),
      p => !(p.rlike(TrackingParamPattern) || p === lit("")))
    val qNorm = array_join(array_sort(kept), "&")
    concat(prefixNorm, path,
      when(qNorm === "", lit("")).otherwise(concat(lit("?"), qNorm)))
  }

  /** Group-by-canonical dedup over [[canonicalizeUrl]]: one hash
    * aggregate on the canonical string (min-id canonical row, variant
    * count) — the [[graft.operators.Dedup.exactGroups]] shape applied
    * to the URL axis.
    */
  def canonicalGroups(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_urls"))

  /** Crawl politeness scheduler — the frontier-planning step between
    * URL dedup and fetching: a crawler must serialize requests to one
    * host (`delaySeconds` apart, the robots crawl-delay contract) while
    * keeping all workers busy, so every host is pinned to ONE worker
    * (an md5 coin on the registered domain — host affinity is what
    * makes the per-host delay enforceable without coordination) and a
    * host's k-th URL (ascending `tieCol`) fetches at offset
    * k·delaySeconds on that worker. Emits per-URL
    * (`tieCol`, `registered_domain`, `worker`, `slot_seconds`) — the
    * deterministic fetch plan; per-worker makespan is its max slot.
    *
    * One window per domain (bounded by the domain's URL count — cap
    * with [[capPerDomain]] first, as production frontiers do) and
    * map-local hashing: nothing global, nothing quadratic.
    */
  def politenessSchedule(docs: DataFrame, urlCol: String, tieCol: String,
                         delaySeconds: Long, workers: Int): DataFrame = {
    require(delaySeconds >= 1 && workers >= 1, "need delaySeconds >= 1 and workers >= 1")
    val w = Window.partitionBy(col("registered_domain")).orderBy(col(tieCol))
    docs
      .withColumn("registered_domain", registeredDomain(col(urlCol)))
      .withColumn("worker",
        pmod(graft.plans.Md5Prefix.of(col("registered_domain"), 6),
          lit(workers.toLong)))
      .withColumn("slot_seconds",
        (row_number().over(w).cast("long") - 1L) * delaySeconds)
      .select(col(tieCol), col("registered_domain"), col("worker"), col("slot_seconds"))
  }
}
