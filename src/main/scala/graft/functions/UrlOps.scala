package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the frontier-dedup normalization every crawl
  * pipeline runs before URL-level dedup and host aggregation (Common
  * Crawl's URL index stores exactly these canonical forms): lowercase
  * scheme and host, drop the default port (http:80 / https:443),
  * drop the fragment, collapse an empty path to '/', strip trailing
  * path slashes (non-root), and sort query parameters so param order
  * never splits a URL's identity.
  *
  * Built entirely from split_part / array primitives both engines
  * share, so the oracle replays every byte. Pure per-row Column work —
  * no UDF, no shuffle.
  */
object UrlOps {

  private def fragless(u: Column) = split_part(u, lit("#"), lit(1))
  private def schemeOf(u: Column) = lower(split_part(fragless(u), lit("://"), lit(1)))
  private def restOf(u: Column) =
    substring(fragless(u), length(split_part(fragless(u), lit("://"), lit(1))) + 4, lit(1000000))
  private def preQ(u: Column) = split_part(restOf(u), lit("?"), lit(1))
  private def queryOf(u: Column) = split_part(restOf(u), lit("?"), lit(2))
  private def hostportOf(u: Column) = split_part(preQ(u), lit("/"), lit(1))

  /** Lowercased host without the port. */
  def urlHost(u: Column): Column = lower(split_part(hostportOf(u), lit(":"), lit(1)))

  /** The last two host labels — the registrable-domain approximation
    * (a public-suffix list would refine it; the aggregation shape is
    * identical). Single-label hosts pass through. */
  def registeredDomain(u: Column): Column = {
    val labels = split(urlHost(u), "\\.")
    when(size(labels) >= 2, array_join(slice(labels, -2, 2), "."))
      .otherwise(urlHost(u))
  }

  /** The host's dot-suffix chain: "cdn.media.ex2.org" ->
    * ["cdn.media.ex2.org", "media.ex2.org", "ex2.org", "org"] — the
    * bounded (label-count) candidate set for domain-blocklist matching
    * with subdomain semantics. Pure per-row array work. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
  }

  /** Domain-blocklist filter with subdomain suffix matching — the UT1 /
    * adult-and-malware-list gate every web-crawl curation stack runs
    * (C4, RefinedWeb and FineWeb all filter on URL blocklists): a host
    * is blocked when ANY dot-suffix of it equals a blocklist entry, so
    * listing "ex2.org" blocks every subdomain without enumerating them.
    *
    * Scale shape: the host side expands to its suffix chain (bounded by
    * label count, <= ~6 for real hosts) and meets the blocklist in a
    * BROADCAST equi-join — real blocklists are millions of rows but MBs
    * of bytes (UT1 ~3M domains ~60 MB), squarely broadcastable; the
    * match result (doc_id, hit) is grouped to one row per blocked doc
    * (min(hit) for a deterministic representative) and left-joined back
    * doc-keyed. Document text/payload columns never shuffle. For a
    * config-sized literal list, prefer the pure-projection form
    * (filter(hostSuffixes, isin(...)) — zero joins); this operator is
    * the production shape where the blocklist is a TABLE.
    *
    * Output: every input column plus blocked (0/1 long) and hit (the
    * lexicographically-least matched suffix, '' when clean). */
  def blocklistFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
      hostCol: String, blocklist: org.apache.spark.sql.DataFrame,
      domainCol: String): org.apache.spark.sql.DataFrame = {
    val hits = docs
      .select(col(idCol), explode(hostSuffixes(col(hostCol))).as("sfx"))
      .join(broadcast(blocklist.select(col(domainCol).as("sfx"))), "sfx")
      .groupBy(idCol)
      .agg(min(col("sfx")).as("hit"))
    docs.join(hits, Seq(idCol), "left")
      .withColumn("blocked", col("hit").isNotNull.cast("long"))
      .withColumn("hit", coalesce(col("hit"), lit("")))
  }

  /** Canonical form (see object doc). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = schemeOf(u)
    val host = urlHost(u)
    val port = split_part(hostportOf(u), lit(":"), lit(2))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = substring(preQ(u), length(hostportOf(u)) + 1, lit(1000000))
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val q = queryOf(u)
    val qSorted = array_join(array_sort(split(q, "&")), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), qSorted)).otherwise(lit("")))
  }
}
