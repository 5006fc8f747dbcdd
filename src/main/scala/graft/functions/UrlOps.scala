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
