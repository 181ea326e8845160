package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the stage-1
  * primitives of a crawl pipeline (RefinedWeb-style URL dedup, CCNet
  * domain bookkeeping): a crawl's URL column is the cheapest dedup and
  * quota key there is, but only after canonicalization — default
  * ports, `www.` prefixes, tracking parameters, and parameter order
  * all split one logical page across many raw spellings.
  *
  * Everything here is a pure Column expression (regex + array ops —
  * whole-stage codegen, no UDF), with exact DuckDB twins in the
  * WebQueries oracles. The rules implemented are the deliberately
  * conservative, engine-replayable core: lowercase host, strip the
  * scheme-default :443/:80 port and a leading `www.`, drop fragments,
  * drop `utm_*`/`ref`/`fbclid` tracking parameters, sort the
  * surviving query parameters. (Full RFC 3986 normalization — percent
  * decoding, dot-segment removal — belongs in a parser, not a regex;
  * the hook is this module.)
  */
object Urls {

  /** Raw authority: everything between `scheme://` and the first
    * `/`, `?` or `#` (may still carry a port). */
  def rawHost(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)

  /** Canonical host: lowercased, scheme-default port stripped,
    * leading `www.` stripped. */
  def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(rawHost(url)), ":(443|80)$", ""),
      "^www\\.", "")

  /** Registered domain (eTLD+1 under the fixture's single-label
    * public suffixes): the last two dot-labels of the canonical
    * host — the per-site key domain caps and crawl politeness use.
    * A production deployment swaps in the public-suffix list here;
    * the grouping algebra downstream is unchanged. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Path component (no query/fragment), empty string when absent. */
  def pathOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Canonical query: fragment dropped, `utm_*`/`ref`/`fbclid`
    * tracking parameters removed, survivors sorted and re-joined —
    * empty string when nothing survives. */
  def canonicalQuery(url: Column): Column =
    array_join(
      array_sort(filter(
        split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("ref=") ||
          p.startsWith("fbclid=") || p === ""))),
      "&")

  /** Full canonical URL (scheme pinned to https — the fixture's only
    * scheme; a production table keeps the scheme column alongside). */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(lit("https://"), canonicalHost(url), pathOf(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
