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
  * surviving query parameters, percent-decode the UNRESERVED
  * characters (RFC 3986 §2.3 — the decode that never changes meaning;
  * reserved escapes like %2F stay encoded because decoding them
  * would). Dot-segment removal remains a parser's job; the hook is
  * this module.
  */
object Urls {

  /** The percent-decode table the DuckDB oracle twin is generated
    * from: every unreserved character, its uppercase-hex escape, and
    * the lowercase-hex variant where the two differ. The Spark side
    * decodes in ONE pass ([[graft.expressions.PctDecodeUnreserved]] —
    * one plan node, codegen); the oracle replays this exact table as a
    * nested replace chain, innermost first. PropertySpec pins the two
    * spellings equal. */
  private[graft] val pctDecodeTable: Seq[(String, String)] = {
    val unreserved =
      (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
    unreserved.flatMap { ch =>
      val hex = f"${ch.toInt}%02X"
      Seq(hex, hex.toLowerCase).distinct.map(v => (s"%$v", ch.toString))
    }
  }

  /** Percent-decode unreserved escapes — a single codegen'd pass. Safe
    * on the WHOLE url before parsing: unreserved decodes can never
    * create a delimiter (all delimiters are reserved). */
  def pctDecode(url: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.PctDecodeUnreserved(
      ColumnBridge.expression(url)))
  }

  /** [[pctDecode]]'s DuckDB twin over a SQL expression string: the
    * generated nested-replace chain (innermost = first table entry).
    * Sequential replaces equal the single-pass decode on
    * validly-encoded input (escapes never overlap, replacements never
    * create '%'); the fixtures and property generators stay within
    * that grammar. */
  def pctDecodeSql(expr: String): String =
    pctDecodeTable.foldLeft(expr) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }

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
    * scheme; a production table keeps the scheme column alongside).
    * Unreserved percent-escapes are decoded FIRST, on the whole url —
    * producers that differ only in `%7E` vs `~` spelling collapse to
    * one canonical page — then host/path/query normalize as before
    * (the decode can't create a delimiter, so parsing after it is
    * sound). */
  def canonicalize(url: Column): Column = {
    val u = pctDecode(url)
    val q = canonicalQuery(u)
    concat(lit("https://"), canonicalHost(u), pathOf(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
