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

  /** The Public Suffix List slice the engine ships as its fixture
    * table (r14 — replacing the last-two-labels heuristic, which a
    * real crawl user hits immediately: example.co.uk grouped as
    * "co.uk" merges every UK site into one cap bucket). Real PSL
    * entries, including the multi-label rules that carry the weight —
    * and, as of r15, the two non-plain rule FORMS the real PSL grammar
    * has: a wildcard rule (`*.ck` — every label directly under .ck is
    * itself a public suffix) and its exception (`!www.ck` — www.ck is
    * registrable despite the wildcard), so a production swap to the
    * full ~9k-rule list carries no silent semantic gap. All three
    * spellings implement all three rule forms — the
    * [[registeredDomainPsl]] when-chain while the list is
    * literal-sized, the [[graft.expressions.RegisteredDomainPsl]]
    * plan-node for the streaming keyers, the op317 broadcast-dim join
    * always. */
  val publicSuffixSlice: Seq[String] = Seq(
    "com", "org", "net", "io", "uk",
    "co.uk", "org.uk", "com.au", "co.jp", "github.io",
    "*.ck", "!www.ck")

  /** Rule-form accessors shared by every spelling (ONE definition so
    * the engines cannot disagree on what a rule means). */
  private[graft] def isException(rule: String): Boolean =
    rule.startsWith("!")
  private[graft] def isWildcard(rule: String): Boolean =
    rule.startsWith("*.")

  /** Match ordering the PSL defines: exception rules beat everything,
    * then more labels win (a wildcard's `*` counts as a label), then
    * longer, then lexicographic (a total order so both engines and all
    * three spellings agree). */
  private[graft] def pslOrdered(suffixes: Seq[String]): Seq[String] =
    suffixes.sortBy(s =>
      (if (isException(s)) 0 else 1, -s.count(_ == '.'), -s.length, s))

  private def escRegex(s: String): String = s.replace(".", "\\.")

  /** Registered domain (eTLD+1) under a public-suffix table, all three
    * PSL rule forms:
    *  - plain rule `s`: hosts ending `.s` → one preceding label + `s`;
    *  - wildcard rule `*.t`: any single non-empty label directly under
    *    `t` is a public suffix, so hosts ending `.<label>.t` → one
    *    further preceding label + `<label>.t`;
    *  - exception rule `!b`: overrides any wildcard/plain match — a
    *    host equal to or ending in `.b` has registered domain `b`
    *    itself (the rule body minus nothing: PSL defines the public
    *    suffix as `b` minus its leftmost label, so registered = `b`).
    * Hosts matching no rule fall back to the last two labels (the
    * PSL's implicit "*" rule for unknown TLDs). A host that IS a
    * public suffix has no registered domain under the PSL; this
    * spelling returns its shortest matching cover (suffix + 0 labels
    * is inexpressible in one extract) — the crawl-side callers never
    * group by a bare suffix because no document URL lives there. */
  def registeredDomainPsl(host: Column,
      suffixes: Seq[String] = publicSuffixSlice): Column = {
    val matches = pslOrdered(suffixes).map {
      case r if isException(r) =>
        val b = r.substring(1)
        when(host === b || host.endsWith("." + b), lit(b))
      case r if isWildcard(r) =>
        val t = r.substring(2)
        // the `*` label must be non-empty (PSL labels are), mirrored by
        // the procedural spelling; the extract's [^.]+ additionally
        // yields '' when the REGISTRABLE label is empty/missing — the
        // same '' convention as the plain-rule branch
        when(host.rlike("\\.[^.]+\\." + escRegex(t) + "$"),
          regexp_extract(host,
            "([^.]+\\.[^.]+\\." + escRegex(t) + ")$", 1))
      case s =>
        when(host.endsWith("." + s),
          regexp_extract(host, "([^.]+\\." + escRegex(s) + ")$", 1))
    }
    coalesce(matches :+ regexp_extract(host, "([^.]+\\.[^.]+)$", 1): _*)
  }

  /** [[registeredDomainPsl]]'s DuckDB twin over a SQL expression
    * string — the same slice, same match order, same rule forms, same
    * two-label fallback, generated from one table so the engines
    * cannot drift. */
  def registeredDomainPslSql(hostExpr: String,
      suffixes: Seq[String] = publicSuffixSlice): String = {
    val whens = pslOrdered(suffixes).map {
      case r if isException(r) =>
        val b = r.substring(1)
        s"WHEN ($hostExpr = '$b' OR $hostExpr LIKE '%.$b') THEN '$b'"
      case r if isWildcard(r) =>
        val t = r.substring(2)
        s"WHEN regexp_matches($hostExpr, '\\.[^.]+\\.${escRegex(t)}$$') " +
          s"THEN regexp_extract($hostExpr, " +
          s"'([^.]+\\.[^.]+\\.${escRegex(t)})$$', 1)"
      case s =>
        s"WHEN $hostExpr LIKE '%.$s' THEN " +
          s"regexp_extract($hostExpr, '([^.]+\\.${escRegex(s)})$$', 1)"
    }
    s"(CASE ${whens.mkString(" ")} ELSE " +
      s"regexp_extract($hostExpr, '([^.]+\\.[^.]+)$$', 1) END)"
  }

  /** Registered domain of a canonical host — the per-site key domain
    * caps and crawl politeness use. PSL-driven as of r14, evaluated as
    * ONE plan node ([[graft.expressions.RegisteredDomainPsl]] over
    * [[publicSuffixSlice]] — the streaming admission keyers re-analyze
    * their plan every micro-batch, so a per-rule when-chain is the
    * wrong shape there, and at the full ~9k-rule PSL it would be
    * thousands of nodes; WebSpec pins the expression equal to the
    * [[registeredDomainPsl]] when-chain including the malformed-host
    * edge cases). On single-label-suffix hosts (the synthetic
    * fixture's .com world) this equals the old last-two-labels
    * heuristic, which is why the op308/op309/op311/op315 oracles keep
    * their two-label regex twin — the multi-label path is oracle-gated
    * by op317. */
  def registeredDomain(host: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.RegisteredDomainPsl(
      ColumnBridge.expression(host), publicSuffixSlice))
  }

  /** Path component (no query/fragment), empty string when absent. */
  def pathOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Dot-segment removal rules (RFC 3986 §5.2.4) as engine-neutral
    * regex rewrites, applied in order: "/./" collapses, a leading
    * "/../" drops at root (the RFC's rule), and "segment/../" cancels.
    * The cancel rule's segment must EXCLUDE "." and ".." (a bare
    * [^/]+ lets ".." cancel ".." — RFC-wrong: "/a/b/../../x" must pop
    * b then a, never fuse the two pops) — and RE2 has no lookahead, so
    * the exclusion is spelled as an alternation: starts with a
    * non-dot, or "." + non-dot + rest, or ".." + at least one more
    * char. No replacement backreferences — Spark spells them `$1`,
    * RE2 `\\1`, so the shared table must avoid them. One pass removes
    * ONE nesting level (the scan resumes after each match), hence the
    * bounded fold below. */
  private val seg = "(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
  private[graft] val dotSegmentRules: Seq[(String, String)] = Seq(
    "/\\./" -> "/",
    "/\\.$" -> "/",
    "^/\\.\\./" -> "/",
    "^/\\.\\.$" -> "/",
    // an EMPTY segment pops like any other (RFC's stack treats "" as a
    // segment: "/a//../x" → "/a/x") — spelled separately because `seg`
    // requires a non-empty, non-dot segment
    "//\\.\\./" -> "/",
    "//\\.\\.$" -> "/",
    s"/$seg/\\.\\./" -> "/",
    s"/$seg/\\.\\.$$" -> "/")

  /** Remove dot segments from a path — the LAST Urls normalization
    * hook (r13 verdict "missing" item 2), closed as a bounded fold of
    * [[dotSegmentRules]]: `iters` passes normalize any path with up to
    * `iters` nesting levels of `..` (deeper paths keep residue — a
    * crawl policy bounds path depth long before that; raise `iters`
    * where it doesn't). Exactly mirrored by [[removeDotSegmentsSql]]
    * from the same table at the same bound, so the engines agree on
    * EVERY input, normalized or residual. */
  def removeDotSegments(path: Column, iters: Int = 4): Column =
    (1 to iters).foldLeft(path) { (p, _) =>
      dotSegmentRules.foldLeft(p) { case (c, (pat, rep)) =>
        regexp_replace(c, pat, rep)
      }
    }

  /** [[removeDotSegments]]'s DuckDB twin over a SQL expression. */
  def removeDotSegmentsSql(e: String, iters: Int = 4): String =
    (1 to iters).foldLeft(e) { (p, _) =>
      dotSegmentRules.foldLeft(p) { case (c, (pat, rep)) =>
        s"regexp_replace($c, '$pat', '$rep', 'g')"
      }
    }

  /** Relative-reference resolution (RFC 3986 §5.2) — the crawl-stack
    * hook between anchor extraction and canonicalization: real pages
    * link with relative hrefs ("x/../y", "./z", "/p/k/v", "//host/p",
    * "?id=3", ""), and every downstream stage (link graph, rank,
    * anchor index, URL dedup) needs them resolved against the page's
    * own URL first. Pure Column composition of the existing pieces —
    * merge-paths (§5.2.3) + [[removeDotSegments]] (§5.2.4) over the
    * base components [[pathOf]]/[[rawHost]] already extract — with the
    * exact generated twin [[resolveSql]], so both engines resolve
    * identically (WebSpec pins the RFC §5.4 reference-resolution
    * examples). Grammar bounds, both engines: base is absolute with an
    * authority (`scheme://host...`, the only shape the corpus stores),
    * absolute refs use `scheme://` (no opaque `scheme:` forms), and
    * fragments never survive (the corpus convention canonicalize
    * already applies — §5.4's fragment-carrying examples resolve to
    * their fragment-less target). Dot segments are removed in EVERY
    * branch, including an already-absolute ref (§5.2.2 does, and
    * that's what makes resolution idempotent). */
  /** [[removeDotSegments]] behind a one-regex guard: the bounded fold
    * is 32 regexp_replace scans per evaluation, and most crawl paths
    * carry NO dot segments — skip the chain unless a "." or ".."
    * SEGMENT exists (every path here starts with '/' or is empty, so
    * a segment-initial dot always follows a '/'; the fold is the
    * identity exactly when the guard is false). The SQL twin stays
    * UNguarded on purpose: a guard bug on the Spark side would surface
    * as an oracle hash mismatch instead of hiding behind a mirrored
    * guard. */
  private def normIfDotted(p: Column): Column =
    when(p.rlike("/\\.\\.?(/|$)"), removeDotSegments(p)).otherwise(p)

  def resolve(base: Column, ref: Column): Column = {
    val r = regexp_replace(ref, "#.*$", "")
    val scheme = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    val schemeAuth =
      regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    val basePath = pathOf(base)
    val baseQ = regexp_extract(base, "(\\?[^#]*)", 1)
    val refPath = regexp_extract(r, "^([^?]*)", 1)
    val refQ = regexp_extract(r, "(\\?.*)$", 1)
    // merge (§5.2.3): base path up to its last '/', or '/' when the
    // base path is empty (an authority is always present here)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    val dir = when(baseDir === "", lit("/")).otherwise(baseDir)
    when(r.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
      concat(regexp_extract(r, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1),
        normIfDotted(pathOf(r)), refQ))
      .when(r.startsWith("//"),
        concat(scheme, lit(":"), regexp_extract(r, "^(//[^/?#]+)", 1),
          normIfDotted(regexp_extract(r, "^//[^/?#]+([^?#]*)", 1)),
          refQ))
      .when(r.startsWith("/"),
        concat(schemeAuth, normIfDotted(refPath), refQ))
      .when(r.startsWith("?"), concat(schemeAuth, basePath, r))
      .when(r === "", concat(schemeAuth, basePath, baseQ))
      .otherwise(
        concat(schemeAuth, normIfDotted(concat(dir, refPath)), refQ))
  }

  /** [[resolve]]'s DuckDB twin over two SQL expression strings — the
    * same branch structure, regexes and dot-segment chain, generated
    * so the engines cannot drift. `baseE`/`refE` are interpolated
    * several times: pass simple column references (or pre-bind a CTE
    * column), not expensive subexpressions. */
  def resolveSql(baseE: String, refE: String): String = {
    val r = s"regexp_replace($refE, '#.*$$', '')"
    val scheme = s"regexp_extract($baseE, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)"
    val schemeAuth =
      s"regexp_extract($baseE, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)"
    val basePath =
      s"regexp_extract($baseE, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    val baseQ = s"regexp_extract($baseE, '(\\?[^#]*)', 1)"
    val refPath = s"regexp_extract($r, '^([^?]*)', 1)"
    val refQ = s"regexp_extract($r, '(\\?.*)$$', 1)"
    val dir = s"(CASE WHEN regexp_replace($basePath, '[^/]*$$', '') = '' " +
      s"THEN '/' ELSE regexp_replace($basePath, '[^/]*$$', '') END)"
    s"(CASE WHEN regexp_matches($r, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN " +
      s"regexp_extract($r, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1) || " +
      s"${removeDotSegmentsSql(
        s"regexp_extract($r, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)")} || $refQ " +
      s"WHEN left($r, 2) = '//' THEN " +
      s"$scheme || ':' || regexp_extract($r, '^(//[^/?#]+)', 1) || " +
      s"${removeDotSegmentsSql(
        s"regexp_extract($r, '^//[^/?#]+([^?#]*)', 1)")} || $refQ " +
      s"WHEN left($r, 1) = '/' THEN " +
      s"$schemeAuth || ${removeDotSegmentsSql(refPath)} || $refQ " +
      s"WHEN left($r, 1) = '?' THEN $schemeAuth || $basePath || $r " +
      s"WHEN $r = '' THEN $schemeAuth || $basePath || $baseQ " +
      s"ELSE $schemeAuth || " +
      s"${removeDotSegmentsSql(s"($dir || $refPath)")} || $refQ END)"
  }

  /** Effective resolution base under an HTML `<base href>` override
    * (r16, verdict item 3 — the first real-crawl divergence op323's
    * page-URL-only resolution hits: doc portals and CDN-hosted pages
    * commonly set one): the base element's href — itself a reference,
    * possibly RELATIVE — resolves against the page URL first, and
    * anchors then resolve against the result; a page without a base
    * element ('' from [[graft.functions.Html.baseHref]]) keeps the
    * page URL. Pure composition of [[resolve]], evaluated once per
    * PAGE — the per-href path is unchanged. */
  def effectiveBase(pageUrl: Column, baseHref: Column): Column =
    when(baseHref === "", pageUrl).otherwise(resolve(pageUrl, baseHref))

  /** [[effectiveBase]]'s DuckDB twin. Both arguments are interpolated
    * many times (resolveSql's contract) — pass simple column
    * references. */
  def effectiveBaseSql(pageE: String, baseE: String): String =
    s"(CASE WHEN $baseE = '' THEN $pageE ELSE " +
      s"${resolveSql(pageE, baseE)} END)"

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
  def canonicalize(url: Column): Column = canonicalizeDecoded(pctDecode(url))

  /** [[canonicalize]] minus the decode — for call sites that STAGE the
    * percent-decoded URL as its own projection column first (the r16
    * staging lesson: a Column is a tree, and this function references
    * its argument four times — host, path, query twice — so an inline
    * decode+synthesis subtree evaluates 4x where a staged attribute
    * evaluates once; the oracles' layered CTEs already spell it this
    * way). */
  def canonicalizeDecoded(u: Column): Column = {
    val q = canonicalQuery(u)
    concat(lit("https://"), canonicalHost(u), pathOf(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
