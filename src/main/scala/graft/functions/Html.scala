package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction, the regex-able core of the crawl pipeline's
  * text-extraction stage (the step between WARC bytes and every text
  * op in this engine): drop script/style subtrees wholesale, strip
  * remaining tags, decode the common character entities, collapse
  * whitespace. Pure Column expressions (codegen, no UDF) with exact
  * DuckDB twins in the WebQueries oracle — DOM-aware main-content
  * extraction (boilerplate classifiers, link-density heuristics) is a
  * parser's job; this module is the deterministic floor every such
  * extractor also needs.
  *
  * Regex portability note: the oracle runs on RE2 (no backreferences),
  * so script and style subtrees are removed by two separate
  * non-greedy patterns rather than one `<(script|style)>.*?</\1>`.
  */
object Html {

  /** Remove `<script>…</script>` and `<style>…</style>` subtrees
    * (their CONTENT must not leak into text), then every remaining
    * tag. Tags are replaced by a space so adjacent text blocks don't
    * fuse into one token. */
  def stripTags(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "<[^>]*>", " ")
  }

  /** Decode the common named/numeric entities. `&amp;` LAST — the
    * standard order, so `&amp;lt;` decodes to the literal `&lt;` and
    * never double-decodes to `<`. */
  def decodeEntities(text: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) =>
      call_function("replace", c, lit(from), lit(to))
    }
  }

  /** Full extraction: strip → decode → collapse runs of whitespace to
    * one space → trim. */
  def extract(html: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(html)), "\\s+", " "))

  /** The page's `<base href>` override, or '' when the page has none —
    * the resolution-base hook (r16, verdict item 3): anchors resolve
    * against the base ELEMENT's target, not the page URL, on pages
    * that carry one. HTML defines only the FIRST base element as
    * effective; regexp_extract returns the first match, which is
    * exactly that rule. Evaluated ONCE per page (never per href), and
    * the empty-vs-present decision composes through
    * [[graft.functions.Urls.effectiveBase]]. */
  val baseHrefPattern: String = "(?is)<base[^>]*href=\"([^\"]*)\""

  def baseHref(html: Column): Column =
    regexp_extract(html, baseHrefPattern, 1)

  /** Block boundary for [[mainContent]]: the closing tags of the
    * block-level elements (p, div, li, h1-h6). Shared with the oracle
    * twin so the two engines split identically. */
  val blockBoundary: String = "(?i)</(?:p|div|li|h[1-6])>"

  /** Anchor-content pattern for the link-density score. */
  val anchorPattern: String = "(?is)<a[^>]*>(.*?)</a>"

  /** Text INSIDE the block's anchors, extracted like [[extract]] — the
    * numerator of the link-density score. */
  def linkText(block: Column): Column =
    extract(array_join(
      regexp_extract_all(block, lit(anchorPattern), lit(1)), " "))

  /** Main-content extraction (r14 — the deterministic boilerplate
    * floor the r13 Html hook named): split the page into block-level
    * units, score each by length and LINK DENSITY (jusText/Readability
    * core heuristic: navigation, footers and "read more" boilerplate
    * are short or link-dominated; body prose is neither), and re-join
    * the survivors in document order. A block survives iff its
    * extracted text is ≥ `minChars` AND its anchor-text share is
    * ≤ `maxLinkPct` percent. Everything is array HOFs over ONE row —
    * no explode, no shuffle; at 100 TB this is a map-only projection
    * whose cost scales with page bytes, exactly like [[extract]].
    * DOM-aware classifiers (tag trees, class-name priors) remain a
    * parser's job; this is the regex-able floor every such extractor
    * also needs, and it is exactly replayable in the DuckDB oracle
    * (op318). */
  def mainContent(html: Column, minChars: Int = 20,
      maxLinkPct: Int = 33): Column =
    array_join(transform(keptBlocks(html, minChars, maxLinkPct),
      s => s.getField("txt")), " ")

  /** The surviving blocks as array<struct<txt, lk>> — extract() runs
    * ONCE per block (Catalyst doesn't CSE across HOF lambda
    * boundaries; the predicate-re-extracts spelling paid the ~10-stage
    * chain three times per block). op318 binds this to one column and
    * derives text + counts from it, so the page is traversed once. */
  def keptBlocks(html: Column, minChars: Int = 20,
      maxLinkPct: Int = 33): Column = {
    val stats = transform(split(html, blockBoundary), b =>
      struct(extract(b).as("txt"), length(linkText(b)).as("lk")))
    filter(stats, s =>
      length(s.getField("txt")) >= minChars &&
        s.getField("lk") * 100 <= length(s.getField("txt")) * maxLinkPct)
  }

  /** Number of blocks [[mainContent]] keeps / sees — the audit columns
    * op318 publishes beside the text. */
  def mainContentKept(html: Column, minChars: Int = 20,
      maxLinkPct: Int = 33): Column =
    size(keptBlocks(html, minChars, maxLinkPct))

  def blockCount(html: Column): Column = size(split(html, blockBoundary))
}
