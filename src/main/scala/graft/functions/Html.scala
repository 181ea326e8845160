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
}
