package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt parsing for the crawl edge (r16, verdict item 4) — the
  * piece between fetching a domain's robots.txt and the two gates that
  * consume it: the allow/disallow verdict
  * ([[graft.expressions.RobotsAllowed]], op311/op316) and the
  * `Crawl-delay` politeness spacing ([[graft.streaming.Politeness]],
  * op324). A real frontier reads the delay from the SAME robots group
  * it takes its allow rules from; until r15 op324's delay was a
  * synthetic digit formula riding the row — now it is parsed from the
  * domain's robots TEXT, in both engines.
  *
  * Two spellings of the same grammar, pinned equal in WebSpec:
  *  - [[crawlDelay]], a pure-Column regexp parse (codegen, map-side —
  *    the op316 pattern of robots metadata riding the row), with the
  *    exact DuckDB twin [[crawlDelaySql]];
  *  - [[compile]], the driver-side compiler a streaming deployment uses
  *    to build the broadcast per-domain matcher (rules Map + delay),
  *    the shape [[graft.expressions.RobotsAllowed]] and
  *    [[graft.streaming.AdmissionGate]] already take.
  *
  * Grammar (the `*`-group core every crawler implements): `Allow:` /
  * `Disallow:` path prefixes, `Crawl-delay: <seconds>` — field names
  * case-insensitive, optional whitespace around the colon, first valid
  * delay line wins, a missing or MALFORMED value (non-digits) falls to
  * the caller's default. Per-user-agent group scoping stays a fetcher
  * concern: these fixtures carry one `*` group per domain, the
  * dominant real-world shape.
  */
object Robots {

  /** First valid `Crawl-delay` line: digits only — `Crawl-delay: fast`
    * deliberately does NOT match, so malformed values fall to the
    * default exactly like absent ones. */
  val crawlDelayPattern: String =
    "(?im)^[ \\t]*crawl-delay[ \\t]*:[ \\t]*([0-9]+)[ \\t]*$"

  /** Parsed Crawl-delay seconds, or `defaultS` when the text has no
    * valid delay line. Pure Column (one regexp pass — map-side, no
    * join, no UDF). */
  def crawlDelay(robotsTxt: Column, defaultS: Long = 30L): Column = {
    val v = regexp_extract(robotsTxt, crawlDelayPattern, 1)
    when(v === "", lit(defaultS)).otherwise(v.cast("long"))
  }

  /** [[crawlDelay]]'s DuckDB twin over a SQL expression string. `e` is
    * interpolated twice — bind a CTE column, not a synthesis chain.
    * The pattern's `\t`/`$` survive single-quoting verbatim (RE2 reads
    * them; nothing here needs DuckDB-level escaping). */
  def crawlDelaySql(e: String, defaultS: Long = 30L): String = {
    val pat = "(?im)^[ \\t]*crawl-delay[ \\t]*:[ \\t]*([0-9]+)[ \\t]*$"
    s"(CASE WHEN regexp_extract($e, '$pat', 1) = '' THEN $defaultS " +
      s"ELSE CAST(regexp_extract($e, '$pat', 1) AS BIGINT) END)"
  }

  /** One domain's compiled robots group: the (prefix, isAllow) rules
    * [[graft.expressions.RobotsAllowed]] takes, plus the group's
    * Crawl-delay when one parsed. */
  case class Group(rules: Seq[(String, Boolean)], crawlDelay: Option[Long])

  /** Driver-side compiler for the broadcast per-domain matcher — the
    * deployment path where robots.txt bodies are fetched once per
    * domain and the compiled map rides in the expression (op316's
    * shape). Delay semantics are [[crawlDelay]]'s, spec-pinned equal:
    * first valid digits-only line wins, malformed/absent → None. */
  def compile(robotsTxt: String): Group = {
    val ruleRe = "(?i)^[ \\t]*(allow|disallow)[ \\t]*:[ \\t]*(\\S+)[ \\t]*$".r
    val delayRe = "(?i)^[ \\t]*crawl-delay[ \\t]*:[ \\t]*([0-9]+)[ \\t]*$".r
    val lines = robotsTxt.split("\n", -1).toSeq
    val rules = lines.flatMap {
      case ruleRe(field, prefix) =>
        Some(prefix -> field.equalsIgnoreCase("allow"))
      case _ => None
    }
    val delay = lines.collectFirst { case delayRe(v) => v.toLong }
    Group(rules, delay)
  }
}
