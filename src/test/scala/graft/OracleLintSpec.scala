package graft

import scala.util.matching.Regex

/** Static oracle-schema lint (the r9 postmortem item): DuckDB types
  * `sum(BIGINT)` as HUGEINT (int128) while Spark emits BIGINT, and the
  * driver's cross-engine hash distinguishes the physical types even
  * when every value is equal — r9 shipped five value-exact queries red
  * for exactly this. The portability contract therefore gains a
  * machine-checked clause: NO un-cast `sum(...)` may reach an oracle's
  * output projection, directly or through an alias.
  *
  * The lint is lexical (sbt has no DuckDB to ask for real output
  * schemas): it finds every `sum(` outside a `CAST(... AS BIGINT)`
  * region, taints the alias such a sum is bound to, and flags any
  * output-projection item that contains an un-cast sum or references a
  * tainted alias outside a cast. `SELECT *` finals descend into their
  * FROM subquery so UNION branches (the op161 shape) are checked too.
  * Heuristic by construction — the driver's DuckDB compare remains the
  * gate — but it makes the r9 bug class unreintroducible at dev time.
  */
object OracleLint {

  /** Paren depth per character, treating single-quoted literals as
    * depth-neutral atoms (a paren inside '...' must not count). */
  private def depths(sql: String): Array[Int] = {
    val d = new Array[Int](sql.length)
    var depth = 0
    var inLit = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inLit) { d(i) = depth; if (c == '\'') inLit = false }
      else c match {
        case '\'' => d(i) = depth; inLit = true
        case '(' => d(i) = depth; depth += 1
        case ')' => depth -= 1; d(i) = depth
        case _ => d(i) = depth
      }
      i += 1
    }
    d
  }

  /** Index of the ')' matching the '(' at `open`, or -1. */
  private def closeParen(sql: String, open: Int): Int = {
    var depth = 0
    var inLit = false
    var i = open
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inLit) { if (c == '\'') inLit = false }
      else if (c == '\'') inLit = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private val castRe = new Regex("(?i)\\bcast\\s*\\(")
  private val sumRe = new Regex("(?i)\\bsum\\s*\\(")
  private val asBigintTail = new Regex("(?is)^.*\\bas\\s+bigint\\s*$")
  private val trailingAlias = new Regex("(?is)\\s+as\\s+\"?\\w+\"?\\s*$")

  /** Spans [start, end) of CAST( … AS BIGINT ) regions. */
  def castRegions(sql: String): Seq[(Int, Int)] =
    castRe.findAllMatchIn(sql).toSeq.flatMap { m =>
      val open = m.end - 1
      val close = closeParen(sql, open)
      if (close < 0) None
      else if (asBigintTail.matches(sql.substring(open + 1, close).trim))
        Some((m.start, close + 1))
      else None
    }

  private def inRegion(regions: Seq[(Int, Int)], p: Int): Boolean =
    regions.exists(r => p >= r._1 && p < r._2)

  /** Positions of `sum(` not enclosed in a CAST(… AS BIGINT). */
  def uncastSums(sql: String): Seq[Int] = {
    val regions = castRegions(sql)
    sumRe.findAllMatchIn(sql).map(_.start)
      .filterNot(inRegion(regions, _)).toSeq
  }

  /** End of the projection item containing position `p`: the next
    * comma / FROM / closing paren at the item's own depth. */
  private def itemEnd(sql: String, p: Int): Int = {
    var depth = 0
    var inLit = false
    var i = p
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inLit) { if (c == '\'') inLit = false }
      else if (c == '\'') inLit = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth < 0) return i }
      else if (depth == 0) {
        if (c == ',') return i
        if ((c == 'f' || c == 'F') && i + 4 <= sql.length &&
          sql.substring(i, i + 4).equalsIgnoreCase("from") &&
          (i == 0 || !sql.charAt(i - 1).isLetterOrDigit) &&
          (i + 4 == sql.length || !sql.charAt(i + 4).isLetterOrDigit))
          return i
      }
      i += 1
    }
    sql.length
  }

  /** Aliases bound to un-cast sums (`… sum(x) … AS name`). */
  def taintedAliases(sql: String): Set[String] =
    uncastSums(sql).flatMap { p =>
      val item = sql.substring(p, itemEnd(sql, p))
      new Regex("(?is)\\bas\\s+\"?(\\w+)\"?\\s*$")
        .findFirstMatchIn(item).map(_.group(1).toLowerCase)
    }.toSet

  /** Output projection item spans: every depth-0 SELECT's items, with
    * one level of descent through `SELECT * FROM ( … )`. */
  def outputItems(sql: String, base: Int = 0): Seq[(Int, Int)] = {
    val d = depths(sql)
    val selRe = new Regex("(?i)\\bselect\\b")
    val stopRe = new Regex("(?i)\\bfrom\\b|\\border\\s+by\\b|\\bselect\\b")
    val sels = selRe.findAllMatchIn(sql).filter(m => d(m.start) == 0).toSeq
    sels.flatMap { m =>
      val stop = stopRe.findAllMatchIn(sql)
        .find(s => s.start >= m.end && d(s.start) == 0)
        .map(_.start).getOrElse(sql.length)
      // split [m.end, stop) at depth-0 commas
      var items = Vector.empty[(Int, Int)]
      var a = m.end
      var i = m.end
      var depth = 0
      var inLit = false
      while (i < stop) {
        val c = sql.charAt(i)
        if (inLit) { if (c == '\'') inLit = false }
        else if (c == '\'') inLit = true
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) { items :+= ((a, i)); a = i + 1 }
        i += 1
      }
      items :+= ((a, stop))
      val texts = items.map { case (x, y) => sql.substring(x, y).trim }
      if (texts.exists(t => t == "*" || t.matches("\\w+\\.\\*"))) {
        // SELECT * — descend into the first parenthesized FROM source
        val fromAt = new Regex("(?i)\\bfrom\\b").findAllMatchIn(sql)
          .find(f => f.start >= stop && d(f.start) == 0).map(_.end)
        fromAt.flatMap { fa =>
          val open = sql.indexOf('(', fa)
          if (open < 0) None
          else {
            val close = closeParen(sql, open)
            if (close < 0) None
            else Some(outputItems(sql.substring(open + 1, close),
              base + open + 1))
          }
        }.getOrElse(Seq.empty)
      } else items.map { case (x, y) => (base + x, base + y) }
    }
  }

  /** Violation messages for one oracle; empty = clean. */
  def violations(name: String, sql: String): Seq[String] = {
    val regions = castRegions(sql)
    val sums = uncastSums(sql)
    val tainted = taintedAliases(sql)
    outputItems(sql).flatMap { case (a, b) =>
      val raw = sql.substring(a, b)
      val body = trailingAlias.replaceFirstIn(raw, "")
      val bodyEnd = a + body.length
      val sumHit = sums.exists(p => p >= a && p < bodyEnd)
      val taintHit = tainted.exists { al =>
        new Regex("(?i)\\b" + Regex.quote(al) + "\\b")
          .findAllMatchIn(body).map(_.start + a)
          .exists(p => !inRegion(regions, p))
      }
      if (sumHit || taintHit)
        Some(s"$name: un-cast sum reaches output: ${body.trim
            .replaceAll("\\s+", " ").take(90)}")
      else None
    }
  }
}

class OracleLintSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("the lint catches a deliberately un-cast sum output") {
    val bad = "SELECT k, sum(v) AS total FROM t GROUP BY 1"
    assert(OracleLint.violations("fixture", bad).nonEmpty)
  }

  test("the lint catches a tainted alias flowing to output via a CTE") {
    val bad = """WITH a AS (SELECT k, sum(v) AS s FROM t GROUP BY 1)
                |SELECT k, coalesce(s, 0) AS s FROM a""".stripMargin
    assert(OracleLint.violations("fixture", bad).nonEmpty)
  }

  test("the lint catches an un-cast sum in a UNION branch behind SELECT *") {
    val bad = """SELECT * FROM (
                |  SELECT 'a' AS g, CAST(0 AS BIGINT) AS n
                |  UNION ALL
                |  SELECT 'b', coalesce(sum(v), 0) FROM t) ORDER BY g""".stripMargin
    assert(OracleLint.violations("fixture", bad).nonEmpty)
  }

  test("a CAST(... AS BIGINT)-wrapped sum passes") {
    val ok = """WITH a AS (SELECT k, sum(v) AS s FROM t GROUP BY 1)
               |SELECT k, CAST(coalesce(s, 0) AS BIGINT) AS s FROM a
               |ORDER BY k""".stripMargin
    assert(OracleLint.violations("fixture", ok).isEmpty)
  }

  test("every SparkEntry oracle is free of un-cast sum outputs") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (name, sql) => OracleLint.violations(name, sql) }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
