package graft

import scala.util.matching.Regex

/** The overflow-class lint (r11 verdict item: generalize the op268
  * catch): a `sum` whose argument multiplies two non-literal operands
  * accumulates quadratically, and on the SPARK side `sum(BIGINT)`
  * stays BIGINT and silently wraps — while DuckDB promotes to HUGEINT,
  * so the driver's cross-engine hash turns a 100 TB-only wrap into a
  * red that no fixture-scale test reproduces. House convention
  * (op254/op268/op270): quadratic terms accumulate in DECIMAL(38,0),
  * OR the surrounding scaladoc carries an explicit bounds argument
  * ("...stays in BIGINT through ~10⁶ rows/group at these domains...").
  *
  * The lint is lexical over the SOURCE tree, which covers both homes of
  * the pattern at once: Spark-side `sum(expr("x * x"))` spellings and
  * sum-of-products embedded in oracle SQL literals. Rules:
  *   - block comments are blanked (length-preserving) before site
  *     detection, so prose never matches;
  *   - a `*` with a NUMERIC LITERAL on either side is linear scaling
  *     (`value * 100` cents), not quadratic accumulation — skipped;
  *   - a CASE-led argument sums the THEN/ELSE values, not the
  *     condition's product — skipped;
  *   - `DECIMAL` anywhere in the argument is the fix itself — skipped;
  *   - otherwise the site must carry a bounds waiver
  *     (bound/decimal/wrap/margin/fits/overflow, case-insensitive) in
  *     the preceding [[OverflowLint.waiverWindow]] source lines.
  * Heuristic by construction — the DuckDB compare remains the gate —
  * but it makes un-argued quadratic BIGINT accumulation fail at dev
  * time, exactly like OracleLint made the un-cast-sum class fail. */
object OverflowLint {

  val waiverWindow = 40

  private val waiverRe =
    new Regex("(?i)bound|decimal|wrap|margin|fits|overflow")
  private val sumRe = new Regex("(?i)\\bsum\\s*\\(")

  /** Blank /* … */ spans (scaladoc included) with spaces, preserving
    * every offset and newline so line numbers survive. */
  def blankBlockComments(text: String): String = {
    val sb = new StringBuilder(text)
    var i = 0
    while (i < text.length - 1) {
      if (text.charAt(i) == '/' && text.charAt(i + 1) == '*') {
        val end = text.indexOf("*/", i + 2)
        val stop = if (end < 0) text.length else end + 2
        var j = i
        while (j < stop) {
          if (sb.charAt(j) != '\n') sb.setCharAt(j, ' '); j += 1
        }
        i = stop
      } else i += 1
    }
    sb.toString
  }

  private def closeParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** True when `arg` contains a multiplication of two NON-literal
    * operands (the quadratic-accumulation shape). */
  private[graft] def hasNonLiteralProduct(arg: String): Boolean = {
    def tokenChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
    var i = arg.indexOf('*')
    while (i >= 0) {
      val left = arg.substring(0, i).reverse.dropWhile(_ == ' ')
      val right = arg.substring(i + 1).dropWhile(_ == ' ')
      val leftTok = left.takeWhile(tokenChar).reverse
      val rightTok = right.takeWhile(tokenChar)
      // '(' directly left means `count(*)` / `SELECT *`, not a product
      val starOfGlob = left.headOption.contains('(')
      def lit(t: String) = t.nonEmpty && t.forall(c => c.isDigit || c == '.')
      if (!starOfGlob && !lit(leftTok) && !lit(rightTok)) return true
      i = arg.indexOf('*', i + 1)
    }
    false
  }

  /** (1-based line, argument) of each flagged `sum(` in `text`. */
  def sites(text: String): Seq[(Int, String)] = {
    val code = blankBlockComments(text)
    sumRe.findAllMatchIn(code).toSeq.flatMap { m =>
      val open = m.end - 1
      val close = closeParen(code, open)
      if (close < 0) None
      else {
        val arg = code.substring(open + 1, close)
        val flagged = arg.contains('*') &&
          !new Regex("(?i)decimal").pattern.matcher(arg).find() &&
          !arg.trim.toUpperCase.startsWith("CASE") &&
          hasNonLiteralProduct(arg)
        if (flagged)
          Some((code.substring(0, m.start).count(_ == '\n') + 1, arg))
        else None
      }
    }
  }

  /** Violations for one source file: flagged sites with no bounds
    * waiver in the preceding [[waiverWindow]] ORIGINAL lines (waiver
    * notes live in scaladoc, so the window reads unblanked text). */
  def violations(path: String, text: String): Seq[String] = {
    val lines = text.split("\n", -1)
    sites(text).flatMap { case (ln, arg) =>
      val ctx = lines.slice(math.max(0, ln - 1 - waiverWindow), ln - 1)
        .mkString("\n")
      if (waiverRe.findFirstIn(ctx).isDefined) None
      else Some(s"$path:$ln: quadratic sum without DECIMAL or bounds " +
        s"note: sum(${arg.trim.replaceAll("\\s+", " ").take(70)})")
    }
  }
}

class OverflowLintSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("the lint catches an un-argued quadratic BIGINT sum") {
    val bad =
      """val fit = grid.groupBy("k")
        |  .agg(sum(expr("x * x")).as("sxx"))""".stripMargin
    assert(OverflowLint.violations("fixture.scala", bad).nonEmpty)
  }

  test("the lint catches a naked sum-of-squares in embedded oracle SQL") {
    val bad =
      """    "op_x" ->
        |      \"\"\"SELECT k, sum(v * v) AS q FROM t GROUP BY 1\"\"\"""".stripMargin
    assert(OverflowLint.violations("fixture.scala", bad).nonEmpty)
  }

  test("DECIMAL accumulation, literal scaling, CASE conditions, and " +
    "bounds-waived sites pass") {
    val ok = Seq(
      """sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))""",
      """sum(CAST(round(value * 100) AS BIGINT))""",
      """sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)""",
      """// sums stay in BIGINT at these domains (day <= 83) — bound
        |sum(expr("day * day"))""".stripMargin,
      """sum(count(*))""")
    ok.foreach { s =>
      assert(OverflowLint.violations("fixture.scala", s).isEmpty,
        s"false positive on: $s")
    }
  }

  test("prose in scaladoc never matches") {
    val doc =
      """/** the running sum (the op152
        |  * incremental-aggregate convention applied to a stream) */
        |val x = 1""".stripMargin
    assert(OverflowLint.violations("fixture.scala", doc).isEmpty)
  }

  test("every src/main source is free of un-argued quadratic sums") {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val offenders = walk(new java.io.File("src/main/scala/graft"))
      .sortBy(_.getPath)
      .flatMap(f => OverflowLint.violations(f.getPath,
        java.nio.file.Files.readString(f.toPath)))
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
