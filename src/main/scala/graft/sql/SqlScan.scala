package graft.sql

import java.util.Locale

/** THE shared quote/paren-aware scanner over SQL TEXT for the graft
  * dialect ([[GraftSqlParser]]). Every clause-splitting need — finding
  * a top-level keyword, splitting on top-level commas, skipping
  * CASE..END spans, tokenizing a FROM-clause tail — derives from the
  * same traversal rules, centralized here so the next clause family
  * does not re-derive (and subtly diverge on) them:
  *
  *  - a single-quoted SQL literal is opaque: every character inside
  *    it, keywords and delimiters included, is data. '' escaping needs
  *    no special case for DELIMITER purposes: each quote char toggles
  *    the in-literal state, so a doubled quote re-enters the literal
  *    one character later and no top-level scan point is missed;
  *  - parentheses nest: depth > 0 is inside a subexpression (function
  *    arguments, subqueries) and never matches;
  *  - keywords match case-insensitively as WHOLE WORDS with '_' part
  *    of the identifier alphabet (WHERE must not match inside a column
  *    named where_flag);
  *  - unbalanced input never throws — depth clamps at zero and an
  *    unterminated literal simply runs to the end — because these
  *    scanners run BEFORE validation and their callers produce the
  *    loud, statement-specific errors.
  *
  * Property-based coverage: SqlScanSpec generates random nesting
  * shapes (parens × literals × CASE..END) with known top-level
  * positions and checks every scanner against the construction.
  */
private[sql] object SqlScan {

  private def isIdent(ch: Char): Boolean =
    Character.isLetterOrDigit(ch) || ch == '_'

  /** Index of the first top-level occurrence of `keyword` as a whole
    * word — occurrences inside parentheses or single-quoted literals
    * don't count. -1 when absent.
    */
  def topLevelIndexOf(s: String, keyword: String): Int = {
    val u = s.toUpperCase(Locale.ROOT)
    val k = keyword.toUpperCase(Locale.ROOT)
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false; i += 1 }
      else c match {
        case '\'' => inQuote = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth = math.max(0, depth - 1); i += 1
        case _ =>
          if (depth == 0 && u.startsWith(k, i) &&
              (i == 0 || !isIdent(s.charAt(i - 1))) &&
              (i + k.length >= s.length ||
                !isIdent(s.charAt(i + k.length))))
            return i
          i += 1
      }
    }
    -1
  }

  /** Every top-level occurrence of `keyword` (see [[topLevelIndexOf]]).
    * Resuming after a found index is state-clean: a top-level hit is
    * by definition outside any parens/quotes.
    */
  def topLevelIndicesOf(s: String, keyword: String): Seq[Int] = {
    val out = scala.collection.mutable.ListBuffer.empty[Int]
    var off = 0
    var idx = topLevelIndexOf(s, keyword)
    while (idx >= 0) {
      out += off + idx
      off = off + idx + keyword.length
      idx = topLevelIndexOf(s.substring(off), keyword)
    }
    out.toSeq
  }

  /** The first top-level `keyword` NOT owned by a CASE expression:
    * every top-level CASE..END span counts as nesting, so
    * `... AND CASE WHEN p THEN q END THEN DELETE` finds the SECOND
    * THEN. -1 when absent (including when every occurrence is inside
    * a CASE). Unbalanced ENDs clamp at depth zero.
    */
  def firstOutsideCase(s: String, keyword: String): Int = {
    val events = (topLevelIndicesOf(s, "CASE").map(_ -> 'c') ++
      topLevelIndicesOf(s, "END").map(_ -> 'e') ++
      topLevelIndicesOf(s, keyword).map(_ -> 'k')).sortBy(_._1)
    var caseDepth = 0
    events.foreach {
      case (_, 'c') => caseDepth += 1
      case (_, 'e') => caseDepth = math.max(0, caseDepth - 1)
      case (i, _) => if (caseDepth == 0) return i
    }
    -1
  }

  /** Split on top-level commas — commas inside parentheses (and, with
    * `angleNests`, angle brackets: complex type arguments) or
    * single-quoted literals are content, not separators. Parts are
    * returned RAW (untrimmed, empties kept): rejoining with ',' is the
    * identity, which is what the property test pins.
    */
  def splitTopCommas(s: String, angleNests: Boolean = false): Seq[String] = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      if (inQuote) { cur += c; if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth = math.max(0, depth - 1); cur += c
        case '<' if angleNests => depth += 1; cur += c
        case '>' if angleNests => depth = math.max(0, depth - 1); cur += c
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case other => cur += other
      }
    }
    parts += cur.result()
    parts.toSeq
  }

  /** Top-level whitespace tokens, with single quotes AND backticks
    * opaque (a FROM-clause tail: relation names, aliases, subqueries).
    */
  def topLevelTokens(s: String): Seq[String] = {
    val toks = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var inTick = false
    s.foreach { c =>
      if (inQuote) { cur += c; if (c == '\'') inQuote = false }
      else if (inTick) { cur += c; if (c == '`') inTick = false }
      else c match {
        case '\'' => inQuote = true; cur += c
        case '`' => inTick = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth = math.max(0, depth - 1); cur += c
        case ws if ws.isWhitespace && depth == 0 =>
          if (cur.nonEmpty) { toks += cur.result(); cur.clear() }
        case other => cur += other
      }
    }
    if (cur.nonEmpty) toks += cur.result()
    toks.toSeq
  }
}
