package graft.sql

import scala.util.parsing.combinator.RegexParsers

import org.scalatest.funsuite.AnyFunSuite

import graft.table.SegmentedTable.{MergeDelete, MergeInsert, MergeUpdate, MergeWhen}

/** The r19 verdict's maintenance flag asked for a measured decision:
  * can a scala-parser-combinators grammar replace the SqlScan-based
  * MERGE clause splitting (`mergeWhenHeadIndices`/`clauseThenIndex`)
  * with the same spec matrix green? This spike IS that measurement —
  * a complete combinator grammar for the WHEN-clause list, checked
  * for model equivalence against the production parser over the
  * GraftSqlSpec matrix shapes plus adversarial nesting.
  *
  * Decision (recorded in NOTES_ROUND20): the grammar is equivalent on
  * the matrix but does NOT replace the production path, because the
  * production contract is RAW-TEXT-SLICING, not parsing — clause
  * conditions, assignment values and insert expressions are handed to
  * Spark's own parser verbatim, and a token-level grammar can only
  * reconstruct them with normalized whitespace (provably harmless for
  * SQL but a weaker contract than "the user's text, untouched"), while
  * needing the same quote/paren/CASE awareness SqlScan already
  * centralizes and property-tests. Equivalence holds; the structural
  * win does not materialize. The spike stays as a regression harness:
  * if a third dialect family lands and SqlScan's scanning needs a
  * fourth derivation, this grammar is the measured alternative.
  */
object MergeClauseGrammar extends RegexParsers {
  override val skipWhitespace = true

  private def kw(s: String): Parser[String] = ("""(?i)\b""" + s + """\b""").r

  /** Raw-text atoms: quoted literals verbatim (with '' escaping),
    * backticked identifiers verbatim, balanced paren groups, and
    * word/operator clusters. Reassembly joins with single spaces —
    * whitespace-normalizing but SQL-preserving.
    */
  private def quoted: Parser[String] = """'(?:[^']|'')*'""".r
  private def ticked: Parser[String] = "`[^`]*`".r
  private def group: Parser[String] =
    "(" ~ rep(group | quoted | ticked | """[^()'`]+""".r) ~ ")" ^^ {
      case _ ~ parts ~ _ => "(" + parts.map(_.trim).mkString(" ") + ")"
    }
  /** CASE..END owns its WHEN/THEN tokens — the grammar twin of
    * SqlScan.firstOutsideCase.
    */
  private def caseBlock: Parser[String] =
    kw("CASE") ~ rep(caseBlock | quoted | ticked | group |
      not(kw("END")) ~> """[^\s()'`]+""".r) ~ kw("END") ^^ {
      case _ ~ parts ~ _ => "CASE " + parts.mkString(" ") + " END"
    }

  /** One expression atom inside a clause condition / SET value /
    * INSERT value: stops at clause boundaries (THEN closing a head,
    * WHEN starting the next clause) and at top-level commas (handled
    * by rep1sep), while CASE blocks and paren groups keep theirs.
    */
  private def exprAtom(stopThen: Boolean): Parser[String] = {
    val word = """[^\s()'`,]+""".r
    val guarded =
      if (stopThen) not(kw("THEN")) ~> word
      else not(kw("WHEN") ~ (kw("MATCHED") | kw("NOT"))) ~> word
    caseBlock | quoted | ticked | group | guarded
  }

  private def exprText(stopThen: Boolean): Parser[String] =
    rep1(exprAtom(stopThen)) ^^ (_.mkString(" "))

  private def bareCol(c: String): String = {
    val t = c.trim
    val i = t.lastIndexOf('.')
    (if (i > 0) t.substring(i + 1) else t).replaceAll("`", "")
  }

  private def assignment: Parser[(String, String)] =
    ("""[\w.`]+""".r <~ "=") ~ exprText(stopThen = false) ^^ {
      case k ~ v => bareCol(k) -> v
    }

  private sealed trait Head { def cond: Option[String] }
  private case class Matched(cond: Option[String]) extends Head
  private case class NotMatched(cond: Option[String]) extends Head
  private case class BySource(cond: Option[String]) extends Head

  private def cond: Parser[Option[String]] =
    opt(kw("AND") ~> exprText(stopThen = true))

  private def head: Parser[Head] =
    kw("NOT") ~ kw("MATCHED") ~ kw("BY") ~ kw("SOURCE") ~> cond ^^ BySource.apply |
    kw("NOT") ~ kw("MATCHED") ~ opt(kw("BY") ~ kw("TARGET")) ~> cond ^^ NotMatched.apply |
    kw("MATCHED") ~> cond ^^ Matched.apply

  private sealed trait Action
  private case class Upd(sets: Option[Seq[(String, String)]]) extends Action
  private case object Del extends Action
  private case class Ins(cols: Seq[String], vals: Seq[String],
                         star: Boolean) extends Action

  private def action: Parser[Action] =
    kw("UPDATE") ~ kw("SET") ~> (
      "*" ^^^ Upd(None) |
      rep1sep(assignment, ",") ^^ (s => Upd(Some(s)))) |
    kw("DELETE") ^^^ Del |
    kw("INSERT") ~> (
      "*" ^^^ Ins(Nil, Nil, star = true) |
      (group ~ (kw("VALUES") ~> group)) ^^ { case cs ~ vs =>
        def inside(g: String) = g.stripPrefix("(").stripSuffix(")")
        Ins(SqlScan.splitTopCommas(inside(cs)).map(bareCol).filter(_.nonEmpty),
          SqlScan.splitTopCommas(inside(vs)).map(_.trim), star = false)
      })

  private def clause: Parser[(Head, Action)] =
    ((kw("WHEN") ~> head) ~ (kw("THEN") ~> action) ^^ { case h ~ a => (h, a) })
      .flatMap {
        case (BySource(_), _: Ins) =>
          failure("WHEN NOT MATCHED BY SOURCE takes UPDATE SET .../DELETE")
        case (BySource(_), Upd(None)) =>
          failure("WHEN NOT MATCHED BY SOURCE cannot UPDATE SET *")
        case (NotMatched(_), a) if !a.isInstanceOf[Ins] =>
          failure("WHEN NOT MATCHED takes INSERT")
        case (Matched(_), _: Ins) =>
          failure("WHEN MATCHED takes UPDATE SET .../DELETE")
        case ok => success(ok)
      }

  private def clauses
      : Parser[(Seq[MergeWhen], Seq[MergeInsert], Seq[MergeWhen])] =
    rep1(clause) <~ opt(";") ^^ { cs =>
      val matched = cs.collect {
        case (Matched(c), Upd(None)) => MergeUpdate(c, Nil)
        case (Matched(c), Upd(Some(sets))) => MergeUpdate(c, sets)
        case (Matched(c), Del) => MergeDelete(c)
      }
      val notM = cs.collect {
        case (NotMatched(c), Ins(cols, vals, _)) => MergeInsert(c, cols, vals)
      }
      val bySrc = cs.collect {
        case (BySource(c), Upd(Some(sets))) => MergeUpdate(c, sets)
        case (BySource(c), Del) => MergeDelete(c)
      }
      (matched, notM, bySrc)
    }

  def parse(whenClauseText: String)
      : Either[String, (Seq[MergeWhen], Seq[MergeInsert], Seq[MergeWhen])] =
    parseAll(clauses, whenClauseText) match {
      case Success(r, _) => Right(r)
      case ns: NoSuccess => Left(ns.msg)
    }
}

class MergeGrammarSpikeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Production model via the real dialect parser. */
  private def production(stmt: String) =
    new GraftSqlParser(spark.sessionState.sqlParser).parsePlan(stmt) match {
      case c: AnsiMergeFullCommand =>
        (c.matchedClauses, c.notMatchedClauses, c.bySourceClauses)
      case other => fail(s"not a merge: $other")
    }

  // whitespace-insensitive compare, including the token-joining
  // artifact `f (x)` vs `f(x)` — the exact cosmetic delta that makes
  // the grammar a weaker raw-text contract than SqlScan's slicing
  private def ws(s: String): String =
    s.replaceAll("\\s+", " ").replaceAll(" \\(", "(").trim
  private def normW(w: MergeWhen): MergeWhen = w match {
    case MergeUpdate(c, sets) =>
      MergeUpdate(c.map(ws), sets.map { case (k, v) => k -> ws(v) })
    case MergeDelete(c) => MergeDelete(c.map(ws))
    case i: MergeInsert => normI(i)
  }
  private def normI(i: MergeInsert): MergeInsert =
    MergeInsert(i.condSql.map(ws), i.cols.map(_.trim), i.vals.map(ws))

  private val prefix =
    "MERGE INTO graft.default.spike t USING (SELECT 1 AS k, 'x' AS v) s ON t.k = s.k "

  private val matrix = Seq(
    // the GraftSqlSpec matrix shapes
    """WHEN MATCHED THEN UPDATE SET v = s.v
       WHEN NOT MATCHED THEN INSERT *""",
    """WHEN MATCHED AND t.v = 'O' THEN UPDATE SET v = s.v * 2, k = s.k
       WHEN MATCHED THEN DELETE
       WHEN NOT MATCHED AND s.v < 100 THEN INSERT (k, v) VALUES (s.k, 'N')""",
    """WHEN MATCHED AND CASE WHEN t.v = 'O' THEN true ELSE false END THEN
         UPDATE SET v = s.v * 2
       WHEN MATCHED THEN DELETE
       WHEN NOT MATCHED AND s.v < 100 THEN
         INSERT (k, v) VALUES (s.k, 'N')
       WHEN NOT MATCHED BY SOURCE AND t.v = 'F' THEN DELETE
       WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'Z'""",
    // adversarial: keywords inside literals, nested CASE, parens with
    // commas, functions in values, qualified columns, BY TARGET
    """WHEN MATCHED AND t.v = 'WHEN MATCHED THEN' THEN DELETE""",
    """WHEN MATCHED AND CASE WHEN CASE WHEN t.k > 1 THEN true ELSE false END
         THEN t.v = 'x' ELSE false END THEN UPDATE SET v = concat(s.v, 'y')
       WHEN NOT MATCHED BY TARGET THEN INSERT (k, v)
         VALUES (coalesce(s.k, 0), case when s.v = 'a' then 'b' else 'c' end)""",
    """WHEN MATCHED THEN UPDATE SET t.v = substring(s.v, 1, 3)
       WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k + (1 + 2), 'a,b (c)')""")

  test("combinator grammar and production scanner agree on the matrix") {
    matrix.foreach { whenText =>
      val (pm, pn, pb) = production(prefix + whenText)
      val g = MergeClauseGrammar.parse(whenText)
      assert(g.isRight, s"grammar failed on: $whenText — $g")
      val (gm, gn, gb) = g.toOption.get
      assert(gm.map(normW) == pm.map(normW), s"matched differ on: $whenText")
      assert(gn.map(normI) == pn.map(normI), s"notMatched differ on: $whenText")
      assert(gb.map(normW) == pb.map(normW), s"bySource differ on: $whenText")
    }
  }

  test("grammar rejects what the production parser rejects") {
    // by-source INSERT is not a thing; UPDATE without SET; no THEN
    Seq("WHEN NOT MATCHED BY SOURCE THEN INSERT *",
        "WHEN MATCHED THEN UPDATE v = 1",
        "WHEN MATCHED DELETE").foreach { bad =>
      assert(MergeClauseGrammar.parse(bad).isLeft, bad)
      assertThrows[Exception](production(prefix + bad))
    }
  }
}
