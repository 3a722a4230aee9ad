package graft.sql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[SqlScan]], the one shared top-level SQL-text
  * scanner: random nesting shapes (parens × single-quoted literals ×
  * CASE..END spans) are built WITH their expected top-level positions
  * tracked during construction, so every scanner is checked against
  * ground truth by construction — not against a second implementation.
  */
class SqlScanSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // identifier words that can never collide with a scanned keyword
  // (keyword matching is case-insensitive whole-word)
  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
      .suchThat(w => !Set("when", "then", "case", "end").contains(w))

  /** Decoy text allowed INSIDE literals and parens: may contain the
    * keyword, commas, quotes-free nesting — all invisible at top level.
    */
  private val decoy: Gen[String] = Gen.oneOf(
    Gen.const("WHEN"), Gen.const("THEN"), Gen.const("a, b"),
    Gen.const("CASE x END"), word)

  /** One rendered fragment + the top-level keyword offsets it
    * contributes (relative to its own start).
    */
  private def fragment(kw: String): Gen[(String, Seq[Int])] = Gen.frequency(
    4 -> word.map(w => (w, Nil)),
    2 -> decoy.map(d => (s"'$d'", Nil)), // literal: keyword inside is data
    2 -> Gen.listOfN(2, decoy).map(ds =>
      (s"(${ds.mkString(" ")})", Nil)), // parens: nested content
    1 -> Gen.listOfN(3, decoy).map(ds =>
      (s"((${ds.head}) ${ds(1)} '${ds(2)}')", Nil)), // deeper nesting
    2 -> Gen.const((kw, Seq(0)))) // THE keyword at top level

  /** A full statement text: fragments joined by single spaces, with
    * the absolute expected top-level keyword indices.
    */
  private def statement(kw: String): Gen[(String, Seq[Int])] =
    Gen.nonEmptyListOf(fragment(kw)).map { frags =>
      val sb = new StringBuilder
      val expected = scala.collection.mutable.ListBuffer.empty[Int]
      frags.foreach { case (text, offs) =>
        if (sb.nonEmpty) sb += ' '
        offs.foreach(o => expected += sb.length + o)
        sb ++= text
      }
      (sb.result(), expected.toSeq)
    }

  test("topLevelIndicesOf finds exactly the constructed top-level keywords") {
    (1L to 200L).foreach { seed =>
      val (text, expected) = sample(statement("WHEN"), seed)
      assert(SqlScan.topLevelIndicesOf(text, "WHEN") == expected,
        s"seed=$seed text=$text")
      // case-insensitive: the scan over the lowercased text agrees
      assert(SqlScan.topLevelIndicesOf(text.toLowerCase, "WHEN") == expected,
        s"seed=$seed lower text=$text")
    }
  }

  test("splitTopCommas: parts rejoin to the input and hide nested commas") {
    // parts are keyword-statements (no top-level commas by construction)
    val partGen = statement("WHEN").map(_._1)
    (1L to 200L).foreach { seed =>
      val parts = sample(Gen.nonEmptyListOf(partGen), seed)
      val joined = parts.mkString(",")
      val got = SqlScan.splitTopCommas(joined)
      assert(got == parts, s"seed=$seed joined=$joined")
      assert(got.mkString(",") == joined) // raw split is an identity
    }
  }

  /** Statement with CASE..END spans: tracks the expected FIRST
    * top-level keyword outside every case span.
    */
  private def caseStatement(kw: String): Gen[(String, Int)] = {
    val inCase: Gen[String] = for {
      c <- word; v <- word
    } yield s"CASE $c $kw $v END" // the kw inside is owned by the CASE
    val piece: Gen[(String, Boolean)] = Gen.frequency(
      4 -> word.map(w => (w, false)),
      2 -> inCase.map(c => (c, false)),
      2 -> Gen.const((kw, true)))
    Gen.nonEmptyListOf(piece).map { ps =>
      val sb = new StringBuilder
      var expected = -1
      ps.foreach { case (text, isBare) =>
        if (sb.nonEmpty) sb += ' '
        if (isBare && expected < 0) expected = sb.length
        sb ++= text
      }
      (sb.result(), expected)
    }
  }

  test("firstOutsideCase skips keywords owned by CASE..END, at any nesting") {
    (1L to 200L).foreach { seed =>
      val (text, expected) = sample(caseStatement("THEN"), seed)
      assert(SqlScan.firstOutsideCase(text, "THEN") == expected,
        s"seed=$seed text=$text")
    }
    // hand-pinned shapes the generator may not hit
    assert(SqlScan.firstOutsideCase(
      "MATCHED AND CASE WHEN p THEN q END THEN", "THEN") == 35)
    assert(SqlScan.firstOutsideCase(
      "CASE WHEN a THEN CASE WHEN b THEN c END END THEN x", "THEN") == 44)
    assert(SqlScan.firstOutsideCase("CASE WHEN a THEN b END", "THEN") == -1)
    assert(SqlScan.firstOutsideCase("'THEN' (THEN) THEN", "THEN") == 14)
  }

  test("topLevelTokens: quotes, backticks and parens are opaque") {
    assert(SqlScan.topLevelTokens("a b c") == Seq("a", "b", "c"))
    assert(SqlScan.topLevelTokens("(select 1 from t) s") ==
      Seq("(select 1 from t)", "s"))
    assert(SqlScan.topLevelTokens("`weird name` x 'a b'") ==
      Seq("`weird name`", "x", "'a b'"))
  }
}
