package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The text-canonicalization surface (t49): NFC composition,
  * control-char stripping, whitespace collapse, and the properties
  * that make the stage safe to run unconditionally at ingest —
  * idempotence and ASCII pass-through. Composed/decomposed variants
  * are spelled with explicit \\u escapes so the test can't silently
  * depend on the editor's own normalization.
  */
class CanonicalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Acute = "́" // COMBINING ACUTE ACCENT
  private val AAcute = "á" // á composed
  private val EAcute = "é" // é composed

  private def canon(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.canonicalize(col("t")))
      .collect()(0).getString(0)

  test("NFC composes decomposed sequences to the composed code point") {
    // e + U+0301 -> U+00E9; the downstream-hash identity NFC restores
    assert(canon("cafe" + Acute) == "caf" + EAcute)
    assert(canon("a" + Acute + " b") == AAcute + " b")
    // already-composed text passes through unchanged
    assert(canon("caf" + EAcute) == "caf" + EAcute)
  }

  test("exact-dedup fingerprints unify across encodings only AFTER canonicalization") {
    val composed = "r" + EAcute + "sum" + EAcute + " writer"
    val decomposed = "re" + Acute + "sume" + Acute + " writer"
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val rawFps = df.orderBy("id")
      .select(TextFunctions.fingerprint(col("t")))
      .collect().map(_.getString(0))
    assert(rawFps(0) != rawFps(1),
      "the two encodings must hash DIFFERENTLY before normalization " +
        "(otherwise the stage would be pointless)")
    val canonFps = df.orderBy("id")
      .select(TextFunctions.fingerprint(TextFunctions.canonicalize(col("t"))))
      .collect().map(_.getString(0))
    assert(canonFps(0) == canonFps(1),
      "canonicalized encodings must hash identically")
  }

  test("control chars strip, whitespace collapses, edges trim") {
    assert(canon("ab") == "ab")
    assert(canon("a \t b") == "a b")
    assert(canon("  a\t\tb\nc  ") == "a b c")
    // a control char BETWEEN spaces must not keep two runs apart
    // (strip-before-collapse pass order)
    assert(canon("a  b") == "a b")
    // tab/newline/CR are whitespace (collapsed), NOT stripped as
    // controls — a control-strip that ate them would weld words
    assert(canon("a\tb") == "a b")
  }

  test("canonicalization is idempotent and ASCII-invariant") {
    val dirty = "  h" + EAcute + "llo  world\t!  "
    assert(canon(canon(dirty)) == canon(dirty))
    val ascii = "plain ascii text stays untouched"
    assert(canon(ascii) == ascii)
  }
}
