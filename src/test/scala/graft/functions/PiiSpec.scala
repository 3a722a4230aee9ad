package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The PII scrub surface (t44): planted spans clip exactly, clean text
  * passes through byte-identical, and the email → phone → IP pass
  * order holds on adversarial overlaps.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t")))
      .collect()(0).getString(0)

  private def counts(s: String): (Int, Int, Int) = {
    val r = Seq(s).toDF("t").select(
      TextFunctions.piiCount(col("t"), TextFunctions.EmailPattern),
      TextFunctions.piiCount(col("t"), TextFunctions.PhonePattern),
      TextFunctions.piiCount(col("t"), TextFunctions.Ipv4Pattern))
      .collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("planted spans clip exactly, surrounding text untouched") {
    assert(redact("mail me at jo.doe+x@sub.example.org today") ==
      "mail me at [EMAIL] today")
    assert(redact("call 555-123-4567 or 555-000-1111 now") ==
      "call [PHONE] or [PHONE] now")
    assert(redact("host 192.168.0.1 answered") == "host [IP] answered")
    assert(counts("a@b.co 555-123-4567 1.2.3.4 x@y.io") == (2, 1, 1))
  }

  test("clean text passes through byte-identical") {
    val clean = Seq(
      "the quick brown fox", "rate 3.5 percent on 12-31",
      "version 1.2.3 released", "user at example dot com")
    clean.foreach(s => assert(redact(s) == s, s"clean text mutated: $s"))
    clean.foreach(s => assert(counts(s) == (0, 0, 0)))
  }

  test("pass order: an email wholly absorbs spans the narrower patterns would split") {
    // the email's LOCAL part is phone-shaped — redacting phones first
    // would leave "[PHONE]@example.com"; the contract (emails first)
    // yields one [EMAIL]
    assert(redact("ping 555-123-4567@example.com please") ==
      "ping [EMAIL] please")
    // a dotted-quad DOMAIN is not an email under the pattern (the TLD
    // must be alphabetic), so the quad redacts as the IP it is —
    // deterministic in both engines
    assert(redact("ping user@10.1.2.3 please") == "ping user@[IP] please")
  }

  test("the t44 gate plants PII on the schedule and clips it all") {
    val out = graft.SparkEntry.queries("t44_pii_scrub")(spark, TestSpark.sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every doc on the plant schedule detects its planted span type
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) assert(r.getInt(1) >= 1, s"doc $id lost its email")
      if (id % 5 == 0) assert(r.getInt(2) >= 1, s"doc $id lost its phone")
      if (id % 3 == 0) assert(r.getInt(3) >= 1, s"doc $id lost its IP")
    }
    // no redacted text retains a matchable span of any type
    val residue = out.filter(
      TextFunctions.piiCount(col("redacted"), TextFunctions.EmailPattern) > 0 ||
        TextFunctions.piiCount(col("redacted"), TextFunctions.PhonePattern) > 0 ||
        TextFunctions.piiCount(col("redacted"), TextFunctions.Ipv4Pattern) > 0)
      .count()
    assert(residue == 0, s"$residue docs still carry PII after redaction")
    // docs off every plant schedule come back byte-identical
    val untouched = out.filter(col("doc_id") % 7 =!= 0 &&
      col("doc_id") % 5 =!= 0 && col("doc_id") % 3 =!= 0)
    val changed = untouched.join(
        graft.Tables.documents(spark, TestSpark.sf), "doc_id")
      .filter(col("redacted") =!= col("text")).count()
    assert(changed == 0, s"$changed clean docs were mutated")
  }
}
