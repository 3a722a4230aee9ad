package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernel for the text canonicalization stage.
  *
  * Real corpora mix composed and decomposed encodings of the same
  * text ("á" as U+00E1 vs "a" + U+0301): every downstream hash —
  * exact dedup fingerprints, shingle MinHash, BPE symbols — treats
  * the two as DIFFERENT documents unless ingestion canonicalizes
  * first, which is why every public pipeline runs NFC before
  * fingerprinting. Spark has no built-in normalizer, so this is a
  * compiled Catalyst expression over `java.text.Normalizer` (the
  * JDK's Unicode-standard NFC — the same normal form DuckDB's
  * `nfc_normalize` implements, which is what lets the oracle replay
  * it): one static call per row entered directly from whole-stage
  * codegen, no UDF.
  *
  * Reference analogue: the dictionary pipeline stores UTF-8 string
  * values verbatim (`core/src/main/java/org/carbondata/core/writer/
  * CarbonDictionaryWriterImpl.java`) — byte-level equality is its
  * identity, exactly the assumption NFC protects at ingest.
  */
object UnicodeKernel {

  /** NFC-normalize. The fast path skips the (allocating) Normalizer
    * round-trip for strings that contain no char above U+00BF —
    * ASCII and the Latin-1 punctuation block are NFC-invariant, and
    * at 100 TB the overwhelmingly-ASCII corpus takes this branch.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var ascii = true
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0xc0) ascii = false
      i += 1
    }
    if (ascii) s
    else if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(s)`: string → string in Unicode Normalization
  * Form C.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeKernel.nfc($c);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object UnicodeExpressions {
  def nfcNormalize(s: Column): Column =
    ColumnExpr.toColumn(NfcNormalize(ColumnExpr.expr(s)))
}
