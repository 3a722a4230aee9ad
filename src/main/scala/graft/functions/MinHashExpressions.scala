package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the MinHash pipeline's per-row hot loops.
  *
  * The declarative forms in [[TextFunctions]] (`transform`/`zip_with`
  * over md5+conv) are correct but run through interpreted
  * higher-order-function lambdas: one expression-tree evaluation per
  * array element, with hex-string and BigInteger allocation inside
  * `conv`. At 100 TB that interpretation overhead dominates the scan.
  * These expressions compute the identical values (same md5, same
  * 60-bit reduction, same permutation arithmetic — the DuckDB oracles
  * are unchanged) in one tight JVM loop per row, entered directly from
  * whole-stage codegen via a static call, so the surrounding stage
  * stays fully codegen'd.
  */
object MinHashKernel {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Base shingle hash: first 15 hex chars of md5 (= top 60 bits of
    * the first 8 digest bytes) mod P — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10) % P`
    * (TextFunctions.shingleBaseHash).
    */
  def baseHash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes)
    val top =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    (top >>> 4) % TextFunctions.MinhashMod
  }

  /** k-value MinHash signature of a shingle array: min over shingles of
    * (baseHash * A_j + B_j) mod P per permutation j. Shingle sets are
    * never empty on callers' paths (they filter size > 0 first); for
    * safety an empty input yields MaxValue sentinels, matching
    * array_min's null only in never-taken branches.
    */
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = baseHash(shingles.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = (h * TextFunctions.mhA(j) + TextFunctions.mhB(j)) % TextFunctions.MinhashMod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Word 3-gram shingles from a token array — identical to
    * TextFunctions.shinglesFromTokens: shingle i = w(i)+" "+w(i+1)+" "
    * +w(i+2); empty when fewer than 3 tokens. Token arrays come from
    * `split` and contain no nulls.
    */
  def shingles3(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.concat(words.getUTF8String(i), SPACE,
        words.getUTF8String(i + 1), SPACE, words.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_signature(shingles, k)`: array<string> → array<long>. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.signature($c, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** `word_shingles(words)`: array<string> → array<string> 3-grams. */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.shingles3(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingles3($c);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "word_shingles"
}

object MinHashExpressions {
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnExpr.toColumn(MinHashSignature(ColumnExpr.expr(shingles), k))

  def wordShingles3(words: Column): Column =
    ColumnExpr.toColumn(WordShingles(ColumnExpr.expr(words)))
}
