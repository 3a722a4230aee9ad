package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Exact distinct count over integral keys via a Roaring bitmap —
  * the Spark-native form of the reference's surrogate-key distinct
  * aggregator (core/.../query/aggregator/impl/DistinctCountAggregator
  * .java:50-307, RoaringBitmap at :38,67,74; merge = bitmap OR).
  *
  * Scale rationale: Spark's exact `count(distinct x)` rewrites into a
  * two-phase expand+distinct aggregation that shuffles every distinct
  * key. A bitmap buffer keeps the per-partition state compressed
  * (run-length + containers), merges with OR, and ships kilobytes
  * instead of key sets — the same reason the reference chose it. For
  * non-integral keys, hash them to 64-bit first (collision-free in
  * practice is NOT guaranteed; the reference has the same property on
  * its dictionary surrogates, which ARE dense ints).
  */
case class BitmapDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] with UnaryLike[Expression] {

  /** Integral inputs only: the bitmap represents the VALUE itself, so
    * the count is exact by construction. A silent fallback to a 32-bit
    * object hash would undercount past ~10^8 distinct values while
    * still claiming exactness — non-integral keys must be hashed to
    * 64-bit EXPLICITLY by the caller (xxhash64), who then owns the
    * collision contract.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_distinct_count requires an integral column " +
            s"(byte/short/int/long), got ${other.simpleString} — hash " +
            "non-integral keys to 64-bit explicitly (xxhash64) first")
    }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(b: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case by: Byte => by.toLong
        case other => throw new IllegalStateException(
          s"non-integral input survived analysis: ${other.getClass}")
      }
      b.addLong(l)
    }
    b
  }

  override def merge(b: Roaring64Bitmap, o: Roaring64Bitmap): Roaring64Bitmap = {
    b.or(o); b
  }

  override def eval(b: Roaring64Bitmap): Any = b.getLongCardinality

  override def serialize(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    b.serialize(dos)
    dos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val b = new Roaring64Bitmap()
    b.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapDistinctCount =
    copy(child = c)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct_count"
}

object BitmapDistinctCount {
  /** Column API: exact distinct count of an integral column. */
  def bitmapDistinctCount(c: Column): Column =
    ColumnExpr.toColumn(BitmapDistinctCount(ColumnExpr.expr(c)).toAggregateExpression())
}
