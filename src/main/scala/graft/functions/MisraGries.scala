package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter CANDIDATE sketch (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * at most `k` counters; an unseen item decrements all counters when
  * the sketch is full. The guarantee: every item with true frequency
  * > n/(k+1) is present in the (merged) sketch — so the sketch's key
  * set is a SUPERSET of the true heavy hitters, and an exact recount
  * of just those candidates yields the exact answer.
  *
  * This is the scale shape for "frequent tokens over 100 TB": a full
  * groupBy shuffles the entire vocabulary (billions of keys); the
  * sketch pass ships ≤ k counters per partition (map-side partial →
  * one k-sized merge), and the recount pass shuffles only candidate
  * rows. The exactness of the final answer does not depend on sketch
  * internals — the sketch only bounds the candidate set.
  */
case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "mg_candidates requires k > 0")

  /** Atomic inputs only (string/numeric/date/timestamp/boolean): the
    * sketch keys by the value's string form, and a non-atomic value
    * (array/struct) or raw binary would key by an identity-based
    * toString — every row a unique key, nondeterministic garbage
    * candidates. Fail analysis instead.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
          LongType | FloatType | DoubleType | DateType | TimestampType |
          TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mg_candidates requires an atomic value-keyed column, got " +
            s"${other.simpleString} (arrays/structs/binary would key by " +
            "an identity toString — project a stable key first)")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.toString, 1L)
    b
  }

  private def add(b: mutable.HashMap[String, Long], key: String,
      count: Long): Unit = {
    b.get(key) match {
      case Some(c) => b.update(key, c + count)
      case None if b.size < k => b.update(key, count)
      case None =>
        // decrement-all by min(count, smallest counter) — the
        // vectorized form of `count` repetitions of the classic
        // single decrement; zeroed counters drop, and any surplus of
        // the incoming item re-adds into the freed room
        val dec = math.min(count, b.values.min)
        decrementAll(b, dec)
        val surplus = count - dec
        if (surplus > 0) add(b, key, surplus)
    }
  }

  /** Subtract `dec` from every counter, dropping non-positive. */
  private def decrementAll(m: mutable.HashMap[String, Long], dec: Long): Unit = {
    val keep = m.iterator
      .map { case (key, c) => key -> (c - dec) }
      .filter(_._2 > 0L).toSeq
    m.clear()
    keep.foreach { case (key, c) => m.update(key, c) }
  }

  override def merge(b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // Mergeable-summaries rule: add counters pointwise, then if more
    // than k remain, subtract the (k+1)-th largest count from all and
    // drop the non-positive — the error bound adds, staying ≤ n/(k+1)
    o.foreach { case (key, c) =>
      b.update(key, b.getOrElse(key, 0L) + c)
    }
    if (b.size > k) {
      val kth = b.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      decrementAll(b, kth)
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any =
    ArrayData.toArrayData(
      b.keysIterator.toArray.sorted.map(UTF8String.fromString))

  // length-prefixed UTF-8, not writeUTF: the modified-UTF-8 form caps
  // keys at 65535 bytes and would throw mid-shuffle on long keys
  // (heavy-hitter URLs/documents routinely exceed it)
  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(b.size)
    b.foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      dos.writeInt(kb.length); dos.write(kb); dos.writeLong(c)
    }
    dos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val kb = new Array[Byte](len)
      dis.readFully(kb)
      b.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        dis.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MgCandidates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgCandidates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MgCandidates =
    copy(child = c)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"
}

object MgCandidates {
  /** Column API: sorted array of heavy-hitter candidates — a superset
    * of every value with frequency > n/(k+1).
    */
  def mgCandidates(c: Column, k: Int): Column =
    ColumnExpr.toColumn(
      MgCandidates(ColumnExpr.expr(c), k).toAggregateExpression())
}
