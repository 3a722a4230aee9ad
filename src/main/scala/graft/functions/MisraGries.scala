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
/** Mutable MG sketch buffer. `counts` stores counter + `debt` per
  * live key (effective count = stored − debt), so the classic
  * "decrement every counter" step is one debt increment instead of a
  * k-entry rewrite; `minStored` is a lower bound on the smallest
  * stored value, letting the purge (the only O(k) step) run exactly
  * when a counter can have died. Invariant outside [[MgCandidates]]
  * internals: every entry is live (stored > debt, except the
  * debt-0 fresh states where stored ≥ 1).
  */
final class MgSketch {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var debt: Long = 0L
  var minStored: Long = Long.MaxValue
}

case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch]
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

  override def createAggregationBuffer(): MgSketch = new MgSketch

  override def update(b: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    if (v != null) addOne(b, v.toString)
    b
  }

  /** One stream item — the per-row hot path, O(1) amortized. The
    * classic decrement-all is implemented as a single shared `debt`
    * increment (stored counter = effective count + debt), so a miss
    * on a full sketch allocates NOTHING and touches one long; the
    * O(k) purge runs only when the tracked minimum actually dies —
    * the first cut rebuilt the whole k-entry map on EVERY miss
    * (iterator→Seq→clear→re-insert), and on a 1M-key corpus where
    * ~every row misses that was ~20M 64-entry rebuilds of pure
    * allocation churn: the t22 sketch pass read 2.7–4.1 s at sf0.1
    * depending on session GC pressure. Candidate sets are IDENTICAL
    * — debt is the same arithmetic, just factored out.
    */
  private def addOne(b: MgSketch, key: String): Unit = {
    b.counts.get(key) match {
      case Some(c) =>
        // stored grows; the tracked min may now under-estimate the
        // true min, which only ever triggers a harmless early purge
        b.counts.update(key, c + 1L)
      case None if b.counts.size < k =>
        val stored = b.debt + 1L
        b.counts.update(key, stored)
        if (stored < b.minStored) b.minStored = stored
      case None =>
        // decrement-all-by-one = one debt increment; purge eagerly
        // when a counter can have died so freed slots are visible to
        // the next insert (the superset proof counts k+1 mass units
        // per decrement — dead entries must not absorb decrements)
        b.debt += 1L
        if (b.minStored <= b.debt) purge(b)
    }
  }

  /** Drop entries whose effective count hit zero; recompute the
    * tracked minimum exactly. Runs only when the minimum dies (or
    * was stale-low), never per row.
    */
  private def purge(b: MgSketch): Unit = {
    b.counts.filterInPlace((_, stored) => stored > b.debt)
    var mn = Long.MaxValue
    val it = b.counts.valuesIterator
    while (it.hasNext) { val v = it.next(); if (v < mn) mn = v }
    b.minStored = mn
  }

  override def merge(b: MgSketch, o: MgSketch): MgSketch = {
    // Mergeable-summaries rule: add EFFECTIVE counters pointwise,
    // then if more than k remain, subtract the (k+1)-th largest from
    // all and drop the non-positive (one debt assignment + purge) —
    // the error bound adds, staying ≤ n/(k+1)
    val merged = mutable.HashMap.empty[String, Long]
    val bi = b.counts.iterator
    while (bi.hasNext) {
      val (key, c) = bi.next(); merged.update(key, c - b.debt)
    }
    val oi = o.counts.iterator
    while (oi.hasNext) {
      val (key, c) = oi.next()
      merged.update(key, merged.getOrElse(key, 0L) + (c - o.debt))
    }
    val out = new MgSketch
    out.counts ++= merged
    if (out.counts.size > k) {
      out.debt = merged.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
    }
    purge(out)
    out
  }

  override def eval(b: MgSketch): Any =
    ArrayData.toArrayData(
      b.counts.keysIterator.toArray.sorted.map(UTF8String.fromString))

  // length-prefixed UTF-8, not writeUTF: the modified-UTF-8 form caps
  // keys at 65535 bytes and would throw mid-shuffle on long keys
  // (heavy-hitter URLs/documents routinely exceed it)
  override def serialize(b: MgSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(b.counts.size)
    b.counts.foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // wire format carries EFFECTIVE counts (debt normalized away),
      // unchanged from the map-buffer era
      dos.writeInt(kb.length); dos.write(kb); dos.writeLong(c - b.debt)
    }
    dos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val b = new MgSketch
    var i = 0
    var mn = Long.MaxValue
    while (i < n) {
      val len = dis.readInt()
      val kb = new Array[Byte](len)
      dis.readFully(kb)
      val c = dis.readLong()
      b.counts.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), c)
      if (c < mn) mn = c
      i += 1
    }
    b.minStored = mn
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
