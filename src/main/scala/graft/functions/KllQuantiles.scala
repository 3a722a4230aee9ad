package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.types._

/** Mergeable rank-sketch percentiles (t52) — the KLL/MRL compactor
  * hierarchy (Karnin, Lang & Liberty 2016; Manku, Rajagopalan &
  * Lindsay 1998) under the repo's t22 discipline: the SKETCH only
  * PROPOSES a value bracket per target rank, and an exact recount
  * inside the bracket produces the exact order statistic — so the
  * final answer is independent of sketch internals (compaction
  * parity, merge order, partitioning) and replayable by an oracle
  * that knows nothing about sketches.
  *
  * Why this exists: the exact percentile gates (q37/t32/e05) carry
  * O(distinct) aggregation state — fine for integral columns at gate
  * scale, unpayable for a float column at 100 TB where every value is
  * distinct. The sketch pass carries O(k·log(n/k)) doubles per
  * partition; the recount touches only the bracket slice.
  *
  * The provable bracket: every compaction of a level whose items
  * weigh 2^l introduces at most 2^l rank error (the classic MRL
  * bound), and the sketch TRACKS the exact sum B of those terms
  * (merges add their bounds). For a sketch item with cumulative
  * weight W, the true rank of its value lies in [W − B, W + B], so
  *   lo = largest item value with W ≤ r − 1 − B   (else the exact min)
  *   hi = smallest item value with W ≥ r + B      (else the exact max)
  * brackets the true r-th smallest: count(< lo) ≤ W_lo + B ≤ r − 1
  * and count(≤ hi) ≥ W_hi − B ≥ r. Min/max/count are tracked exactly,
  * so the fallbacks are exact too. Deterministic alternating
  * compaction parity (no RNG) — the bound is worst-case, not
  * probabilistic, and the FINAL answer is identical under any
  * partitioning because only the bracket, never the value, depends
  * on sketch state.
  */
final class KllBuffer {
  var n: Long = 0L
  var err: Long = 0L
  var mn: Double = Double.PositiveInfinity
  var mx: Double = Double.NegativeInfinity
  var parity: Long = 0L
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
}

case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with UnaryLike[Expression] {

  require(k >= 8, s"kll_sketch requires k >= 8, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_sketch requires a DOUBLE column (cast first), got " +
            other.simpleString)
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer

  override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Double])
    b
  }

  private def add(b: KllBuffer, v: Double): Unit = {
    b.n += 1L
    if (v < b.mn) b.mn = v
    if (v > b.mx) b.mx = v
    b.levels(0) += v
    compactAll(b)
  }

  private def compactAll(b: KllBuffer): Unit = {
    var l = 0
    while (l < b.levels.size) {
      if (b.levels(l).size >= k) compact(b, l)
      l += 1
    }
  }

  /** Compact level l: sort, keep every other item of the even prefix
    * (alternating start parity — deterministic, no RNG), promote the
    * kept items to level l+1, leave the odd leftover (the largest) in
    * place. Rank error introduced ≤ 2^l, added to the tracked bound.
    */
  private def compact(b: KllBuffer, l: Int): Unit = {
    val buf = b.levels(l)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val evenLen = sorted.length - (sorted.length & 1)
    val start = (b.parity & 1L).toInt
    b.parity += 1L
    if (b.levels.size == l + 1)
      b.levels += mutable.ArrayBuffer.empty[Double]
    val up = b.levels(l + 1)
    var i = start
    while (i < evenLen) { up += sorted(i); i += 2 }
    buf.clear()
    if (evenLen < sorted.length) buf += sorted(sorted.length - 1)
    b.err += (1L << l)
  }

  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = {
    b.n += o.n
    b.err += o.err
    b.parity += o.parity
    if (o.mn < b.mn) b.mn = o.mn
    if (o.mx > b.mx) b.mx = o.mx
    var l = 0
    while (l < o.levels.size) {
      if (b.levels.size == l) b.levels += mutable.ArrayBuffer.empty[Double]
      b.levels(l) ++= o.levels(l)
      l += 1
    }
    compactAll(b)
    b
  }

  /** (vs sorted ascending, matching weights, err, n, mn, mx). */
  override def eval(b: KllBuffer): Any = {
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < b.levels.size) {
      val w = 1L << l
      b.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    InternalRow(
      new GenericArrayData(sorted.map(_._1).toArray),
      new GenericArrayData(sorted.map(_._2).toArray),
      b.err, b.n,
      if (b.n == 0) 0.0 else b.mn,
      if (b.n == 0) 0.0 else b.mx)
  }

  override def serialize(b: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeLong(b.n); dos.writeLong(b.err); dos.writeLong(b.parity)
    dos.writeDouble(b.mn); dos.writeDouble(b.mx)
    dos.writeInt(b.levels.size)
    b.levels.foreach { lvl =>
      dos.writeInt(lvl.size)
      lvl.foreach(dos.writeDouble)
    }
    dos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KllBuffer
    b.n = dis.readLong(); b.err = dis.readLong(); b.parity = dis.readLong()
    b.mn = dis.readDouble(); b.mx = dis.readDouble()
    val nl = dis.readInt()
    b.levels.clear()
    var l = 0
    while (l < nl) {
      val sz = dis.readInt()
      val lvl = new mutable.ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { lvl += dis.readDouble(); i += 1 }
      b.levels += lvl
      l += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketch =
    copy(child = c)

  override def dataType: DataType = KllSketch.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"
}

object KllSketch {
  private[functions] val resultType: StructType = StructType(Seq(
    StructField("vs", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ws", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("mn", DoubleType, nullable = false),
    StructField("mx", DoubleType, nullable = false)))

  /** Column API: the raw sketch struct (vs, ws, err, n, mn, mx). */
  def kllSketch(c: Column, k: Int): Column =
    ColumnExpr.toColumn(
      KllSketch(ColumnExpr.expr(c), k).toAggregateExpression())
}

/** The sketch-proposes / exact-recount orchestration: EXACT
  * percentiles of a double column at sketch cost.
  *
  * Three scans, all distributed: (1) the sketch pass (one 1-row
  * collect of O(k·log) doubles); (2) a conditional-count pass for the
  * exact below-bracket rank offsets (1-row collect of one long per
  * target); (3) the bracket slices tagged per target in a single
  * scan, ranked with a per-target window, and filtered to the exact
  * in-slice offset. Nothing corpus-sized ever reaches the driver; the
  * slice the window sorts is bounded by the sketch's rank-error
  * bracket (≈ 2·B rows per target), not by n.
  *
  * Rank rule (both engines): r = max(1, ceil(pct_ppm · n / 10⁶)) in
  * pure integer arithmetic; the answer is the r-th smallest value.
  */
object KllQuantiles {

  def exactQuantiles(rows: DataFrame, vCol: String, pctsPpm: Seq[Long],
                     k: Int = 200): DataFrame = {
    require(pctsPpm.nonEmpty && pctsPpm.forall(p => p >= 1 && p <= 1000000),
      s"pct ppm targets must be in [1, 1000000], got $pctsPpm")
    val spark = rows.sparkSession
    val v = rows.select(col(vCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val sk = v.agg(KllSketch.kllSketch(col("v"), k).as("sk"))
      .collect()(0).getStruct(0)
    val n = sk.getAs[Long]("n")
    val outSchema = StructType(Seq(
      StructField("pct_ppm", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("rk", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val err = sk.getAs[Long]("err")
    val vs = sk.getSeq[Double](0)
    val ws = sk.getSeq[Long](1)
    val mn = sk.getAs[Double]("mn")
    val mx = sk.getAs[Double]("mx")
    val cum = ws.scanLeft(0L)(_ + _).tail // cumulative weight incl. item i
    // est_rank(x) = total sketch weight of items with value <= x: for
    // an item, that is the cumulative weight at the LAST occurrence
    // of its value (duplicates share one estimate — using an earlier
    // occurrence's cum would understate it and break the bracket
    // proof)
    val estRank = new Array[Long](vs.length)
    var j = vs.length - 1
    var lastCum = 0L
    while (j >= 0) {
      if (j == vs.length - 1 || vs(j) != vs(j + 1)) lastCum = cum(j)
      estRank(j) = lastCum
      j -= 1
    }
    val targets = pctsPpm.map { q =>
      val r = math.max(1L, (q * n + 999999L) / 1000000L)
      val loIdx = estRank.lastIndexWhere(w => w <= r - 1L - err)
      val lo = if (loIdx < 0) mn else vs(loIdx)
      val hiIdx = estRank.indexWhere(w => w >= r + err)
      val hi = if (hiIdx < 0) mx else vs(hiIdx)
      (q, r, lo, hi)
    }
    // exact rank offset below each bracket — one conditional-agg scan
    val belowAggs = targets.map { case (q, _, lo, _) =>
      sum(when(col("v") < lo, 1L).otherwise(0L)).as(s"b$q")
    }
    val belowRow = v.agg(belowAggs.head, belowAggs.tail: _*).collect()(0)
    val below = targets.zipWithIndex.map { case ((q, _, _, _), i) =>
      q -> belowRow.getLong(i)
    }.toMap
    // bracket slices in one scan, exact in-slice order statistic per
    // target via a pct-partitioned window. The union-of-brackets
    // pre-filter uses LITERAL bounds BEFORE the explode so it pushes
    // to the parquet scan (row-group min/max pruning — at 100 TB the
    // slice scan reads ~2B/n of the file, not all of it); the
    // post-explode filter only assigns rows to their targets.
    val anyBracket = targets.map { case (_, _, lo, hi) =>
      col("v") >= lit(lo) && col("v") <= lit(hi)
    }.reduce(_ || _)
    val tgtArr = array(targets.map { case (q, r, lo, hi) =>
      struct(lit(q).as("q"), lit(r).as("r"), lit(lo).as("lo"),
        lit(hi).as("hi"), lit(below(q)).as("below"))
    }: _*)
    val sliced = v.filter(anyBracket)
      .select(col("v"), explode(tgtArr).as("t"))
      .filter(col("v") >= col("t.lo") && col("v") <= col("t.hi"))
    val w = Window.partitionBy(col("t.q")).orderBy(col("v"))
    sliced.withColumn("rn", row_number().over(w))
      .filter(col("rn") === col("t.r") - col("t.below"))
      .select(col("t.q").as("pct_ppm"), lit(n).as("n_rows"),
        col("t.r").as("rk"), col("v").as("value"))
  }
}
