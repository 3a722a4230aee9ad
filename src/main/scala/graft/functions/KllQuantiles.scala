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
    // population rule (shared with exactQuantiles*): NaN is excluded —
    // it enters no meaningful order, and counting it here while the
    // recount passes exclude it would hand a cube consumer a sketch
    // whose n disagrees with the population it brackets (ADVICE r16)
    if (java.lang.Double.isNaN(v)) return
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

  /** Column API: merge STORED sketch structs (the percentile-cube
    * read side — see [[KllMergeSketch]]).
    */
  def kllMerge(c: Column, k: Int): Column =
    ColumnExpr.toColumn(
      KllMergeSketch(ColumnExpr.expr(c), k).toAggregateExpression())

  /** Rebuild compactor state from a sketch struct's parts: an item of
    * weight 2^l returns to level l (weights are powers of two by
    * construction — anything else is not a kll_sketch struct and fails
    * loudly). Compaction parity restarts at 0: parity is only the
    * alternating-selection cursor for FUTURE compactions, never part
    * of the tracked bound, so the rebuilt sketch's bound stays valid.
    */
  private[functions] def bufferFromParts(vs: Array[Double], ws: Array[Long],
      err: Long, n: Long, mn: Double, mx: Double): KllBuffer = {
    val b = new KllBuffer
    b.n = n; b.err = err; b.mn = mn; b.mx = mx
    var i = 0
    while (i < vs.length) {
      val w = ws(i)
      require(!java.lang.Double.isNaN(vs(i)),
        "kll_merge: sketch item is NaN — NaN is excluded from the " +
          "sketch population (see KllQuantiles population rule); the " +
          "input is not a valid kll_sketch struct")
      require(w > 0L && (w & (w - 1L)) == 0L,
        s"kll_merge: item weight $w is not a power of two — the input " +
          "is not a kll_sketch struct")
      val l = java.lang.Long.numberOfTrailingZeros(w)
      while (b.levels.size <= l) b.levels += mutable.ArrayBuffer.empty[Double]
      b.levels(l) += vs(i)
      i += 1
    }
    b
  }
}

/** Merge STORED kll_sketch structs back into one sketch — the read
  * side of a PRE-AGGREGATED PERCENTILE CUBE: per-cell sketches are
  * computed once (one corpus pass), persisted as ordinary struct rows
  * in a table, and any slice of cells can later be merged in
  * milliseconds (O(cells · k·log) work over cube rows, zero corpus
  * scans) into a sketch whose tracked bound is the sum of its parts'
  * — so [[KllQuantiles.exactQuantilesFromSketch]] can propose a
  * provable bracket for the merged population and pay the corpus only
  * for the exact recount. The classic mergeable-summary pattern
  * (Agarwal et al. 2012, "Mergeable Summaries"); same state type and
  * serde as [[KllSketch]].
  */
case class KllMergeSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with UnaryLike[Expression] {

  require(k >= 8, s"kll_merge requires k >= 8, got $k")

  // the compactor/merge/serde engine, shared with the build side
  private lazy val ops = KllSketch(child, k)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // field NAMES and TYPES must both match (nullability aside) — a
      // struct with the right names but e.g. array<int> values would
      // otherwise pass analysis and ClassCastException inside update()
      // (ADVICE r16)
      case s: StructType if s.fields.length == 6 &&
          s.fields.zip(KllSketch.resultType.fields).forall { case (a, b) =>
            a.name == b.name && ((a.dataType, b.dataType) match {
              case (ArrayType(ae, _), ArrayType(be, _)) => ae == be
              case (at, bt) => at == bt
            })
          } =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "kll_merge requires a kll_sketch struct " +
            "(vs array<double>, ws array<bigint>, err bigint, n bigint, " +
            s"mn double, mx double), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer

  override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (r.getLong(3) > 0L) // empty sketches carry no items
        ops.merge(b, KllSketch.bufferFromParts(
          r.getArray(0).toDoubleArray(), r.getArray(1).toLongArray(),
          r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    }
    b
  }

  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = ops.merge(b, o)
  override def eval(b: KllBuffer): Any = ops.eval(b)
  override def serialize(b: KllBuffer): Array[Byte] = ops.serialize(b)
  override def deserialize(bytes: Array[Byte]): KllBuffer = ops.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeSketch =
    copy(child = c)

  override def dataType: DataType = KllSketch.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge"
}

/** The sketch-proposes / exact-recount orchestration: EXACT
  * percentiles of a double column at sketch cost.
  *
  * Passes, all distributed: (1) the sketch pass (one 1-row collect of
  * O(k·log) doubles); (2) per iteration, one conditional-count scan
  * (exact below-bracket offsets + slice sizes + boundary-duplicate
  * counts, 1-row collect) and — only while a slice still exceeds
  * `sliceBudget` — one grouped RE-SKETCH of the oversized slices that
  * shrinks each bracket to the slice-local error bound; (3) the final
  * bracket slices tagged per target in a single scan, ranked with a
  * per-target window, filtered to the exact in-slice offset. Nothing
  * corpus-sized ever reaches the driver, and — the 100× guarantee the
  * single-shot bracket lacked — NO single task ever sorts more than
  * `sliceBudget` rows: a first-pass bracket of ~2·B rows (B grows
  * ~n/k·log n) is re-sketched within itself until it fits, each round
  * shrinking the slice from m to ~2·err(m) ≈ m/k·log m. Boundary
  * duplicates (a value repeated beyond the budget, which no bracket
  * can split) are resolved ANALYTICALLY from the duplicate counts
  * instead — so a million-copy plateau costs a counting scan, not a
  * million-row sort.
  *
  * Population rule: null AND NaN inputs are excluded (a NaN enters
  * no meaningful order — Spark sorts it after +Inf, DuckDB's rules
  * differ — so counting it would make the answer engine-dependent;
  * ADVICE r15). Duplicate pct targets are deduplicated (each target
  * answers once; duplicated targets used to multiply the slice rows
  * and silently select the wrong order statistic).
  *
  * Rank rule (both engines): r = max(1, ceil(pct_ppm · n / 10⁶)) in
  * pure integer arithmetic; the answer is the r-th smallest value.
  */
object KllQuantiles {

  /** r = max(1, ceil(q·n / 10⁶)) without the q·n intermediate: q ≤ 10⁶
    * and n can be up to ~9.2e18 rows, so the naive product overflows a
    * Long past n ≈ 9.2e12 (ADVICE r16) and math.max would then
    * silently hand high-ppm targets rank 1 (the minimum). Splitting
    * n = a·10⁶ + b keeps every intermediate ≤ n: q·a ≤ n (q/10⁶ ≤ 1)
    * and q·b < 10¹², and the result itself is ≤ n by the same bound.
    */
  private[functions] def rankOf(q: Long, n: Long): Long = {
    val a = n / 1000000L
    val b = n % 1000000L
    math.max(1L, q * a + (q * b + 999999L) / 1000000L)
  }

  /** Per-target recount diagnostics (spec hook): bracket-narrowing
    * iterations, the rows the final per-target window actually sorted
    * (0 when resolved analytically from duplicate counts or by the
    * distributed-sort fallback), and whether the stall fallback ran.
    */
  private[graft] case class SliceStat(q: Long, iterations: Int,
                                      finalSliceRows: Long,
                                      fallback: Boolean = false)

  /** Bracket [lo, hi] provably containing the rr-th smallest of the
    * sketched population (see the class-doc proof); closed bounds.
    */
  private def bracketOf(vs: Seq[Double], ws: Seq[Long], err: Long,
                        mn: Double, mx: Double, rr: Long): (Double, Double) = {
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
    val loIdx = estRank.lastIndexWhere(w => w <= rr - 1L - err)
    val lo = if (loIdx < 0) mn else vs(loIdx)
    val hiIdx = estRank.indexWhere(w => w >= rr + err)
    val hi = if (hiIdx < 0) mx else vs(hiIdx)
    (lo, hi)
  }

  def exactQuantiles(rows: DataFrame, vCol: String, pctsPpm: Seq[Long],
                     k: Int = 200,
                     sliceBudget: Long = 4L * 1000L * 1000L): DataFrame =
    exactQuantilesWithStats(rows, vCol, pctsPpm, k, sliceBudget)._1

  /** EXACT percentiles with the SKETCH PASS PRE-PAID: `sketch` is a
    * kll_sketch struct (typically several persisted cube-cell sketches
    * folded by [[KllSketch.kllMerge]]) describing exactly `rows`'
    * non-null/non-NaN `vCol` population. The corpus is touched only by
    * the count/recount passes — the cube pattern's payoff: the one
    * sketch-build scan amortizes over every later percentile query.
    * The bracket the stored sketch proposes is provable (the tracked
    * bound merges additively), and the recount keeps the answer exact
    * regardless of how loose that bound is; a sketch describing a
    * DIFFERENT population fails the bracket invariant loudly.
    */
  def exactQuantilesFromSketch(rows: DataFrame, vCol: String,
      sketch: org.apache.spark.sql.Row, pctsPpm: Seq[Long], k: Int = 200,
      sliceBudget: Long = 4L * 1000L * 1000L): DataFrame =
    exactQuantilesWithStats(rows, vCol, pctsPpm, k, sliceBudget,
      preSketch = Some(sketch))._1

  private[graft] def exactQuantilesWithStats(
      rows: DataFrame, vCol: String, pctsPpm: Seq[Long], k: Int = 200,
      sliceBudget: Long = 4L * 1000L * 1000L,
      preSketch: Option[org.apache.spark.sql.Row] = None)
      : (DataFrame, Seq[SliceStat]) = {
    require(pctsPpm.nonEmpty && pctsPpm.forall(p => p >= 1 && p <= 1000000),
      s"pct ppm targets must be in [1, 1000000], got $pctsPpm")
    require(sliceBudget >= 1L, s"sliceBudget must be positive: $sliceBudget")
    // duplicate targets would emit one identical struct per duplicate
    // into the per-target window, ranking every slice row N times and
    // silently selecting the wrong order statistic (ADVICE r15) —
    // each distinct target answers exactly once
    val pcts = pctsPpm.distinct
    val spark = rows.sparkSession
    val v = rows.select(col(vCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val sk = preSketch.getOrElse(
      v.agg(KllSketch.kllSketch(col("v"), k).as("sk"))
        .collect()(0).getStruct(0))
    val n = sk.getAs[Long]("n")
    val outSchema = StructType(Seq(
      StructField("pct_ppm", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("rk", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    if (n == 0L) return (emptyOut, Nil)

    // per-target bracket state. Bounds start CLOSED (from a sketch's
    // provable bracket); once the boundary duplicates are counted and
    // analytically excluded they become OPEN (strict) — tracked by
    // `open`, which is always both-ends at once here. `lastCnt`
    // remembers the previous round's interior size: re-sketching
    // shrinks a slice by ~k/(2·log m) per round, so a small k (where
    // the sketch's worst-case error exceeds the slice) makes NO
    // progress — detected as a stall and routed to the fallback.
    case class St(q: Long, r: Long, lo: Double, hi: Double,
                  open: Boolean, below: Long, iters: Int,
                  lastCnt: Option[Long] = None)

    var pending: Seq[St] = pcts.map { q =>
      val r = rankOf(q, n)
      val (lo, hi) = bracketOf(sk.getSeq[Double](0), sk.getSeq[Long](1),
        sk.getAs[Long]("err"), sk.getAs[Double]("mn"),
        sk.getAs[Double]("mx"), r)
      St(q, r, lo, hi, open = false, below = 0L, iters = 0)
    }
    val finalized = scala.collection.mutable.ArrayBuffer.empty[St]
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(St, Double)]
    val fellBack = scala.collection.mutable.Set.empty[Long]
    val finalCnt = scala.collection.mutable.Map.empty[Long, Long]

    /** Stall fallback — exact order statistic of an OPEN slice with NO
      * single-task sort: a range-partitioned distributed sort (each
      * partition ~sliceBudget rows) + zipWithIndex gives the global
      * ascending index directly. Costs a full shuffle of the slice,
      * so it only runs when re-sketching provably stopped shrinking
      * (k too small for the slice's error bound) — correctness at any
      * k, budget honored in all regimes.
      */
    def sortFallback(t: St, openCnt: Long): Double = {
      fellBack += t.q
      // no partition-count cap: a cap of P would let a slice larger
      // than P·sliceBudget sort more than the budget per task (ADVICE
      // r16). Spark handles large partition counts; saturating toInt
      // is unreachable (it needs openCnt > 2^31·sliceBudget rows)
      val parts = math.max(1,
        math.ceil(openCnt.toDouble / sliceBudget.toDouble).toInt)
      val rr = t.r - t.below
      v.filter(col("v") > lit(t.lo) && col("v") < lit(t.hi))
        .select(col("v")).rdd.map(_.getDouble(0))
        .sortBy(identity, ascending = true, numPartitions = parts)
        .zipWithIndex().filter(_._2 == rr - 1L).map(_._1).collect()(0)
    }

    var guard = 0
    while (pending.nonEmpty) {
      guard += 1
      // each round either peels boundary duplicates, shrinks the
      // interior geometrically, finalizes, or (on stall) falls back —
      // 64 rounds is unreachable except by a bug; fail loudly then
      require(guard <= 64,
        "exactQuantiles: bracket narrowing failed to converge")
      // ONE conditional-count scan for every pending target: exact
      // strictly-below offset, boundary-duplicate counts, slice size
      def pred(t: St) =
        if (t.open) col("v") > lit(t.lo) && col("v") < lit(t.hi)
        else col("v") >= lit(t.lo) && col("v") <= lit(t.hi)
      val aggs = pending.flatMap { t => Seq(
        sum(when(col("v") < lit(t.lo), 1L).otherwise(0L)).as(s"lt_${t.q}"),
        sum(when(col("v") === lit(t.lo), 1L).otherwise(0L)).as(s"eqlo_${t.q}"),
        sum(when(pred(t), 1L).otherwise(0L)).as(s"in_${t.q}"),
        sum(when(col("v") === lit(t.hi), 1L).otherwise(0L)).as(s"eqhi_${t.q}"))
      }
      val row = v.agg(aggs.head, aggs.tail: _*).collect()(0)
      val resketch = scala.collection.mutable.ArrayBuffer.empty[St]
      pending.foreach { t =>
        val lt = row.getAs[Long](s"lt_${t.q}")
        val eqLo = row.getAs[Long](s"eqlo_${t.q}")
        val inCnt = row.getAs[Long](s"in_${t.q}")
        val eqHi = row.getAs[Long](s"eqhi_${t.q}")
        val belowSlice = lt + (if (t.open) eqLo else 0L)
        val rr = t.r - belowSlice // 1-based rank within the slice
        require(rr >= 1L && rr <= inCnt,
          s"exactQuantiles: bracket invariant broken for pct ${t.q} " +
            s"(rank $rr of slice $inCnt) — sketch bound violated")
        if (!t.open && rr <= eqLo) resolved += ((t, t.lo))
        else if (!t.open && rr > inCnt - eqHi) resolved += ((t, t.hi))
        else {
          // the answer lies strictly inside (lo, hi): peel the
          // boundary duplicates analytically and keep the interior
          val openBelow = lt + eqLo
          val openCnt =
            inCnt - (if (t.open) 0L else eqLo) - (if (t.open) 0L else eqHi)
          require(openCnt > 0L,
            s"exactQuantiles: empty interior for pct ${t.q} — " +
              "sketch bound violated")
          val opened = t.copy(open = true, below = openBelow)
          if (openCnt <= sliceBudget) {
            finalCnt(t.q) = openCnt
            finalized += opened
          } else if (t.lastCnt.exists(prev => openCnt * 4L > prev * 3L)) {
            // the re-sketch shrank the interior by <25%: the sketch's
            // worst-case error is of the slice's own order (k too
            // small) and iterating would never converge — take the
            // distributed-sort fallback, still budget-bounded per task
            resolved += ((opened, sortFallback(opened, openCnt)))
          } else resketch += opened.copy(lastCnt = Some(openCnt))
        }
      }
      if (resketch.nonEmpty) {
        // grouped re-sketch of every oversized OPEN slice in one scan:
        // the slice-local sketch's error bound is ~|slice|/k·log — the
        // next bracket is that much narrower, so each round divides
        // the slice by ~k/log until it fits the budget (or its
        // boundary plateau is peeled above)
        val tgtArr = array(resketch.toSeq.map { t =>
          struct(lit(t.q).as("q"), lit(t.lo).as("lo"), lit(t.hi).as("hi"))
        }: _*)
        val anyOpen = resketch.toSeq.map(t =>
          col("v") > lit(t.lo) && col("v") < lit(t.hi)).reduce(_ || _)
        val grouped = v.filter(anyOpen)
          .select(col("v"), explode(tgtArr).as("t"))
          .filter(col("v") > col("t.lo") && col("v") < col("t.hi"))
          .groupBy(col("t.q").as("q"))
          .agg(KllSketch.kllSketch(col("v"), k).as("sk"))
          .collect()
          .map(r => r.getAs[Long]("q") -> r.getStruct(1)).toMap
        pending = resketch.toSeq.map { t =>
          val s = grouped.getOrElse(t.q, throw new IllegalStateException(
            s"exactQuantiles: oversized slice for pct ${t.q} vanished"))
          val (lo2, hi2) = bracketOf(s.getSeq[Double](0), s.getSeq[Long](1),
            s.getAs[Long]("err"), s.getAs[Double]("mn"),
            s.getAs[Double]("mx"), t.r - t.below)
          // the new bracket is CLOSED within the open slice; its
          // strictly-below offset is recounted next round
          t.copy(lo = lo2, hi = hi2, open = false, iters = t.iters + 1)
        }
      } else pending = Nil
    }

    // final recount: per-target windows over slices that are each
    // ≤ sliceBudget BY CONSTRUCTION. The union-of-brackets pre-filter
    // uses LITERAL bounds BEFORE the explode so it pushes to the
    // parquet scan (row-group min/max pruning — at 100 TB the slice
    // scan reads ~2B/n of the file, not all of it); the post-explode
    // filter only assigns rows to their targets.
    val recounted =
      if (finalized.isEmpty) emptyOut
      else {
        val anyBracket = finalized.toSeq.map(t =>
          col("v") > lit(t.lo) && col("v") < lit(t.hi)).reduce(_ || _)
        val tgtArr = array(finalized.toSeq.map { t =>
          struct(lit(t.q).as("q"), lit(t.r).as("r"), lit(t.lo).as("lo"),
            lit(t.hi).as("hi"), lit(t.below).as("below"))
        }: _*)
        val sliced = v.filter(anyBracket)
          .select(col("v"), explode(tgtArr).as("t"))
          .filter(col("v") > col("t.lo") && col("v") < col("t.hi"))
        val w = Window.partitionBy(col("t.q")).orderBy(col("v"))
        sliced.withColumn("rn", row_number().over(w))
          .filter(col("rn") === col("t.r") - col("t.below"))
          .select(col("t.q").as("pct_ppm"), lit(n).as("n_rows"),
            col("t.r").as("rk"), col("v").as("value"))
      }
    val analytic =
      if (resolved.isEmpty) emptyOut
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(resolved.toSeq.map {
            case (t, value) =>
              org.apache.spark.sql.Row(t.q, n, t.r, value)
          }).asJava), outSchema)
    val stats =
      finalized.toSeq.map(t => SliceStat(t.q, t.iters, finalCnt(t.q))) ++
        resolved.toSeq.map { case (t, _) =>
          SliceStat(t.q, t.iters, 0L, fallback = fellBack.contains(t.q))
        }
    (recounted.unionByName(analytic), stats)
  }

  /** GROUPED exact percentiles at sketch cost — the common form
    * (q37/e05 are per-group): one grouped sketch pass proposes a
    * bracket per (group, target), a broadcast-joined conditional-count
    * pass peels boundary duplicates and measures slices, oversized
    * slices re-sketch per group exactly like the global loop, and the
    * final recount is ONE window partitioned by (group, target) over
    * slices each ≤ `sliceBudget` by construction. Driver state is
    * |groups|·(k·log + |pcts|) — guarded by `maxGroups`; high-
    * cardinality grouping belongs in the exact integral shapes
    * (q37/t32) or an application-side bucketing, not here.
    *
    * The group column is carried AS STRING (driver-side bracket state
    * is keyed by it); population rule and rank rule match
    * [[exactQuantiles]]. The union-of-brackets pre-filter is emitted
    * as literal (group, value) range predicates when the clause count
    * is small enough to help a scan (≤ 256), so row-group pruning
    * still applies at 100 TB.
    */
  def exactQuantilesByGroup(rows: DataFrame, gCol: String, vCol: String,
      pctsPpm: Seq[Long], k: Int = 200,
      sliceBudget: Long = 4L * 1000L * 1000L,
      maxGroups: Int = 10000): DataFrame =
    groupQuantilesImpl(rows, gCol, vCol, pctsPpm, k, sliceBudget, maxGroups,
      preSketches = None)

  /** GROUPED exact percentiles with the sketch pass PRE-PAID per group
    * (t55 — the dashboard read of a persisted percentile cube): each
    * entry of `sketches` is a kll_sketch struct row (typically several
    * cube-cell sketches whose key has this group as a prefix, folded
    * by [[KllSketch.kllMerge]]) describing exactly the group's
    * non-null/non-NaN `vCol` population in `rows`. The corpus is
    * touched only by the count/recount passes, shared across ALL
    * groups per round; groups absent from `sketches` are not
    * answered, and a sketch describing a different population fails
    * the per-group bracket invariant loudly.
    */
  def exactQuantilesFromSketchByGroup(rows: DataFrame, gCol: String,
      vCol: String, sketches: Map[String, org.apache.spark.sql.Row],
      pctsPpm: Seq[Long], k: Int = 200,
      sliceBudget: Long = 4L * 1000L * 1000L,
      maxGroups: Int = 10000): DataFrame =
    groupQuantilesImpl(rows, gCol, vCol, pctsPpm, k, sliceBudget, maxGroups,
      preSketches = Some(sketches))

  private def groupQuantilesImpl(rows: DataFrame, gCol: String, vCol: String,
      pctsPpm: Seq[Long], k: Int, sliceBudget: Long, maxGroups: Int,
      preSketches: Option[Map[String, org.apache.spark.sql.Row]]): DataFrame = {
    require(pctsPpm.nonEmpty && pctsPpm.forall(p => p >= 1 && p <= 1000000),
      s"pct ppm targets must be in [1, 1000000], got $pctsPpm")
    require(sliceBudget >= 1L, s"sliceBudget must be positive: $sliceBudget")
    val pcts = pctsPpm.distinct
    val spark = rows.sparkSession
    import spark.implicits._
    val v = rows.select(col(gCol).cast("string").as("g"),
        col(vCol).cast("double").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && !isnan(col("v")))
    val outSchema = StructType(Seq(
      StructField(gCol, StringType, nullable = true),
      StructField("pct_ppm", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("rk", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)

    // one grouped sketch pass (|groups| rows of O(k·log) reach the
    // driver) — skipped entirely when the cube pre-paid it
    val sketches = preSketches.getOrElse(
      v.groupBy(col("g"))
        .agg(KllSketch.kllSketch(col("v"), k).as("sk"))
        .collect()
        .map(r => r.getString(0) -> r.getStruct(1)).toMap)
    require(sketches.size <= maxGroups,
      s"exactQuantilesByGroup: ${sketches.size} groups exceed maxGroups=" +
        s"$maxGroups — driver bracket state is per-group; bucket the " +
        "grouping or raise the guard deliberately")
    if (sketches.isEmpty) return emptyOut

    case class St(g: String, q: Long, r: Long, n: Long,
                  lo: Double, hi: Double, below: Long,
                  lastCnt: Option[Long] = None)
    var pending: Seq[St] = sketches.toSeq.flatMap { case (g, sk) =>
      val n = sk.getAs[Long]("n")
      if (n == 0L) Nil
      else pcts.map { q =>
        val r = rankOf(q, n)
        val (lo, hi) = bracketOf(sk.getSeq[Double](0), sk.getSeq[Long](1),
          sk.getAs[Long]("err"), sk.getAs[Double]("mn"),
          sk.getAs[Double]("mx"), r)
        St(g, q, r, n, lo, hi, below = 0L)
      }
    }
    val finalized = scala.collection.mutable.ArrayBuffer.empty[St]
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(St, Double)]

    def sortFallback(t: St, openCnt: Long): Double = {
      // uncapped for the same reason as the global variant's fallback
      val parts = math.max(1,
        math.ceil(openCnt.toDouble / sliceBudget.toDouble).toInt)
      val rr = t.r - t.below
      v.filter(col("g") === lit(t.g) &&
          col("v") > lit(t.lo) && col("v") < lit(t.hi))
        .select(col("v")).rdd.map(_.getDouble(0))
        .sortBy(identity, ascending = true, numPartitions = parts)
        .zipWithIndex().filter(_._2 == rr - 1L).map(_._1).collect()(0)
    }

    def tgtFrame(ts: Seq[St]): DataFrame =
      broadcast(ts.map(t => (t.g, t.q, t.lo, t.hi))
        .toDF("g", "q", "lo", "hi"))

    var guard = 0
    while (pending.nonEmpty) {
      guard += 1
      require(guard <= 64,
        "exactQuantilesByGroup: bracket narrowing failed to converge")
      // ONE broadcast-joined grouped count pass for every pending
      // (group, target): strictly-below offset, boundary-duplicate
      // counts, slice size — |pending| result rows
      val counts = v.join(tgtFrame(pending), Seq("g"))
        .groupBy(col("g"), col("q"), col("lo"), col("hi"))
        .agg(
          sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("v") === col("lo"), 1L).otherwise(0L)).as("eqlo"),
          sum(when(col("v") >= col("lo") && col("v") <= col("hi"), 1L)
            .otherwise(0L)).as("inc"),
          sum(when(col("v") === col("hi"), 1L).otherwise(0L)).as("eqhi"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
      val resketch = scala.collection.mutable.ArrayBuffer.empty[St]
      pending.foreach { t =>
        val (lt, eqLo, inCnt, eqHi) = counts.getOrElse((t.g, t.q),
          throw new IllegalStateException(
            s"exactQuantilesByGroup: count row missing for (${t.g}, ${t.q})"))
        val rr = t.r - lt
        require(rr >= 1L && rr <= inCnt,
          s"exactQuantilesByGroup: bracket invariant broken for " +
            s"(${t.g}, ${t.q}) (rank $rr of slice $inCnt)")
        if (rr <= eqLo) resolved += ((t, t.lo))
        else if (rr > inCnt - eqHi) resolved += ((t, t.hi))
        else {
          val openBelow = lt + eqLo
          val openCnt = inCnt - eqLo - eqHi
          require(openCnt > 0L,
            s"exactQuantilesByGroup: empty interior for (${t.g}, ${t.q})")
          val opened = t.copy(below = openBelow)
          if (openCnt <= sliceBudget) finalized += opened
          else if (t.lastCnt.exists(prev => openCnt * 4L > prev * 3L))
            resolved += ((opened, sortFallback(opened, openCnt)))
          else resketch += opened.copy(lastCnt = Some(openCnt))
        }
      }
      if (resketch.nonEmpty) {
        val grouped = v.join(tgtFrame(resketch.toSeq), Seq("g"))
          .filter(col("v") > col("lo") && col("v") < col("hi"))
          .groupBy(col("g"), col("q"))
          .agg(KllSketch.kllSketch(col("v"), k).as("sk"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getStruct(2)).toMap
        pending = resketch.toSeq.map { t =>
          val s = grouped.getOrElse((t.g, t.q), throw new IllegalStateException(
            s"exactQuantilesByGroup: oversized slice vanished (${t.g}, ${t.q})"))
          val (lo2, hi2) = bracketOf(s.getSeq[Double](0), s.getSeq[Long](1),
            s.getAs[Long]("err"), s.getAs[Double]("mn"),
            s.getAs[Double]("mx"), t.r - t.below)
          t.copy(lo = lo2, hi = hi2)
        }
      } else pending = Nil
    }

    val recounted =
      if (finalized.isEmpty) emptyOut
      else {
        val fin = finalized.toSeq
        val finDf = broadcast(fin.map(t => (t.g, t.q, t.r, t.lo, t.hi, t.below))
          .toDF("g", "q", "r", "lo", "hi", "below"))
        val base =
          if (fin.size <= 256) {
            // literal union-of-brackets pre-filter: pushes (g, v)
            // range predicates to the scan for row-group pruning
            val anyBracket = fin.map(t => col("g") === lit(t.g) &&
              col("v") > lit(t.lo) && col("v") < lit(t.hi)).reduce(_ || _)
            v.filter(anyBracket)
          } else v
        val sliced = base.join(finDf, Seq("g"))
          .filter(col("v") > col("lo") && col("v") < col("hi"))
        val w = Window.partitionBy(col("g"), col("q")).orderBy(col("v"))
        val nByGroup = typedLit(sketches.map { case (g, sk) =>
          g -> sk.getAs[Long]("n")
        })
        sliced.withColumn("rn", row_number().over(w))
          .filter(col("rn") === col("r") - col("below"))
          .select(col("g").as(gCol), col("q").as("pct_ppm"),
            element_at(nByGroup, col("g")).as("n_rows"),
            col("r").as("rk"), col("v").as("value"))
      }
    val analytic =
      if (resolved.isEmpty) emptyOut
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(resolved.toSeq.map {
            case (t, value) =>
              org.apache.spark.sql.Row(t.g, t.q, t.n, t.r, value)
          }).asJava), outSchema)
    recounted.unionByName(analytic)
  }
}
