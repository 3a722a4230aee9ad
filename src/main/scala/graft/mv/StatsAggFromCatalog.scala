package graft.mv

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.{SegmentedTable, SegmentMeta}

/** Driver-only global aggregates: an unfiltered, ungrouped
  * COUNT(*) / COUNT(col) / MIN(col) / MAX(col) over a graft table's
  * segment scan is answered from the segment catalog — no executor
  * job at all. Generalizes the reference's CountStarQueryExecutor /
  * CarbonInputFormat.getRowCount:208 fast path (SURVEY.md §4 row 7)
  * to every aggregate the per-segment footer stats can serve exactly:
  * the catalog stores exact per-segment min/max (collected by a real
  * Spark aggregate at stage time, round-trippable strings) and
  * per-column null counts, and COW updates/deletes restage segments
  * with fresh stats, so folding over live segments IS the answer.
  * At cluster scale this turns "MIN(ts), MAX(ts), COUNT(*) over
  * 100 TB" from a full scan into a driver-side catalog read.
  *
  * Fires only when: no grouping, every aggregate output is one of the
  * four servable shapes over a bare column, and every scanned path is
  * a `segment_N` dir of one graft table whose CURRENT catalog still
  * tracks each scanned id as live (ids are never reused and segment
  * dirs are immutable, so the stats describe the scanned data
  * verbatim; a stale plan over a since-deleted segment bails).
  * FILTERED aggregates fold too, when the catalog can prove a
  * trichotomy over the scanned segments: each is either all-OUT
  * (min/max/bloom/null-count pruning eliminates it — no row matches)
  * or all-IN ([[graft.table.SegmentedTable.provenAllIn]] — every row
  * matches, null semantics included); one partially-matching segment
  * bails the whole fold to the real scan. This is the metadata-only
  * time-range COUNT every lakehouse query fleet leans on — segment
  * boundaries aligned with the predicate (date-partitioned loads)
  * answer from the driver. Per-column guards keep it conservative:
  *  - COUNT(col) needs every live segment to record a null count for
  *    the column (catalogs written before nullCounts existed bail);
  *  - MIN/MAX(col) additionally needs each segment to either carry
  *    stats for the column or prove the column all-null there
  *    (nulls == rows) — a missing entry of unknown vintage (e.g. a
  *    segment staged before an ADD COLUMN) bails;
  *  - MIN/MAX folds that would have to COMPARE a non-decimal string
  *    (NaN) bail; a single-segment NaN needs no compare and serves
  *    the stored value, which is exactly Spark's answer (Spark
  *    orders NaN greater than every double).
  */
object StatsAggFromCatalog {
  private val Marker = "spark.graft.internal.statsAggRegistered"

  /** Shared stats-fold core — also the engine behind the V2 catalog
    * path's aggregate pushdown
    * ([[org.apache.spark.sql.graftbridge.GraftV2ScanSupport]] serves a
    * pushed COUNT(*)/COUNT(col)/MIN/MAX as a LocalScan folded from
    * these, so `SELECT COUNT(*) FROM cat.ns.t` costs one catalog read
    * instead of a footer read per file).
    */
  def foldCountStar(segs: Seq[SegmentMeta]): Long =
    segs.map(_.rowCount).sum

  def foldNonNullCount(segs: Seq[SegmentMeta], c: String): Option[Long] = {
    val per = segs.map(s =>
      if (s.rowCount == 0L) Some(0L)
      else s.nullCounts.get(c).map(n => s.rowCount - n))
    if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
  }

  /** Fold a column's per-segment exact min/max strings into the global
    * extremum as a Catalyst internal value. `None` = cannot serve;
    * `Some(null)` = servable and the answer is NULL (all rows null).
    */
  def foldMinMax(segs: Seq[SegmentMeta], c: String, dt: DataType,
                                isMin: Boolean): Option[Any] = {
    // each segment: Some(Some(raw)) = has stats; Some(None) = proven
    // all-null (contributes nothing); None = unknown → bail
    val per: Seq[Option[Option[String]]] = segs.map { s =>
      s.stats.get(c) match {
        case Some(cs) => Some(Some(if (isMin) cs.min else cs.max))
        case None =>
          if (s.rowCount == 0L) Some(None)
          else s.nullCounts.get(c) match {
            case Some(n) if n == s.rowCount => Some(None)
            case _ => None
          }
      }
    }
    if (per.exists(_.isEmpty)) return None
    val present = per.flatten.flatten
    if (present.isEmpty) return Some(null)
    try {
      val winner = dt match {
        case StringType =>
          // Spark's MIN/MAX on strings orders by UTF8String (unsigned
          // byte-wise UTF-8), which differs from java.lang.String's
          // UTF-16 code-unit order for supplementary characters
          val ord = new Ordering[String] {
            def compare(a: String, b: String): Int =
              UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
          }
          if (isMin) present.min(ord) else present.max(ord)
        case _: DecimalType | FloatType | DoubleType =>
          // exact decimal compare over round-trippable strings;
          // NaN/Infinity throw here and bail below
          val ord = Ordering.by[String, BigDecimal](BigDecimal(_))
          if (isMin) present.min(ord) else present.max(ord)
        case _ =>
          // integral / timestamp-micros / date-epoch-day strings
          val ord = Ordering.by[String, Long](_.toLong)
          if (isMin) present.min(ord) else present.max(ord)
      }
      Some(internalValue(winner, dt))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def internalValue(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType => s.toInt
    case LongType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case d: DecimalType =>
      val dec = Decimal(new java.math.BigDecimal(s))
      if (!dec.changePrecision(d.precision, d.scale)) throw new ArithmeticException(s)
      dec
    case StringType => UTF8String.fromString(s)
    case TimestampType | TimestampNTZType => s.toLong
    case DateType => s.toInt
    case _ => throw new IllegalArgumentException(dt.sql)
  }

  /** Idempotently append the rule to a session's experimental
    * optimizations — the runtime path for sessions built without
    * [[graft.sql.GraftSqlExtensions]] (Verify/Bench). Synchronized on
    * the session: the check-then-append on the shared
    * extraOptimizations var must not interleave with the other
    * runtime appenders under Verify's parallel dump.
    */
  def ensureRegistered(s: SparkSession): Unit = {
    s.sessionState.optimizer
    s.synchronized {
      if (!java.lang.Boolean.parseBoolean(s.conf.get(Marker, "false")))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ StatsAggFromCatalog(s)
    }
  }
}

case class StatsAggFromCatalog(spark: SparkSession) extends Rule[LogicalPlan] {
  spark.conf.set(StatsAggFromCatalog.Marker, "true")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      extract(child, None) match {
        case Some((cond, paths)) if servableShapes(aggExprs) =>
          answer(paths, cond, aggExprs) match {
            case Some(values) =>
              LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
                Seq(InternalRow(values: _*)))
            case None => agg
          }
        case _ => agg
      }
  }

  // ---- shape recognition ----

  private sealed trait Shape
  private case object CountStar extends Shape
  private case class CountCol(name: String) extends Shape
  private case class MinCol(name: String, dt: DataType) extends Shape
  private case class MaxCol(name: String, dt: DataType) extends Shape

  private def shapeOf(e: NamedExpression): Option[Shape] = e match {
    case Alias(AggregateExpression(f, Complete, false, None, _), _) => f match {
      case Count(Seq(Literal(1, _))) => Some(CountStar)
      case Count(Seq(a: AttributeReference)) => Some(CountCol(a.name))
      case Min(a: AttributeReference) => Some(MinCol(a.name, a.dataType))
      case Max(a: AttributeReference) => Some(MaxCol(a.name, a.dataType))
      case _ => None
    }
    case _ => None
  }

  private def servableShapes(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall(e => shapeOf(e).isDefined)

  /** Strip attribute-only Projects and at most ONE Filter between the
    * aggregate and the scan (the optimizer has already collapsed
    * filter chains). Returns the filter condition (if any) and the
    * scanned segment paths.
    */
  private def extract(p: LogicalPlan, cond: Option[Expression])
      : Option[(Option[Expression], Seq[String])] = p match {
    case l: LogicalRelation => l.relation match {
      // a scan carrying file-level read filters (glob, mtime bounds,
      // recursive lookup) reads a SUBSET of the segment dirs' files —
      // the catalog answer would silently drift; leave it alone
      case h: HadoopFsRelation if !AggTables.hasFileFilterOptions(h) =>
        Some((cond, h.location.rootPaths.map(_.toString.stripPrefix("file:"))))
      case _ => None
    }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
      extract(child, cond)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(f, child)
        if cond.isEmpty =>
      extract(child, Some(f))
    case _ => None
  }

  // ---- catalog fold ----

  /** All paths must be segment dirs of the same graft table, must
    * cover exactly its current live segments, and every requested
    * shape must be servable from each segment's recorded stats. With
    * a filter, every live segment must additionally be PROVEN all-out
    * (min/max/bloom/null-count pruning eliminates it — no row can
    * match) or all-in (`provenAllIn` — every row matches, nulls
    * included); the fold then runs over the all-in survivors only.
    * Returns the aggregate row's internal values in output order.
    */
  private def answer(paths: Seq[String], cond: Option[Expression],
                     exprs: Seq[NamedExpression]): Option[Array[Any]] = {
    val seg = """(.*)/segment_(\d+)/?$""".r
    val parsed = paths.map {
      case seg(root, id) => Some(root -> id.toInt)
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) return None
    val byRoot = parsed.flatten.groupBy(_._1)
    if (byRoot.size != 1) return None
    val (root, pairs) = byRoot.head
    if (!SegmentedTable.exists(root)) return None
    val t = SegmentedTable.open(spark, root)
    val live = t.showSegments().filter(_.status == SegmentedTable.SUCCESS)
    val byId = live.map(s => s.id -> s).toMap
    // fold over EXACTLY the scanned segments: ids are never reused and
    // segment dirs are immutable (COW rewrites stage new ids), so the
    // catalog stats describe the scanned data verbatim. A scan of a
    // live-set SUBSET is legitimate — GraftSegmentPruning may already
    // have rewritten the relation to the min/max survivors before this
    // rule runs (both live in the same fixed-point batch). An id the
    // current status no longer tracks (dropped segment, time-travel
    // snapshot over since-deleted dirs) has no stats to fold — bail.
    val scannedIds = pairs.map(_._2)
    if (scannedIds.distinct.size != scannedIds.size) return None
    val scanned = scannedIds.flatMap(byId.get)
    if (scanned.size != scannedIds.size) return None
    // without a filter, a subset scan has no pruning justification in
    // THIS plan — stale-plan protection keeps the original strictness
    if (cond.isEmpty && scanned.map(_.id).toSet != live.map(_.id).toSet)
      return None

    val qualified = cond match {
      case None => scanned
      case Some(c) =>
        val survivors = try t.pruneAmong(scanned, c)
          catch { case scala.util.control.NonFatal(_) => return None }
        if (!t.provenAllIn(survivors, c)) return None
        survivors
    }
    val values = exprs.map(e => shapeOf(e).get).map {
      case CountStar => Some(StatsAggFromCatalog.foldCountStar(qualified): Any)
      case CountCol(c) =>
        StatsAggFromCatalog.foldNonNullCount(qualified, c).map(v => v: Any)
      case MinCol(c, dt) =>
        StatsAggFromCatalog.foldMinMax(qualified, c, dt, isMin = true)
      case MaxCol(c, dt) =>
        StatsAggFromCatalog.foldMinMax(qualified, c, dt, isMin = false)
    }
    if (values.exists(_.isEmpty)) None else Some(values.map(_.get).toArray)
  }
}
