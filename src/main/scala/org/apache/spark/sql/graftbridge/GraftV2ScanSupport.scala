package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.SegmentMeta

/** Bridge for the V2 catalog's segment-pruned parquet reads: Spark's
  * file-source scan builders push CATALYST filter expressions through
  * the `private[sql]`-namespaced [[SupportsPushDownCatalystFilters]],
  * so the wrapper that intercepts them to prune SEGMENT paths
  * driver-side (the catalog-read twin of the
  * `graft.table.GraftSegmentPruning` optimizer rule) must live under
  * `org.apache.spark.sql`.
  */
object GraftV2ScanSupport {

  /** A ScanBuilder over a graft table's segment dirs that, on filter
    * pushdown, asks `prune` which paths survive the predicate's
    * min/max stats and rebuilds the underlying parquet builder over
    * only the survivors — then delegates filter, column and aggregate
    * pushdown to it unchanged. Spark's push order (filters → sample →
    * aggregates → … → columns) makes the rebuild safe: it happens in
    * the first step, before any other state lands on the inner
    * builder. `prune` failures fall back to the full path set —
    * pruning is an optimization, never a correctness gate.
    *
    * `statsMetas` (when supplied: the SAME catalog snapshot the paths
    * came from) additionally serves an UNFILTERED pushed aggregation
    * of COUNT(*)/COUNT(col)/MIN(col)/MAX(col) straight from the
    * segment stats as a [[LocalScan]] — `SELECT COUNT(*) FROM
    * cat.ns.t` then costs ONE catalog read instead of a footer read
    * per file (and instead of the full scan Spark plans when the
    * parquet aggregate-pushdown conf is off, which is its default).
    * Any pushed filter, grouping, DISTINCT, or unservable column
    * disables the fold and the scan proceeds normally.
    */
  def segmentPrunedParquetBuilder(
      spark: SparkSession, name: String, schema: StructType,
      allPaths: Seq[String],
      prune: Seq[Expression] => Seq[String],
      statsMetas: Option[Seq[SegmentMeta]] = None): ScanBuilder =
    new ScanBuilder
      with SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates {

      private def mk(paths: Seq[String]): FileScanBuilder =
        ParquetTable(name, spark, CaseInsensitiveStringMap.empty(),
          paths, Some(schema), classOf[ParquetFileFormat])
          .newScanBuilder(CaseInsensitiveStringMap.empty())
          .asInstanceOf[FileScanBuilder]

      private var inner: FileScanBuilder = mk(allPaths)
      private var sawFilters = false
      private var folded: Option[(StructType, Array[Any])] = None

      override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
        sawFilters = sawFilters || filters.nonEmpty
        val kept =
          try prune(filters)
          catch { case scala.util.control.NonFatal(_) => allPaths }
        if (kept.toSet != allPaths.toSet) inner = mk(kept)
        inner.pushFilters(filters)
      }

      override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
        inner.pushedFilters

      override def pruneColumns(requiredSchema: StructType): Unit =
        inner.pruneColumns(requiredSchema)

      /** One servable aggregate: its output field + the folded value. */
      private def foldOne(f: AggregateFunc): Option[(StructField, Any)] = {
        import graft.mv.StatsAggFromCatalog._
        def colName(e: V2Expression): Option[String] = e match {
          case r: NamedReference if r.fieldNames.length == 1 =>
            Some(r.fieldNames.head)
          case _ => None
        }
        val segs = statsMetas.get
        f match {
          case _: CountStar =>
            Some(StructField("count(*)", LongType, nullable = false) ->
              foldCountStar(segs))
          case c: Count if !c.isDistinct =>
            for {
              n <- colName(c.column)
              if schema.fieldNames.contains(n)
              v <- foldNonNullCount(segs, n)
            } yield StructField(s"count($n)", LongType, nullable = false) -> v
          case m: Min =>
            for {
              n <- colName(m.column)
              fld <- schema.fields.find(_.name == n)
              v <- foldMinMax(segs, n, fld.dataType, isMin = true)
            } yield StructField(s"min($n)", fld.dataType) -> v
          case m: Max =>
            for {
              n <- colName(m.column)
              fld <- schema.fields.find(_.name == n)
              v <- foldMinMax(segs, n, fld.dataType, isMin = false)
            } yield StructField(s"max($n)", fld.dataType) -> v
          case _ => None
        }
      }

      private def tryFold(agg: Aggregation): Option[(StructType, Array[Any])] =
        if (statsMetas.isEmpty || sawFilters || agg.groupByExpressions.nonEmpty)
          None
        else {
          val per = agg.aggregateExpressions.map(foldOne)
          if (per.exists(_.isEmpty) || per.isEmpty) None
          else Some((StructType(per.map(_.get._1)), per.map(_.get._2)))
        }

      override def supportCompletePushDown(agg: Aggregation): Boolean =
        tryFold(agg) match {
          case Some(_) => true
          case None => inner match {
            case a: SupportsPushDownAggregates => a.supportCompletePushDown(agg)
            case _ => false
          }
        }

      override def pushAggregation(agg: Aggregation): Boolean =
        tryFold(agg) match {
          case s @ Some(_) => folded = s; true
          case None => inner match {
            case a: SupportsPushDownAggregates => a.pushAggregation(agg)
            case _ => false
          }
        }

      override def build(): Scan = folded match {
        case Some((aggSchema, values)) => new LocalScan {
          override def readSchema(): StructType = aggSchema
          override def rows(): Array[InternalRow] =
            Array(InternalRow(values: _*))
          override def description(): String =
            s"GraftStatsFoldScan($name, ${aggSchema.fieldNames.mkString(", ")})"
        }
        case None => inner.build()
      }
    }
}
