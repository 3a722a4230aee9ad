package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
    */
  def segmentPrunedParquetBuilder(
      spark: SparkSession, name: String, schema: StructType,
      allPaths: Seq[String],
      prune: Seq[Expression] => Seq[String]): ScanBuilder =
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

      override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
        val kept =
          try prune(filters)
          catch { case scala.util.control.NonFatal(_) => allPaths }
        if (kept.toSet != allPaths.toSet) inner = mk(kept)
        inner.pushFilters(filters)
      }

      override def pushedFilters: Array[Predicate] = inner.pushedFilters

      override def pruneColumns(requiredSchema: StructType): Unit =
        inner.pruneColumns(requiredSchema)

      override def supportCompletePushDown(agg: Aggregation): Boolean =
        inner match {
          case a: SupportsPushDownAggregates => a.supportCompletePushDown(agg)
          case _ => false
        }

      override def pushAggregation(agg: Aggregation): Boolean =
        inner match {
          case a: SupportsPushDownAggregates => a.pushAggregation(agg)
          case _ => false
        }

      override def build(): Scan = inner.build()
    }
}
