package graft.mv


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.table.SegmentedTable

/** Driver-only count(*): a global, unfiltered COUNT over a graft
  * table's segment scan is answered from the segment catalog's row
  * counts — no executor job at all. This is the reference's
  * CountStarQueryExecutor / CarbonInputFormat.getRowCount:208 fast
  * path (SURVEY.md §4 row 7) as a logical rewrite.
  *
  * Fires only when: no grouping, no filter, every aggregate output is
  * COUNT(1)/COUNT(*), and every scanned path is a `segment_N` dir of
  * one graft table whose live-segment set equals exactly the scanned
  * paths (so stale plans over since-deleted segments are left alone).
  */
case class CountStarFromCatalog(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      (scanPaths(child), countOnly(aggExprs)) match {
        case (Some(paths), true) =>
          catalogCount(paths) match {
            case Some(total) =>
              val row = InternalRow(Array.fill[Any](aggExprs.size)(total): _*)
              LocalRelation(agg.output.map(_.asInstanceOf[Attribute]), Seq(row))
            case None => agg
          }
        case _ => agg
      }
  }

  private def countOnly(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
      case _ => false
    }

  private def scanPaths(p: LogicalPlan): Option[Seq[String]] = p match {
    case l: LogicalRelation => l.relation match {
      // a scan carrying file-level read filters (glob, mtime bounds,
      // recursive lookup) reads a SUBSET of the segment dirs' files —
      // the catalog count would silently overcount; leave it alone
      case h: HadoopFsRelation if !AggTables.hasFileFilterOptions(h) =>
        Some(h.location.rootPaths.map(_.toString.stripPrefix("file:")))
      case _ => None
    }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[Attribute]) =>
      scanPaths(child)
    case _ => None
  }

  /** All paths must be segment dirs of the same graft table, and must
    * cover exactly its current live segments.
    */
  private def catalogCount(paths: Seq[String]): Option[Long] = {
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
    if (live.map(_.id).toSet != pairs.map(_._2).toSet) return None
    Some(live.map(_.rowCount).sum)
  }
}
