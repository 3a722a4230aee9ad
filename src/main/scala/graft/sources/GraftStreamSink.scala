package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

import graft.table.SegmentedTable

/** The segmented table as a Structured Streaming SINK
  * (`writeStream.format("graft")`): each micro-batch commits as one
  * segment through the normal load protocol, and the batch epoch is
  * recorded IN THE SAME atomic catalog commit
  * ([[SegmentedTable.loadStreamBatch]]) — so a batch replayed after a
  * restart (Spark re-delivers the last uncommitted epoch) is
  * recognized and skipped: exactly-once into the table without a
  * side ledger, the write half of the source's catalog-version
  * offsets.
  *
  * The target table must exist (create it first with an explicit
  * schema — a sink that invents a table from its first batch hides
  * schema mistakes); `sink.compact.every` optionally folds small
  * segments with MINOR compaction whenever that many have
  * accumulated, the steady-state micro-batch hygiene.
  */
class GraftStreamSink(sqlContext: SQLContext, path: String,
    compactEvery: Int, sinkId: String) extends Sink {

  private val table = SegmentedTable.open(sqlContext.sparkSession, path)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is streaming-flagged; wrap its executed rows
    // as a batch plan (the ForeachBatchSink recipe) so the segment
    // write can run a normal batch action on it
    val batch = org.apache.spark.sql.graftbridge.ColumnExpr.asBatchForSink(data)
    val landed = table.loadStreamBatch(batch, sinkId, batchId)
    if (landed.isDefined) table.autoCompactMinorIfNeeded(compactEvery)
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
