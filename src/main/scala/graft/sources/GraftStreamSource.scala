package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.types.StructType

import graft.table.SegmentedTable

/** Streaming offset = segment-catalog version. The commit log is the
  * stream's write-ahead log: every committed version is a durable,
  * replayable point, so offsets survive restarts for free.
  */
case class GraftSourceOffset(version: Long) extends V1Offset {
  override def json: String = version.toString
}

/** The segmented table as a Structured Streaming SOURCE — the
  * downstream half of the near-realtime story (streamIntoTable lands
  * micro-batches as segments; this reads them back out incrementally,
  * so a graft table can sit in the middle of a streaming pipeline).
  *
  * Semantics (the table-format streaming-source norm):
  *  - the first batch is the full table snapshot as of the stream's
  *    first offset (readAsOf);
  *  - each later batch reads exactly the segments that new commits
  *    added, via the same catalog walk as [[SegmentedTable.readChanges]]
  *    — compaction commits are invisible (dataChange=false), so a
  *    background compactor never re-emits rows into the stream;
  *  - a delete/rewrite in the range fails the stream loudly (an
  *    append-only contract violation) unless `ignoreDeletes=true`,
  *    which streams only the inserts.
  *
  * Scale: getOffset is one driver-side catalog read; a batch plans a
  * vectorized Parquet scan over ONLY the new segment dirs. Nothing
  * rescans the table, so a 100 TB table with MB-sized commits streams
  * at the commit rate, not the table size.
  */
class GraftStreamSource(sqlContext: SQLContext, path: String,
    ignoreDeletes: Boolean, maxVersionsPerBatch: Option[Long] = None,
    metadataPath: Option[String] = None,
    changeFeed: Boolean = false)
  extends Source with SupportsTriggerAvailableNow {

  maxVersionsPerBatch.foreach(m => require(m > 0,
    s"maxVersionsPerBatch must be positive, got $m (a non-positive cap " +
      "would freeze the stream after its first batch)"))

  private val table = SegmentedTable.open(sqlContext.sparkSession, path)

  /** CHANGE-DATA-FEED mode (`readChangeFeed=true`, the streaming form
    * of [[SegmentedTable.readChanges]]): every batch carries
    * `_change_type` ('insert'/'delete') and `_commit_version`, and a
    * delete/rewrite in the range is DATA, not an error — a downstream
    * replica nets the feed (insert = +1, delete = −1 per row value)
    * and tracks the table through DML, the shape a 100 TB warehouse
    * sink consumes. The initial snapshot batch emits the table's
    * contents as inserts stamped with the snapshot version.
    *
    * Retention contract with [[SegmentedTable.cleanFiles]]: the feed
    * reads CHANGE ROWS out of the segment files themselves, so a
    * version range is replayable only while the segment dirs it
    * references still exist. `cleanFiles()` physically removes
    * DELETED/COMPACTED segment dirs; a stream (or batch
    * `readChanges`) whose un-consumed range references a removed
    * segment fails LOUDLY with "change feed references segments
    * removed by cleanFiles" rather than silently skipping changes.
    * Operationally: run cleanFiles with a retention horizon no
    * shorter than the slowest CDF consumer's lag — the same
    * vacuum-vs-reader contract every log-structured table format
    * documents.
    */
  override def schema: StructType =
    if (changeFeed)
      table.schema
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType)
    else table.schema

  /** Rate limit (`maxVersionsPerBatch`): cap how many catalog
    * versions one micro-batch spans, so a burst of commits (or a long
    * stop) drains as bounded batches instead of one giant scan — the
    * backfill-safety knob every table-format source needs at scale.
    *
    * The high-water mark (last offset offered or planned) is
    * persisted in the query's per-source checkpoint dir: after a
    * CLEAN-shutdown restart Spark calls getOffset before any
    * getBatch, so an in-memory-only mark would reset and the whole
    * backlog would be offered as one uncapped batch — exactly the
    * scenario the cap exists to bound. Persisting only the offered
    * mark is safe for exactly-once: replays are driven by Spark's
    * offset WAL, never by this file, and the mark is always ≥ the
    * committed offset.
    */
  /** metadataPath arrives as a Hadoop-Path string ("file:/ckpt/
    * sources/0", "hdfs://nn/ckpt/sources/0") whose path part is NOT
    * percent-encoded — exactly what the Hadoop Path(String)
    * constructor parses. The mark persists through [[graft.table
    * .TableIO]] on WHATEVER filesystem the checkpoint lives on, so a
    * restarted query on a DFS checkpoint keeps its rate-limit cap
    * (reference parity: the store's metadata is Hadoop-FS-native end
    * to end).
    */
  private val markFile = metadataPath.map(p =>
    new org.apache.hadoop.fs.Path(p, "graft_last_offered"))

  @volatile private var lastSeen: Long = {
    import graft.table.TableIO
    markFile.filter(TableIO.exists)
      .flatMap(f => TableIO.readString(f).trim.toLongOption)
      .getOrElse(-1L)
  }

  private def advanceMark(v: Long): Unit = if (v > lastSeen) {
    lastSeen = v
    markFile.foreach { f =>
      graft.table.TableIO.mkdirs(f.getParent)
      graft.table.TableIO.writeStringAtomic(f, v.toString)
    }
  }

  /** AvailableNow admission control ([[SupportsTriggerAvailableNow]],
    * which MicroBatchExecution honors on a V1 Source DIRECTLY,
    * skipping the single-offset AvailableNowSourceWrapper): the
    * prepare call pins the drain TARGET at the version current when
    * the query starts — commits landing mid-drain are excluded, the
    * AvailableNow contract — and `latestOffset` then pages toward it
    * under the same `maxVersionsPerBatch` cap as continuous
    * triggers, so a rate-limited backlog drains as BOUNDED batches
    * and the query still terminates. Before this, graft-source
    * drains needed a `processAllAvailable` fork: the wrapper offers
    * exactly one (capped!) offset, so a rate-limited AvailableNow
    * run stopped m versions in.
    */
  @volatile private var availableNowTarget: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = table.currentVersion

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): OffsetV2 =
    GraftSourceOffset(table.currentVersion)

  /** The single offer rule (both the V1 getOffset path and the
    * admission-control path): cap the catalog head — or the pinned
    * AvailableNow target — at `lastSeen + maxVersionsPerBatch`.
    */
  private def offerOffset(): GraftSourceOffset = {
    val cur =
      if (availableNowTarget >= 0L) availableNowTarget
      else table.currentVersion
    val capped = maxVersionsPerBatch match {
      case Some(m) if lastSeen >= 0 => math.min(cur, lastSeen + m)
      case _ => cur // first-ever offer: the initial snapshot is one batch
    }
    advanceMark(capped)
    GraftSourceOffset(capped)
  }

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    offerOffset()

  override def getOffset: Option[V1Offset] = Some(offerOffset())

  /** Restart path: offsets replayed from the checkpoint arrive as
    * SerializedOffset wrappers, so the catch-all `.json` parse is the
    * load-bearing case, not just a fallback.
    */
  private def versionOf(o: V1Offset): Long = o match {
    case GraftSourceOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnExpr
    val spark = sqlContext.sparkSession
    val endV = versionOf(end)
    advanceMark(endV) // uncommitted-batch replay: resume the cap from the WAL
    import org.apache.spark.sql.functions.lit
    val batch = start match {
      case None =>
        // initial snapshot: everything committed up to the first
        // offset — None when the table has no live segments yet (the
        // start-empty-then-produce pattern must yield an EMPTY
        // streaming batch, not a non-streaming LocalRelation that
        // fails MicroBatchExecution's isStreaming assertion)
        if (table.statusAt(endV).segments
            .exists(_.status == SegmentedTable.SUCCESS)) {
          val snap = table.readAsOf(endV)
          Some(if (changeFeed)
            snap.withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(endV))
          else snap)
        } else None
      case Some(s) =>
        val startV = versionOf(s)
        val events = table.changeEvents(startV, endV)
        if (changeFeed) {
          // every event is data: group segment reads by (version,
          // kind) exactly like readChanges, stamped with the feed cols
          if (events.isEmpty) None
          else {
            // the retention contract's LOUD failure (see class doc):
            // a range referencing cleanFiles-removed dirs must name
            // the segments, not die as a Parquet path-not-found
            table.requireChangeSegmentsPresent(events.map(_._1))
            Some(events.groupBy(p => (p._2, p._3)).toSeq.sortBy(_._1).map {
              case ((v, kind), group) =>
                table.readSegmentSet(group.map(_._1))
                  .withColumn("_change_type", lit(kind))
                  .withColumn("_commit_version", lit(v))
            }.reduce(_.unionByName(_)))
          }
        } else {
          val deleted = events.collect { case (seg, _, "delete") => seg.id }
          if (deleted.nonEmpty && !ignoreDeletes)
            throw new IllegalStateException(
              s"graft stream source over $path: segments ${deleted.mkString(",")} " +
                s"were deleted or rewritten between versions $startV and $endV; " +
                "streaming reads require an append-only table " +
                "(option ignoreDeletes=true streams only the inserts)")
          val inserts = events.collect { case (seg, _, "insert") => seg }
          if (inserts.isEmpty) None
          else {
            table.requireChangeSegmentsPresent(inserts)
            Some(table.readSegmentSet(inserts))
          }
        }
    }
    batch.fold(ColumnExpr.emptyStreamingBatch(spark, schema))(
      ColumnExpr.asStreamingBatch(spark, _))
  }

  override def stop(): Unit = ()
}
