package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.table.SegmentedTable

/** `format("graft")` DataSource — the reference's CarbonSource
  * equivalent (CarbonDatasourceRelation.scala:40-120):
  *
  * {{{
  * df.write.format("graft").mode(SaveMode.Append)
  *   .option("sort_columns", "ts").save("/store/t")
  * spark.read.format("graft").load("/store/t")
  * }}}
  *
  * Reads resolve to Spark's own vectorized multi-path Parquet relation
  * over the table's LIVE segments — filter/column pushdown, row-group
  * skipping and codegen all apply exactly as for a raw parquet read;
  * the only graft logic is which segment dirs participate. Writes run
  * the segment-commit protocol with the standard SaveMode matrix.
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val t = SegmentedTable.open(sqlContext.sparkSession, path(parameters))
    val live = t.showSegments().filter(_.status == SegmentedTable.SUCCESS)
    ColumnExpr.parquetRelation(sqlContext.sparkSession,
      live.map(s => s"${t.root}/segment_${s.id}"), t.schema)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val props = parameters - "path"
    SegmentedTable.save(data, path(parameters), mode, props)
    createRelation(sqlContext, parameters)
  }

  // ---- spark.readStream.format("graft").load(path): the table as a
  // streaming source (see GraftStreamSource for semantics) ----

  private def changeFeedOpt(parameters: Map[String, String]): Boolean =
    parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("readchangefeed") => v }
      .exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      SegmentedTable.open(sqlContext.sparkSession, path(parameters)).schema)
    // a caller may pass the FULL change-feed schema (e.g. one captured
    // from a previous CDF read) — only append the CDF columns that are
    // not already present, never duplicate them
    val s =
      if (changeFeedOpt(parameters)) {
        val withType =
          if (base.fieldNames.contains("_change_type")) base
          else base.add("_change_type", org.apache.spark.sql.types.StringType)
        if (withType.fieldNames.contains("_commit_version")) withType
        else withType.add("_commit_version", org.apache.spark.sql.types.LongType)
      } else base
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val ignoreDeletes = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("ignoredeletes") => v }
      .exists(_.toBoolean)
    val maxVersions = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("maxversionsperbatch") => v }
      .map(_.toLong)
    new GraftStreamSource(sqlContext, path(parameters), ignoreDeletes,
      maxVersions, Some(metadataPath), changeFeed = changeFeedOpt(parameters))
  }

  // ---- df.writeStream.format("graft").start(path): exactly-once
  // micro-batch ingest (see GraftStreamSink) ----

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink supports Append output mode only, got $outputMode " +
        "(a segment store appends immutable segments; route " +
        "update/complete aggregations through foreachBatch + MERGE)")
    val p = path(parameters)
    require(SegmentedTable.exists(p),
      s"graft sink target does not exist: $p — create the table first " +
        "(SegmentedTable.create or CREATE GRAFT TABLE) so the schema " +
        "is explicit")
    val compactEvery = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("sink.compact.every") => v }
      .map(_.toInt).getOrElse(0)
    // the sink lineage id = the query's checkpoint location: epoch
    // dedup must be scoped to ONE query's epoch sequence (epochs
    // restart at 0 for a new query). Conf-based checkpoints
    // (spark.sql.streaming.checkpointLocation) resolve durably ONLY
    // when a queryName pins the subdirectory — Spark resolves an
    // UNNAMED conf-checkpointed query to <base>/<random-UUID> per
    // start (a fresh lineage with epochs restarting at 0), so mapping
    // those to a stable "<base>/" id would treat every restart as a
    // replay of the old lineage: batch 0 silently skipped, or the
    // checkpoint-reset error on a stream that reset nothing. Unnamed
    // conf checkpoints therefore fall through to the per-start UUID,
    // matching Spark's actual resolution.
    val sinkId = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("checkpointlocation") => v }
      .orElse {
        sqlContext.sparkSession.conf
          .getOption("spark.sql.streaming.checkpointLocation").flatMap { base =>
            parameters
              .collectFirst { case (k, v) if k.equalsIgnoreCase("queryname") => v }
              .map(qn => s"$base/$qn")
          }
      }
      .getOrElse(s"graft-sink-${java.util.UUID.randomUUID()}")
    new GraftStreamSink(sqlContext, p, compactEvery, sinkId)
  }
}
