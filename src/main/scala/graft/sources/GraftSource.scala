package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.graftbridge.ColumnExpr
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

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
    with DataSourceRegister {

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
}
