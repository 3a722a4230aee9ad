package object graft {

  /** DataFrame-API sugar mirroring the reference's implicit writer
    * surface (`df.saveAsCarbonFile` / `cc.read.format(...)`,
    * CarbonDatasourceRelation.scala:40-120):
    *
    * {{{
    * import graft.implicits._
    * df.writeGraft("/store/t", SaveMode.Append, Map("sort_columns" -> "ts"))
    * val back = spark.readGraft("/store/t")
    * }}}
    */
  object implicits {
    import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
    import graft.table.SegmentedTable

    implicit class GraftSessionOps(private val spark: SparkSession) {
      /** Read a segment-managed table (live segments only). */
      def readGraft(root: String): DataFrame =
        SegmentedTable.open(spark, root).read()
    }

    implicit class GraftWriterOps(private val df: DataFrame) {
      /** Write into a segment-managed table with SaveMode semantics. */
      def writeGraft(root: String, mode: SaveMode = SaveMode.Append,
                     properties: Map[String, String] = Map.empty): SegmentedTable =
        SegmentedTable.save(df, root, mode, properties)
    }
  }
}
