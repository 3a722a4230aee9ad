package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion with nested ARRAY/STRUCT columns encoded by two
  * delimiter levels — the reference's complex-type load format
  * (COMPLEX_DELIMITER_LEVEL_1 = '$' between elements,
  * COMPLEX_DELIMITER_LEVEL_2 = ':' between struct fields;
  * CarbonSqlParser.scala:95-96, ComplexDataTypesTestCase.scala:15-16).
  *
  * Example row for `mobile struct<imei,imsi>, mac array<string>,
  * loc array<struct<a,b>>`:
  *   `1AA1,ime1:ims1,m1$m2$m3,x1:y1$x2:y2`
  *
  * Parsing is pure Catalyst column work (split / transform /
  * element_at) — codegen'd, no UDF, scales as a narrow map over the
  * raw CSV scan.
  */
object ComplexCsv {

  val Level1 = "\\$"
  val Level2 = ":"

  /** Parse a raw string column into `targetType` (StringType passthru,
    * numeric/timestamp casts, ArrayType and StructType via the
    * two-level delimiters; one nesting level of struct-in-array, as in
    * the reference's test schemas).
    */
  def parseColumn(raw: Column, targetType: DataType): Column = targetType match {
    case ArrayType(StructType(fields), _) =>
      transform(split(raw, Level1), e => parseStruct(e, fields))
    case ArrayType(et, _) =>
      transform(split(raw, Level1), e => e.cast(et))
    case StructType(fields) => parseStruct(raw, fields)
    case t => raw.cast(t)
  }

  private def parseStruct(raw: Column, fields: Array[StructField]): Column =
    struct(fields.zipWithIndex.map { case (f, i) =>
      element_at(split(raw, Level2), i + 1).cast(f.dataType).as(f.name)
    }: _*)

  /** Load a headerless CSV whose columns (in order) are described by
    * `schema`, materializing nested types from the delimiter encoding.
    */
  def load(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ","): DataFrame = {
    val raw = spark.read
      .option("delimiter", delimiter)
      .option("quote", "\"")
      .csv(path)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      parseColumn(col(s"_c$i"), f.dataType).as(f.name)
    }
    raw.select(cols: _*)
  }
}
