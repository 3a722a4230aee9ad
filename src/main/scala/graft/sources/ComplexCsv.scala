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
  def parseColumn(raw: Column, targetType: DataType,
                  l1: String = Level1, l2: String = Level2): Column =
    targetType match {
      case ArrayType(StructType(fields), _) =>
        transform(split(raw, l1), e => parseStruct(e, fields, l2))
      case ArrayType(et, _) =>
        transform(split(raw, l1), e => e.cast(et))
      case StructType(fields) => parseStruct(raw, fields, l2)
      case t => raw.cast(t)
    }

  private def parseStruct(raw: Column, fields: Array[StructField],
                          l2: String): Column =
    struct(fields.zipWithIndex.map { case (f, i) =>
      element_at(split(raw, l2), i + 1).cast(f.dataType).as(f.name)
    }: _*)

  /** Load a headerless CSV whose columns (in order) are described by
    * `schema`, materializing nested types from the delimiter encoding.
    */
  def load(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ","): DataFrame =
    loadWithOptions(spark, path, schema, Map("delimiter" -> delimiter))

  /** Load with the reference LOAD DATA option set (LoadCube,
    * cubeSchema.scala:1792; parser CarbonSqlParser.scala:779-834):
    *
    *   delimiter, quotechar, escapechar, multiline,
    *   fileheader ("c1,c2,..." — names the file's columns when the
    *     file itself has no header row; order may differ from the
    *     table schema, fields are matched by name),
    *   header ("true" when the file's first row is a header),
    *   complex_delimiter_level_1 / complex_delimiter_level_2.
    *
    * Option keys are case-insensitive, as in the reference.
    */
  def loadWithOptions(spark: SparkSession, path: String, schema: StructType,
                      options: Map[String, String]): DataFrame = {
    val o = options.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    val l1 = java.util.regex.Pattern.quote(
      o.getOrElse("complex_delimiter_level_1", "$"))
    val l2 = java.util.regex.Pattern.quote(
      o.getOrElse("complex_delimiter_level_2", ":"))
    val hasHeaderRow = o.getOrElse("header", "false").toBoolean
    val raw0 = spark.read
      .option("delimiter", o.getOrElse("delimiter", ","))
      .option("quote", o.getOrElse("quotechar", "\""))
      .option("escape", o.getOrElse("escapechar", "\\"))
      .option("multiLine", o.getOrElse("multiline", "false"))
      .option("header", hasHeaderRow.toString)
      .csv(path)
    // an explicit FILEHEADER names the file's columns POSITIONALLY and
    // wins over whatever a header row said (the reference's override
    // for files with wrong/absent headers); a header row alone names
    // them too; otherwise columns are positional _cN
    val fileHeader = o.get("fileheader").map(_.split(",").map(_.trim).toSeq)
    val raw = fileHeader match {
      case Some(names) if hasHeaderRow =>
        require(names.length == raw0.columns.length,
          s"fileheader has ${names.length} names for ${raw0.columns.length} columns")
        raw0.toDF(names: _*)
      case _ => raw0
    }
    val fileCols: Option[Seq[String]] =
      if (hasHeaderRow) Some(raw.columns.toSeq) else fileHeader
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val src = fileCols match {
        case Some(names) =>
          val j = names.indexWhere(_.equalsIgnoreCase(f.name))
          require(j >= 0, s"column ${f.name} missing from file header $names")
          col(if (hasHeaderRow) names(j) else s"_c$j")
        case None => col(s"_c$i")
      }
      parseColumn(src, f.dataType, l1, l2).as(f.name)
    }
    raw.select(cols.toSeq: _*)
  }
}
