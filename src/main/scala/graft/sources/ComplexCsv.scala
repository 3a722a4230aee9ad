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

  /** Delimiters for nesting levels beyond the two the reference names:
    * non-printable control characters, the convention Apache CarbonData
    * later standardized for COMPLEX_DELIMITER_LEVEL_3 — they cannot
    * collide with data that survived a CSV reader.
    */
  private val ExtraLevels: Seq[String] =
    Seq("\u0001", "\u0002", "\u0003", "\u0004", "\u0005")
      .map(java.util.regex.Pattern.quote)

  /** Parse a raw string column into `targetType` (StringType passthru,
    * numeric/timestamp casts, ARRAY/STRUCT via per-depth delimiters).
    * Nesting recurses to any depth the delimiter supply covers — 7
    * levels with the defaults, failing FAST past that (reference
    * flattening, CarbonSqlParser.scala:1052-1094): each nesting level
    * consumes the next delimiter — level 1 between array elements,
    * level 2 between struct fields / second-level elements, control
    * characters beyond that. A top-level struct splits on level 2 (the
    * reference's encoding: `imei:imsi`), so struct-in-array and bare
    * struct read identically.
    */
  def parseColumn(raw: Column, targetType: DataType,
                  l1: String = Level1, l2: String = Level2,
                  extra: Seq[String] = ExtraLevels): Column =
    parseAtDepth(raw, targetType, (Seq(l1, l2) ++ extra).toIndexedSeq, 0)

  private def delimAt(delims: IndexedSeq[String], depth: Int): String = {
    // fail FAST past the delimiter supply: clamping would reuse the
    // last delimiter for two adjacent levels, silently merging them
    require(depth < delims.length,
      s"complex-type nesting depth ${depth + 1} exceeds the delimiter " +
        s"supply (${delims.length} levels); flatten the schema or " +
        "extend complex_delimiter_level_* options")
    delims(depth)
  }

  private def parseAtDepth(raw: Column, t: DataType,
                           delims: IndexedSeq[String], depth: Int): Column =
    t match {
      case ArrayType(et, _) =>
        transform(split(raw, delimAt(delims, depth)),
          e => parseAtDepth(e, et, delims, depth + 1))
      case StructType(fields) =>
        // a struct never splits on level 1 — the reference reserves it
        // for array elements even when the struct is the column's top
        // level (ComplexDataTypesTestCase.scala:15-16).
        // try_element_at: a RAGGED row (fewer struct values than
        // fields) null-fills the missing fields — under Spark 4's
        // default ANSI mode a plain element_at would kill the whole
        // load with INVALID_ARRAY_INDEX (the reference's loader
        // null-fills bad values, as did pre-ANSI Spark)
        val d = math.max(depth, 1)
        struct(fields.zipWithIndex.map { case (f, i) =>
          parseAtDepth(try_element_at(split(raw, delimAt(delims, d)), lit(i + 1)),
            f.dataType, delims, d + 1).as(f.name)
        }.toSeq: _*)
      case other =>
        // try_cast for the same reason: a malformed numeric/timestamp
        // value becomes NULL (legacy CSV-load semantics) instead of an
        // ANSI NUMBER_FORMAT error failing the job
        raw.try_cast(other)
    }

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
    *   complex_delimiter_level_1 / _2 (reference set) and _3 for
    *     third-level nesting (defaults to U+0001).
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
    val extra = o.get("complex_delimiter_level_3")
      .map(d => java.util.regex.Pattern.quote(d) +: ExtraLevels.tail)
      .getOrElse(ExtraLevels)
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
    // the length check guards BOTH branches: in the headerless case an
    // oversized fileheader would otherwise surface later as a cryptic
    // unresolved _cN error instead of this message
    fileHeader.foreach(names => require(names.length == raw0.columns.length,
      s"fileheader has ${names.length} names for ${raw0.columns.length} columns"))
    val raw = fileHeader.fold(raw0)(names => raw0.toDF(names: _*))
    val fileCols: Option[Seq[String]] =
      if (hasHeaderRow || fileHeader.isDefined) Some(raw.columns.toSeq) else None
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val src = fileCols match {
        case Some(names) =>
          val j = names.indexWhere(_.equalsIgnoreCase(f.name))
          require(j >= 0, s"column ${f.name} missing from file header $names")
          // backtick-quote: a header name containing dots must resolve
          // as the flat CSV column, not as a nested-field reference
          col(s"`${names(j)}`")
        case None => col(s"_c$i")
      }
      parseColumn(src, f.dataType, l1, l2, extra).as(f.name)
    }
    raw.select(cols.toSeq: _*)
  }
}
