package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Files that contain at least one row matching the predicate —
    * the lower bound on what min/max file skipping must scan.
    */
  private def filesWithMatches(path: String,
      pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).filter(pred)
      .select(input_file_name()).distinct().count()

  test("z-order layout clusters both dimensions; plain sort only one") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val dir = Files.createTempDirectory("graft_zorder")
    val plainPath = s"$dir/plain"
    val zPath = s"$dir/zordered"
    val files = 16

    // plain layout: lexicographic sort by the first column only
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.parquet(plainPath)
    ZOrder.layout(li, Seq("l_orderkey", "l_partkey"), bits = 6, files = files)
      .write.parquet(zPath)

    assert(spark.read.parquet(zPath).count() == li.count())

    // predicate on the SECOND dimension: plain layout scatters it over
    // every file; z-order confines it
    val pred = col("l_partkey") >= 20 && col("l_partkey") < 40
    val plainFiles = filesWithMatches(plainPath, pred)
    val zFiles = filesWithMatches(zPath, pred)
    assert(zFiles < plainFiles,
      s"z-order should cluster l_partkey: z=$zFiles plain=$plainFiles")

    // and the first dimension stays reasonably clustered too
    val pred1 = col("l_orderkey") < 150
    val zFiles1 = filesWithMatches(zPath, pred1)
    assert(zFiles1 <= files / 2,
      s"l_orderkey should stay clustered under z-order: $zFiles1 of $files")
  }

  test("OPTIMIZE ZORDER BY: re-layout preserved rows, persisted props, CDC-invisible") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val root = Files.createTempDirectory("graft_opt").resolve("t").toString
    val t = SegmentedTable.create(spark, root, li.schema,
      Map("sort_columns" -> "l_orderkey"))
    t.load(li.filter(col("l_orderkey") % 2 === 0))
    t.load(li.filter(col("l_orderkey") % 2 === 1))
    val before = t.currentVersion
    val total = li.count()

    val opt = t.optimizeZOrder(Seq("l_orderkey", "l_suppkey"))
    // rows exactly preserved through the re-layout
    assert(opt.read().count() == total)
    assert(opt.showSegments().count(_.status == "SUCCESS") == 1)
    // property persisted — a reopened handle (and future writes) keep it
    assert(SegmentedTable.open(spark, root).zorderColumns ==
      Seq("l_orderkey", "l_suppkey"))
    // pure reorganization: invisible to the change feed
    assert(opt.readChanges(before, opt.currentVersion).count() == 0)

    // SQL surface: the command parses and runs through the catalog
    val store = spark.conf.get("spark.graft.store")
    spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
      .createOrReplaceTempView("nation_opt_src")
    spark.sql("CREATE GRAFT TABLE opt_nations AS SELECT * FROM nation_opt_src")
    spark.sql("OPTIMIZE GRAFT TABLE opt_nations ZORDER BY (n_regionkey, n_nationkey)")
    assert(SegmentedTable.open(spark, s"$store/opt_nations").zorderColumns ==
      Seq("n_regionkey", "n_nationkey"))
    assert(spark.sql("SELECT count(*) FROM graft_table('opt_nations')")
      .head().getLong(0) == 25)
    spark.sql("DROP GRAFT TABLE opt_nations")
  }

  test("output partition count tracks input size (no fixed fan-in)") {
    // an explicit count is honored (layout pinning)
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    assert(ZOrder.layout(li, Seq("l_orderkey", "l_partkey"), files = 5)
      .rdd.getNumPartitions == 5)

    // derived: a KB-scale input must not fan out into dozens of files
    val small = ZOrder.layout(li, Seq("l_orderkey", "l_partkey"))
    assert(small.rdd.getNumPartitions <= 4,
      s"tiny input produced ${small.rdd.getNumPartitions} partitions")

    // derived: a ~480 MB estimate (Range stats: rows × row width) maps
    // to multiple ~128 MB files — the count grows with the data where a
    // hard-coded `files = 32` would stay flat from 1 MB to 100 TB
    val big = spark.range(30L * 1000 * 1000)
      .selectExpr("id AS a", "id * 7 % 1000 AS b")
    val bigParts = ZOrder.layout(big, Seq("a", "b")).rdd.getNumPartitions
    assert(bigParts >= 2 && bigParts <= 16,
      s"~480MB estimate should derive a handful of files, got $bigParts")
  }

  test("unknown size estimate (LogicalRDD sentinel) falls back, not 1M partitions") {
    // an RDD-backed frame has no stats: Catalyst reports
    // spark.sql.defaultSizeInBytes (Long.MaxValue), which is a valid
    // long — it must be read as "unknown", not "huge"
    val rdd = spark.sparkContext.parallelize(Seq((1L, 2L), (3L, 4L), (5L, 6L)))
    val df = spark.createDataFrame(rdd).toDF("a", "b")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est >= spark.sessionState.conf.defaultSizeInBytes,
      s"precondition: LogicalRDD must report the unknown-size sentinel, got $est")
    val parts = ZOrder.layout(df, Seq("a", "b")).rdd.getNumPartitions
    assert(parts <= spark.sparkContext.defaultParallelism,
      s"tiny RDD-backed input derived $parts partitions")
    assert(ZOrder.layout(df, Seq("a", "b")).count() == 3)
  }
}
