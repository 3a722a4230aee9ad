package graft.mv

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AggTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var mvStore: String = _
  private val base = "/root/testdata/sf0.001/lineitem.parquet"

  override def beforeAll(): Unit = {
    mvStore = Files.createTempDirectory("graft_mv").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-mv-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.mv.store", mvStore)
      .withExtensions(e => e.injectOptimizerRule(s => AggTableRewrite(s)))
      .getOrCreate()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  test("matching aggregate is answered from the MV, with equal results") {
    AggTables.create(spark, "li_rollup", base,
      Seq("l_returnflag", "l_linestatus"),
      Seq("sum" -> "l_quantity", "min" -> "l_discount", "max" -> "l_extendedprice"))

    val q = spark.read.parquet(base)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sq"),
        max(col("l_extendedprice")).as("mx"),
        count(lit(1)).as("cnt"))

    // plan must scan the MV, not the base table
    val paths = scannedPaths(q)
    assert(paths.exists(_.contains("li_rollup")), s"scanned: $paths")
    assert(!paths.exists(_.endsWith("lineitem.parquet")), s"scanned: $paths")

    // and produce exactly the base-table answer (computed w/o the rule
    // via a plain session)
    val plain = SparkSession.builder().getOrCreate()
    val expect = spark.read.parquet(base)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sq"),
        max(col("l_extendedprice")).as("mx"),
        count(lit(1)).as("cnt"))
      .queryExecution.analyzed
    // evaluate expected through a fresh no-MV store to dodge the rule
    spark.conf.set("spark.graft.mv.store", "/nonexistent_mv_dir")
    val want = q.orderBy("l_returnflag").collect()
    spark.conf.set("spark.graft.mv.store", mvStore)
    val got = q.orderBy("l_returnflag").collect()
    assert(got.sameElements(want))
  }

  test("non-derivable aggregates are left untouched") {
    val q = spark.read.parquet(base)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
    assert(scannedPaths(q).exists(_.endsWith("lineitem.parquet")))
    // grouping outside MV dims: untouched
    val q2 = spark.read.parquet(base)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("s"))
    assert(scannedPaths(q2).exists(_.endsWith("lineitem.parquet")))
    // filter present: untouched
    val q3 = spark.read.parquet(base)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"))
    assert(scannedPaths(q3).exists(_.endsWith("lineitem.parquet")))
  }
}
