package graft.table

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("concurrent loads both commit (lock serializes the status flip)") {
    val root = Files.createTempDirectory("graft_conc").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, root, n.schema, Map.empty)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val loads = (1 to 4).map(_ => Future(t.load(n)))
    val ids = Await.result(Future.sequence(loads), 120.seconds)
    pool.shutdown()
    assert(ids.toSet.size == 4, s"segment ids must be distinct: $ids")
    assert(t.read().count() == 100)
    assert(t.showSegments().count(_.status == "SUCCESS") == 4)
  }

  test("partitioned load co-locates keys per file") {
    val root = Files.createTempDirectory("graft_part").resolve("t").toString
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val t = SegmentedTable.create(spark, root, li.schema,
      Map("partition_columns" -> "l_suppkey", "sort_columns" -> "l_orderkey"))
    t.load(li)
    assert(t.read().count() == li.count())
    // each l_suppkey appears in exactly one file
    val filesPerKey = t.read()
      .select(col("l_suppkey"), input_file_name().as("f"))
      .groupBy("l_suppkey")
      .agg(countDistinct("f").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(filesPerKey == 1, s"keys must be co-located, max files/key = $filesPerKey")
  }
}
