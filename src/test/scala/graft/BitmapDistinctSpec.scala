package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitmapDistinctCount.bitmapDistinctCount

class BitmapDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")

  test("matches exact countDistinct, grouped and global") {
    val got = li.groupBy("l_returnflag")
      .agg(bitmapDistinctCount(col("l_partkey")).as("d"))
      .orderBy("l_returnflag").as[(String, Long)].collect()
    val want = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .orderBy("l_returnflag").as[(String, Long)].collect()
    assert(got.sameElements(want))

    val g = li.agg(bitmapDistinctCount(col("l_orderkey"))).as[Long].head()
    val w = li.agg(countDistinct(col("l_orderkey"))).as[Long].head()
    assert(g == w)
  }

  test("handles nulls and negatives") {
    val df = Seq[java.lang.Long](1L, 2L, null, 2L, -5L, -5L, 0L).toDF("x")
    val got = df.agg(bitmapDistinctCount(col("x"))).as[Long].head()
    assert(got == 4)
  }

  test("survives shuffle merge across many partitions") {
    val df = spark.range(0, 100000).select((col("id") % 1234).as("k"))
      .repartition(16)
    val got = df.agg(bitmapDistinctCount(col("k"))).as[Long].head()
    assert(got == 1234)
  }
}
