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
}
