package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("df.write.format(graft) / spark.read.format(graft) round trip") {
    val root = Files.createTempDirectory("graft_src").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")

    n.write.format("graft").mode(SaveMode.ErrorIfExists)
      .option("sort_columns", "n_nationkey").save(root)
    n.write.format("graft").mode(SaveMode.Append).save(root)

    val back = spark.read.format("graft").load(root)
    assert(back.count() == 50)
    assert(back.schema == n.schema)

    // reads go through the vectorized parquet scan with pushdown
    val filtered = back.filter(col("n_nationkey") === 7)
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("FileScan parquet"), planStr.take(1500))
    assert(planStr.contains("PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,7)"),
      planStr.take(1500))
    assert(filtered.count() == 2)

    // overwrite replaces all live segments
    n.limit(3).write.format("graft").mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft").load(root).count() == 3)

    // deleted segments disappear from reads
    val t = graft.table.SegmentedTable.open(spark, root)
    val liveIds = t.showSegments().filter(_.status == "SUCCESS").map(_.id)
    t.deleteSegments(liveIds)
    t.load(n.limit(9))
    assert(spark.read.format("graft").load(root).count() == 9)
  }
}
