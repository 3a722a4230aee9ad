package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.SegmentedTable

/** Ordered-scan elision on sort_columns: a global ORDER BY over an
  * ascending nulls-first prefix of a SMALL single sorted segment plans
  * as a K-way merge of the per-file runs — no SortExec, no Exchange —
  * and must return exactly the rows a real sort returns, in key order.
  * Everything outside that envelope (multi-segment, desc, non-prefix,
  * oversized, unsorted tables) keeps Spark's SortExec.
  */
class MergeSortedScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshRoot(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft_mss_$tag").resolve("t").toString

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("single sorted segment: ORDER BY sort-prefix elides the sort, rows exact") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val t = SegmentedTable.create(spark, freshRoot("one"), li.schema,
      Map("sort_columns" -> "l_shipdate,l_orderkey"))
    t.load(li)

    val q = t.read().orderBy(col("l_shipdate"))
    val p = planOf(q)
    assert(p.contains("GraftMergeSortedScan"), p)
    assert(!p.contains("Sort "), p)
    // the contract of ORDER BY: key order globally non-decreasing and
    // the multiset of rows identical to the real sort's
    val got = q.select(col("l_shipdate"), col("l_orderkey")).collect()
    val keys = got.map(_.getAs[java.time.LocalDateTime](0))
    assert(keys.sliding(2).forall {
      case Array(a, b) => !a.isAfter(b)
      case _ => true
    })
    val want = li.orderBy(col("l_shipdate"))
      .select(col("l_shipdate"), col("l_orderkey")).collect()
    assert(got.sortBy(_.toString).toSeq == want.sortBy(_.toString).toSeq)

    // the full two-column prefix elides too, and is then a TOTAL
    // order — sequence equality, not just multiset
    val q2 = t.read().orderBy(col("l_shipdate"), col("l_orderkey"))
      .select(col("l_orderkey"), col("l_shipdate"))
    assert(planOf(q2).contains("GraftMergeSortedScan"), planOf(q2))
    val want2 = li.orderBy(col("l_shipdate"), col("l_orderkey"))
      .select(col("l_orderkey"), col("l_shipdate")).collect()
    assert(q2.collect().toSeq == want2.toSeq)
  }

  test("multi-segment, desc, non-prefix, oversized and unsorted keep SortExec") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val t = SegmentedTable.create(spark, freshRoot("multi"), li.schema,
      Map("sort_columns" -> "l_shipdate"))
    t.load(li.filter(col("l_orderkey") % 2 === 0))
    t.load(li.filter(col("l_orderkey") % 2 =!= 0))
    // multi-segment: per-file runs span segments with overlapping
    // ranges — the strategy declines, Spark sorts
    val qm = t.read().orderBy(col("l_shipdate"))
    assert(!planOf(qm).contains("GraftMergeSortedScan"), planOf(qm))
    assert(planOf(qm).contains("Sort"), planOf(qm))

    val t1 = SegmentedTable.create(spark, freshRoot("one2"), li.schema,
      Map("sort_columns" -> "l_shipdate"))
    t1.load(li)
    // desc violates the written nulls-first ascending run order
    assert(!planOf(t1.read().orderBy(col("l_shipdate").desc))
      .contains("GraftMergeSortedScan"))
    // a non-prefix column is not what the files are sorted by
    assert(!planOf(t1.read().orderBy(col("l_orderkey")))
      .contains("GraftMergeSortedScan"))
    // above the size bound the single-task merge is the wrong shape
    spark.conf.set(MergeSortedScan.MaxBytesKey, "1")
    try assert(!planOf(t1.read().orderBy(col("l_shipdate")))
      .contains("GraftMergeSortedScan"))
    finally spark.conf.unset(MergeSortedScan.MaxBytesKey)
    // a table with no sort_columns has no run order to merge
    val tu = SegmentedTable.create(spark, freshRoot("unsorted"), li.schema,
      Map.empty)
    tu.load(li)
    assert(!planOf(tu.read().orderBy(col("l_shipdate")))
      .contains("GraftMergeSortedScan"))
  }
}
