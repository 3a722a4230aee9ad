package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** O(n²) reference dominance check. */
  private def bruteSkyline(pts: Seq[Seq[Double]]): Set[Seq[Double]] = {
    val distinct = pts.distinct
    distinct.filter { p =>
      !distinct.exists(q => q != p &&
        q.zip(p).forall { case (a, b) => a <= b } &&
        q.zip(p).exists { case (a, b) => a < b })
    }.toSet
  }

  test("2-D skyline equals the brute-force Pareto front") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(400)(Seq(rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    val df = pts.map(p => (p(0), p(1))).toDF("x", "y")
    val got = Skyline.skyline(df, Seq("x", "y"))
      .collect().map(r => Seq(r.getDouble(0), r.getDouble(1))).toSet
    assert(got == bruteSkyline(pts))
  }

  test("3-D skyline (beyond the 2-D window formulation) is exact") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(300)(Seq(rnd.nextInt(20).toDouble,
      rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
    val df = pts.map(p => (p(0), p(1), p(2))).toDF("a", "b", "c")
    val got = Skyline.skyline(df, Seq("a", "b", "c"))
      .collect().map(r => Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == bruteSkyline(pts))
  }

  test("duplicates collapse, nulls are excluded, single point survives") {
    val df = Seq(
      (Some(1.0), Some(1.0)), (Some(1.0), Some(1.0)), // duplicate point
      (Some(2.0), Some(0.5)),
      (None, Some(0.0)), (Some(0.0), None)            // null dims drop
    ).toDF("x", "y")
    val got = Skyline.skyline(df, Seq("x", "y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == Set((1.0, 1.0), (2.0, 0.5)))
  }

  test("float absorption cannot leave a dominated point in the skyline") {
    // 1e17 + 1.0 == 1e17 in doubles: both points tie on the float sum,
    // so only the lexicographic tie-break puts the dominator first —
    // order the dominated point first to force the failure mode
    val df = Seq((1e17, 1.0), (1e17, 0.0)).toDF("x", "y").coalesce(1)
    val got = Skyline.skyline(df, Seq("x", "y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == Set((1e17, 0.0)))
  }

  test("graft_skyline is FROM-able in SQL over views and graft tables") {
    val pts = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 1.0), (2.5, 3.5), (4.0, 4.0))
    pts.toDF("x", "y").createOrReplaceTempView("sky_src")
    val viaSql = spark.sql("SELECT * FROM graft_skyline('sky_src', 'x,y')")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(viaSql == Set((1.0, 5.0), (2.0, 3.0), (3.0, 1.0)))

    // over a graft table through the catalog
    spark.sql("CREATE GRAFT TABLE sky_t AS SELECT * FROM sky_src")
    try {
      val viaTable = spark.sql("SELECT * FROM graft_skyline('sky_t', 'x,y')")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(viaTable == viaSql)
    } finally spark.sql("DROP GRAFT TABLE sky_t")
  }

  test("local pruning never drops a global-skyline point across partitions") {
    // anti-correlated band: every distinct point is on the front, the
    // worst case for phase-2 size — the result must still be exact
    val pts = (0 until 1000).map(i => (i.toDouble, (999 - i).toDouble))
    val df = pts.toDF("x", "y").repartition(8)
    val got = Skyline.skyline(df, Seq("x", "y")).count()
    assert(got == 1000)
  }

  test("anti-correlated worst case tree-reduces: no task merges more than fanIn partitions") {
    // adversarial corpus: 100k anti-correlated points — EVERY point
    // survives every local skyline, so the old repartition(1) global
    // phase would put all 100k in one task. With shuffle parallelism
    // above fanIn (the 1000-executor shape), the tree reduction must
    // (a) stay exact and (b) show at least two reduction rounds (two
    // no-shuffle Repartition nodes) in the plan, i.e. the final task
    // receives at most fanIn partitions' skylines, never the union.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    try {
      val n = 100000
      val df = spark.range(n)
        .select(col("id").cast("double").as("x"),
          (lit(n - 1) - col("id")).cast("double").as("y"))
      val sky = Skyline.skyline(df, Seq("x", "y"))
      val coalesces = sky.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
            if !r.shuffle => r
      }
      assert(coalesces.size >= 2,
        s"expected >=2 tree-reduction rounds at 256 shuffle partitions, plan had ${coalesces.size}")
      assert(sky.count() == n)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
