package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.MgCandidates.mgCandidates

/** The Misra-Gries candidate sketch: the superset guarantee (every
  * item with frequency > n/(k+1) survives the sketch AND the
  * distributed merge), the size bound, and the exactness of the
  * recount composition under pathological skew — the properties the
  * t22 gate's near-uniform corpus cannot stress.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skew: item i (1..m) appears ceil(c/i) times. */
  private def skewed(m: Int, c: Int): Seq[String] =
    (1 to m).flatMap(i => Seq.fill(math.max(1, c / i))(s"item_$i"))

  test("sketch keys are a superset of true heavy hitters across merges") {
    val data = skewed(500, 2000)
    val n = data.size
    val k = 20
    val truth = data.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, cnt) => cnt.toLong * (k + 1) > n }.keySet
    assert(truth.nonEmpty && truth.size < 20)
    // 37 partitions forces many partial sketches through the merge path
    val cand = data.toDF("v").repartition(37)
      .agg(mgCandidates(col("v"), k).as("c"))
      .collect()(0).getSeq[String](0).toSet
    assert(cand.size <= k, s"sketch must hold at most $k keys, got ${cand.size}")
    assert(truth.subsetOf(cand),
      s"missing true heavy hitters: ${truth -- cand}")
  }

  test("sketch + exact recount equals the exact groupBy answer") {
    val data = skewed(300, 1000)
    val df = data.toDF("v").repartition(17)
    val n = data.size.toLong
    val k = 25
    val cand = df.agg(mgCandidates(col("v"), 64).as("c"))
    val got = df.crossJoin(broadcast(cand))
      .filter(array_contains(col("c"), col("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, cnt) => cnt * k >= n }.toMap
    assert(got == want)
  }

  test("a uniform stream wider than k yields at most k candidates, no crash") {
    val data = (1 to 5000).map(i => s"u_${i % 400}") // 400 distinct, k=10
    val cand = data.toDF("v").repartition(11)
      .agg(mgCandidates(col("v"), 10).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cand.size <= 10)
    assert(cand == cand.sorted, "eval must return a deterministic sorted array")
  }
}
