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

  test("property: superset guarantee holds for arbitrary streams, splits and k") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    // drive the aggregate's own update/merge state machine directly
    // (no Spark job per case): random streams over a small alphabet,
    // random partition splits, random k — the merged sketch's key set
    // must contain every item with true frequency > n/(k+1)
    val gen = for {
      k <- Gen.choose(1, 12)
      items <- Gen.listOfN(400,
        Gen.frequency((8, Gen.choose(0, 4)), (2, Gen.choose(5, 60))))
      cuts <- Gen.listOfN(3, Gen.choose(0, items.size))
    } yield (k, items.map(i => s"w$i"), cuts.sorted)
    val prop = forAll(gen) { case (k, items, cuts) =>
      val sketch = MgCandidates(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), k)
      val parts = (0 +: cuts :+ items.size).sliding(2).map {
        case Seq(a, b) => items.slice(a, b)
      }.toList
      val merged = parts.map { part =>
        val b = sketch.createAggregationBuffer()
        part.foreach { w =>
          // update() evaluates the child against a row; emulate by
          // driving the same internal path through a literal child
          val s2 = MgCandidates(
            org.apache.spark.sql.catalyst.expressions.Literal(w), k)
          s2.update(b, org.apache.spark.sql.catalyst.InternalRow.empty)
        }
        b
      }.reduce(sketch.merge)
      val n = items.size
      val truth = items.groupBy(identity).collect {
        case (w, occ) if occ.size.toLong * (k + 1) > n => w
      }.toSet
      val keys = merged.counts.keySet.toSet
      Prop(truth.subsetOf(keys)) :| s"missing ${truth -- keys} (k=$k)"
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("a uniform stream wider than k yields at most k candidates, no crash") {
    val data = (1 to 5000).map(i => s"u_${i % 400}") // 400 distinct, k=10
    val cand = data.toDF("v").repartition(11)
      .agg(mgCandidates(col("v"), 10).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cand.size <= 10)
    assert(cand == cand.sorted, "eval must return a deterministic sorted array")
  }

  test("keys longer than 64KB serialize through the shuffle (no writeUTF cap)") {
    import spark.implicits._
    import graft.functions.MgCandidates.mgCandidates
    val big = "x" * 70000 // over writeUTF's 65535-byte modified-UTF-8 cap
    val df = (Seq.fill(5)(big) ++ Seq("small")).toDF("k")
      .repartition(4) // force partial sketches through serialize/merge
    val cands = df.agg(mgCandidates(col("k"), 4).as("c"))
      .head().getSeq[String](0)
    assert(cands.contains(big))
  }

  test("non-atomic input fails analysis, not at runtime") {
    import spark.implicits._
    import graft.functions.MgCandidates.mgCandidates
    val df = Seq(Seq("a", "b")).toDF("arr")
    val ex = intercept[Exception] {
      df.agg(mgCandidates(col("arr"), 4)).collect()
    }
    assert(ex.getMessage.contains("mg_candidates"), ex.getMessage)
  }
}
