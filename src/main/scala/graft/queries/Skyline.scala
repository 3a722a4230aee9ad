package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto-dominance) operator — the missing Spark capability
  * "Integration of Skyline Queries into Spark SQL" (EDBT 2023) adds:
  * the distinct points NOT dominated by any other point, where q
  * dominates p iff q ≤ p on every dimension and q < p on at least one
  * (all dimensions MINIMIZED; negate a column to maximize it).
  *
  * Spark-first plan, the paper's two-phase physical-operator shape:
  *
  *  1. distinct() the dimension projection (duplicates never dominate
  *     each other, and dedup collapses the input to the point set —
  *     one keyed shuffle, the only corpus-sized exchange).
  *  2. LOCAL skylines per partition via sort-filter-skyline (SFS):
  *     sort by the monotone dimension sum — a dominator has a strictly
  *     smaller sum, so each candidate only tests against the kept
  *     buffer, O(n·|skyline|) per partition. This is genuine
  *     per-partition imperative logic (the documented mapPartitions
  *     case): no relational form expresses the running skyline buffer
  *     without a single-partition global window.
  *  3. GLOBAL skyline = SFS over the union of local skylines, one
  *     final task. Sound because dominance is transitive: a point
  *     dominated locally is also dominated globally, so local
  *     filtering never removes a global-skyline point. Local skylines
  *     are small for correlated/independent dims (the common case);
  *     fully anti-correlated data degrades toward |input| — the
  *     documented worst case of every skyline algorithm.
  *
  * Null dimensions are excluded up front (dominance is undefined on
  * null). Dimensions are compared as doubles; the correctness gate
  * (q42) cross-validates this SFS implementation against a DIFFERENT
  * algorithm in the oracle (the 2-D sorted running-min formulation),
  * so an SFS bug cannot self-confirm.
  */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline requires at least one dimension")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df
      .filter(dims.map(col(_).isNotNull).reduce(_ && _))
      .select(array(dims.map(col(_).cast("double")): _*).as("p"))
      .distinct()
      .as[Array[Double]]
    val local = pts.mapPartitions(sfs)
    // the union of local skylines is small by construction; one final
    // SFS pass over it yields the exact global skyline
    val global = local.repartition(1).mapPartitions(sfs)
    global.select(dims.indices.map(i => col("value")(i).as(dims(i))): _*)
  }

  /** Sort-filter-skyline over one in-memory partition: sum-ascending
    * order guarantees a dominator precedes everything it dominates.
    * Float subtlety: IEEE addition is monotone, so a dominator's FLOAT
    * sum is ≤ the dominated point's — but absorption can make them
    * EQUAL (1e17 + 1.0 == 1e17), and a stable sort would then leave
    * the dominated point first and never re-test it. The
    * lexicographic tie-break restores the invariant exactly: within a
    * sum tie, a dominator (≤ on every dim, < on one) always sorts
    * first. Sums are precomputed once per point, not per comparison.
    */
  private def sfs(it: Iterator[Array[Double]]): Iterator[Array[Double]] = {
    val arr = it.toArray.map(p => (p.sum, p))
    java.util.Arrays.sort(arr, (a: (Double, Array[Double]), b: (Double, Array[Double])) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c
      else {
        var d = 0
        var r = 0
        while (r == 0 && d < a._2.length) {
          r = java.lang.Double.compare(a._2(d), b._2(d))
          d += 1
        }
        r
      }
    })
    val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < arr.length) {
      val c = arr(i)._2
      var dominated = false
      var j = 0
      while (!dominated && j < kept.length) {
        val k = kept(j)
        var allLe = true
        var anyLt = false
        var d = 0
        while (allLe && d < c.length) {
          if (k(d) > c(d)) allLe = false
          else if (k(d) < c(d)) anyLt = true
          d += 1
        }
        dominated = allLe && anyLt
        j += 1
      }
      if (!dominated) kept += c
      i += 1
    }
    kept.iterator
  }
}
