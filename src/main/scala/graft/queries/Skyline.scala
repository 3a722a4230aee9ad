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
  *  3. GLOBAL skyline = TREE REDUCTION of the local skylines: fold
  *     partitions at fan-in [[fanIn]] per round, re-running SFS on
  *     each merged group, until one partition holds the result. Sound
  *     because dominance is transitive: a point dominated locally (or
  *     in any merged group) is also dominated globally, so no round
  *     removes a global-skyline point. Local skylines are small for
  *     correlated/independent dims (the common case) and the tree
  *     collapses in one round; fully anti-correlated data degrades
  *     toward |input| — the documented worst case of every skyline
  *     algorithm — but no single task ever processes more than fanIn
  *     partitions' skylines per round, so the worst case costs
  *     log_fanIn(P) rounds instead of one task swallowing the union.
  *
  * Null dimensions are excluded up front (dominance is undefined on
  * null). Dimensions are compared as doubles; the correctness gate
  * (q42) cross-validates this SFS implementation against a DIFFERENT
  * algorithm in the oracle (the 2-D sorted running-min formulation),
  * so an SFS bug cannot self-confirm.
  */
object Skyline {

  /** Merge fan-in of the global phase: each reduction round folds
    * fanIn partitions' local skylines into one task. 32 matches the
    * session's shuffle parallelism; at 1000 executors an anti-
    * correlated corpus still collapses in 2 rounds.
    */
  private val fanIn = 32

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline requires at least one dimension")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df
      .filter(dims.map(col(_).isNotNull).reduce(_ && _))
      .select(array(dims.map(col(_).cast("double")): _*).as("p"))
      .distinct()
      .as[Array[Double]]
    var cur = pts.mapPartitions(sfs)
    // tree-reduce the local skylines: coalesce (no shuffle — groups of
    // parent partitions merge in place) + SFS per group, halting when
    // one partition remains. The round structure is built STATICALLY
    // from the session's shuffle parallelism (what the distinct leaves
    // behind), keeping the plan fully lazy — consulting the runtime
    // partition count would force AQE to materialize stages during
    // plan construction. A coalesce target above the runtime partition
    // count (AQE shrank the shuffle) is a no-op passthrough, so the
    // static ladder is always a valid upper bound: no task ever merges
    // more than fanIn partitions' skylines.
    var parts = spark.sessionState.conf.numShufflePartitions
    while (parts > 1) {
      parts = math.max(1, parts / fanIn)
      cur = cur.coalesce(parts).mapPartitions(sfs)
    }
    cur.select(dims.indices.map(i => col("value")(i).as(dims(i))): _*)
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
