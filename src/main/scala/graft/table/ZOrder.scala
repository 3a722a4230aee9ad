package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional data skipping — the
  * Spark-native analog of the reference's MDKey sort (all dictionary
  * dimensions bit-packed into one multi-dimensional key and the file
  * sorted by it; core/.../keygenerator/mdkey/Bits.java,
  * MultiDimKeyVarLengthGenerator.java).
  *
  * Construction: each column is mapped to an equi-depth bucket id
  * (exact quantile boundaries, so skew cannot starve buckets), and the
  * bucket ids' bits are interleaved into one long. Writing
  * range-partitioned + sorted by that key makes EVERY participating
  * column's min/max tight per file/row-group — a range predicate on
  * any single dimension (or several) skips most files, where a
  * lexicographic multi-column sort only helps prefixes.
  *
  * Scale: boundary computation is one quantile job (driver holds
  * 2^bits × ncols doubles); the z-value itself is a pure expression, so
  * the layout pass is repartitionByRange + local sort — the same
  * shuffle a plain sorted write costs.
  */
object ZOrder {

  /** Bucket id (0 .. 2^bits-1) of a numeric column via exact
    * equi-depth quantile boundaries.
    */
  private def bucketExpr(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c.cast("double") >= b, 1).otherwise(0)
    }

  /** The interleaved z-value expression for pre-computed boundaries. */
  def zValue(cols: Seq[(Column, Seq[Double])], bits: Int): Column = {
    val buckets = cols.map { case (c, bs) => bucketExpr(c, bs) }
    val n = cols.size
    val parts = for {
      j <- 0 until bits
      (b, k) <- buckets.zipWithIndex
    } yield (shiftright(b.cast("long"), j).bitwiseAND(1L) * (1L << (j * n + k)))
    parts.reduce(_ + _)
  }

  /** Target bytes per z-ordered output file (the usual DFS-friendly
    * size: big enough for tight row groups, small enough to skip).
    */
  private val TargetFileBytes = 128L * 1024 * 1024

  /** Output partition count derived from the input's optimizer size
    * estimate: one ~128 MB file per partition. A fixed count would
    * either funnel a 100 TB load through a handful of write tasks or
    * shred a small one into confetti; deriving from size keeps file
    * granularity constant as the data scales. Falls back to the
    * cluster's default parallelism when the plan has no usable
    * estimate (e.g. a local in-memory relation).
    */
  private def derivePartitions(df: DataFrame): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val fallback = df.sparkSession.sparkContext.defaultParallelism
    // Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue
    // unless tuned) for plans it cannot size (LogicalRDD, some views);
    // that sentinel IS a valid long, so treat anything at or beyond it
    // as "unknown", not "huge" — otherwise a tiny RDD-backed load gets
    // repartitionByRange(1000000) and wedges.
    val unknown = bytes <= 0 || !bytes.isValidLong ||
      bytes.toLong >= df.sparkSession.sessionState.conf.defaultSizeInBytes
    if (unknown) fallback
    else math.max(1L, math.min(1000000L,
      (bytes.toLong + TargetFileBytes - 1) / TargetFileBytes)).toInt
  }

  /** Rewrite a DataFrame into z-ordered layout over `zcols` (numeric
    * columns). Each output file covers one z-range, so per-file
    * min/max of every z column is tight. `files` ≤ 0 (the default)
    * derives the partition count from the input size; pass an explicit
    * count only to pin the layout (tests, re-layout experiments).
    *
    * Quantile precision: equi-depth bucketing only needs boundaries
    * good to a fraction of a bucket, so the sketch runs at a nonzero
    * epsilon well under the bucket width (1/2^bits) — an exact
    * (epsilon 0) pass holds every distinct value on the driver, which
    * at 100 TB is its own job-killer for no skipping benefit.
    */
  def layout(df: DataFrame, zcols: Seq[String], bits: Int = 6,
             files: Int = 0): DataFrame = {
    val parts = if (files > 0) files else derivePartitions(df)
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val epsilon = 1.0 / ((nb + 1) * 8)
    val boundaries = df.stat.approxQuantile(zcols.toArray, probs, epsilon)
    val z = zValue(zcols.zip(boundaries.map(_.toSeq)).map {
      case (c, bs) => (col(c), bs)
    }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
