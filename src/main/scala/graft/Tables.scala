package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Table access helpers for the driver-generated TPC-H-ish test data.
  *
  * All queries in [[SparkEntry.queries]] read via these helpers so the
  * scan is a plain vectorized Parquet scan that Catalyst can push
  * projection/filters into (reference pushes these into its own scan:
  * integration/.../sql/CarbonOperators.scala:232-376 — in the Spark-first
  * design Parquet + Catalyst provide the same pushdown for free).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = normalizeEventTs(rawEvents(s, d))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The events table exactly as stored — `ts` keeps whatever type the
    * parquet encoding yields. File-STREAM sources need this schema (a
    * user-supplied stream schema must match the footer, so the epoch-ns
    * normalization has to happen as a projection AFTER the scan — see
    * [[normalizeEventTs]]); everything else should use [[events]].
    * `nanosAsLong` stays set so legacy TIMESTAMP(NANOS) files (which
    * Spark's reader otherwise rejects) surface as epoch-nano longs.
    */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** Normalize an event-time column to explicit epoch-NANOSECOND longs,
    * whatever the storage encoding delivered:
    *   - `LongType` — already epoch-nanos (TIMESTAMP(NANOS) parquet read
    *     via `nanosAsLong`, or data that stored longs outright): pass
    *     through unchanged.
    *   - `TimestampType` / `TimestampNTZType` (TIMESTAMP(MICROS/MILLIS)
    *     parquet — what real-world writers overwhelmingly emit):
    *     `unix_micros × 1000`. The session time zone is pinned UTC in
    *     every entry point, so the NTZ→instant cast is value-preserving.
    *
    * This is the engine's event-time portability boundary — the
    * reference isolates storage encoding behind a pluggable direct
    * dictionary (core/src/main/java/org/carbondata/core/keygenerator/
    * directdictionary/timestamp/TimeStampDirectDictionaryGenerator.java);
    * here one projection makes every downstream hour-bucket constant
    * (`ts div 3600000000000`) and every DuckDB oracle (`epoch_ns(ts)`)
    * encoding-independent. Works identically on batch and streaming
    * DataFrames (pure projection, codegen'd, no shuffle).
    */
  def normalizeEventTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn(tsCol, unix_micros(col(tsCol).cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"event-time column '$tsCol' has unsupported type $other " +
            "(expected epoch-nanos LONG or a parquet TIMESTAMP)")
    }

  /** Exact decimal sum of a double column, returned as double.
    *
    * Summing raw doubles is order-dependent (Spark's partial/final agg
    * tree vs DuckDB's sequential sum differ in the last ulp), which
    * would break the driver's hash compare. Casting each value to
    * DECIMAL(18,2) first makes the sum exact and order-independent in
    * both engines; the single final cast back to double is then
    * deterministic and bit-identical. Oracle-side equivalent:
    * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact decimal mean of a double column as double (see [[dsum]]). */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(c))

  /** Exact revenue-style product sum: SUM(a * (1 - b)) computed in
    * decimal so it is order-independent, then cast to double once.
    */
  def dsumProduct(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(a.cast(DecimalType(18, 2)) * (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) - b.cast(DecimalType(18, 2))))
      .cast("double")
}
