package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dictionary encoding — functional parity with the reference's
  * dictionary subsystem (GlobalDictionaryUtil.scala:407-476: distinct
  * values per dimension → sorted → surrogate ids; sort_index so ids
  * are order-preserving).
  *
  * Ids are assigned by sorted value (dense, 1-based), which makes them
  * ORDER-PRESERVING: range predicates on the encoded column are
  * equivalent to range predicates on the value, the property the
  * reference's MDKey sort relies on. On Spark the dictionary is a
  * DataFrame; encode/decode are broadcast joins (dictionaries are
  * small by definition — high-cardinality columns should stay
  * unencoded, the reference's DICTIONARY_EXCLUDE).
  */
object GlobalDictionary {

  /** Dictionaries must stay broadcast-small: the rank assignment is an
    * unpartitioned window (all distinct values through one task) and
    * encode/decode broadcast the result. Above this many distinct
    * values the build FAILS FAST instead of silently hanging a
    * 100 TB job on a single-task sort — mirroring the reference's
    * DICTIONARY_EXCLUDE contract that high-cardinality columns are
    * not dictionary dims.
    */
  val MaxCardinality: Long = 10_000_000L

  /** Build the dictionary for one column: (value, id) with id =
    * 1-based rank in value order.
    *
    * The guard is one approx_count_distinct pass (map-side HLL
    * sketches, no data shuffle) BEFORE the build — the lazy plan
    * cannot check itself until the single-task sort has already run,
    * which is exactly the hang the guard exists to prevent. The
    * ceiling is therefore approximate (±a few % near the boundary),
    * which is the right contract for an order-of-magnitude "this
    * column is not a dictionary dim" check.
    *
    * @throws IllegalArgumentException when the column's approximate
    *         distinct count exceeds [[MaxCardinality]]
    */
  def build(df: DataFrame, column: String): DataFrame =
    build(df, column, MaxCardinality)

  def build(df: DataFrame, column: String, maxCardinality: Long): DataFrame = {
    val card = df.agg(approx_count_distinct(col(column)).as("c"))
      .head().getLong(0)
    require(card <= maxCardinality,
      s"column '$column' has ~$card distinct values — exceeds the " +
        s"dictionary ceiling of $maxCardinality; high-cardinality " +
        "columns must stay unencoded (reference DICTIONARY_EXCLUDE)")
    df.select(col(column).as("value")).distinct()
      .filter(col("value").isNotNull)
      .withColumn("id", row_number().over(Window.orderBy(col("value"))).cast("long"))
  }

  /** Append `column`_id — the surrogate for `column` — keeping the
    * original column (null values stay null). The dictionary's
    * internal (value, id) names are remapped before the join so a
    * caller frame carrying its own `id`/`value` column (the common
    * case) never hits an ambiguous reference.
    */
  def encode(df: DataFrame, dict: DataFrame, column: String): DataFrame = {
    val d = dict.select(col("value").as(column), col("id").as("__dict_id"))
    df.join(broadcast(d), Seq(column), "left")
      .withColumn(column + "_id", col("__dict_id"))
      .drop("__dict_id")
  }

  /** Inverse mapping: append `asColumn` decoded from `idColumn`. */
  def decode(df: DataFrame, dict: DataFrame, idColumn: String,
             asColumn: String): DataFrame = {
    val d = dict.select(col("id").as(idColumn), col("value").as("__dict_value"))
    df.join(broadcast(d), Seq(idColumn), "left")
      .withColumnRenamed("__dict_value", asColumn)
  }
}
