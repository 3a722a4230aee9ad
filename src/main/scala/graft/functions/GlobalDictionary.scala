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

  /** Build the dictionary for one column: (value, id) with id =
    * 1-based rank in value order.
    */
  def build(df: DataFrame, column: String): DataFrame =
    df.select(col(column).as("value")).distinct()
      .filter(col("value").isNotNull)
      .withColumn("id", row_number().over(Window.orderBy(col("value"))).cast("long"))

  /** Replace `column` with its surrogate id (null values stay null). */
  def encode(df: DataFrame, dict: DataFrame, column: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("value", column)), Seq(column), "left")
      .withColumn(column + "_id", col("id"))
      .drop("id")

  /** Inverse mapping. */
  def decode(df: DataFrame, dict: DataFrame, idColumn: String,
             asColumn: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("id", idColumn)), Seq(idColumn), "left")
      .withColumnRenamed("value", asColumn)
}
