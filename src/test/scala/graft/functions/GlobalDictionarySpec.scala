package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GlobalDictionarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ids are dense, 1-based, and order-preserving") {
    import spark.implicits._
    val df = Seq("cherry", "apple", "banana", "apple", null)
      .toDF("fruit")
    val dict = GlobalDictionary.build(df, "fruit")
      .orderBy("id").collect()
    assert(dict.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("apple", 1L), ("banana", 2L), ("cherry", 3L)))

    val enc = GlobalDictionary.encode(df, GlobalDictionary.build(df, "fruit"), "fruit")
    // null values stay null; order preservation: value order == id order
    assert(enc.filter(col("fruit").isNull).select("fruit_id").head().isNullAt(0))
    assert(enc.filter(col("fruit") === "cherry").select("fruit_id")
      .head().getLong(0) == 3L)
  }

  test("cardinality above the ceiling fails fast instead of hanging") {
    import spark.implicits._
    val wide = (1 to 100).map(i => s"v$i").toDF("k")
    val err = intercept[IllegalArgumentException] {
      GlobalDictionary.build(wide, "k", maxCardinality = 10)
    }
    assert(err.getMessage.contains("exceeds the"))
    assert(err.getMessage.contains("DICTIONARY_EXCLUDE"))
    // at or below the ceiling builds fine
    assert(GlobalDictionary.build(wide, "k", maxCardinality = 200).count() == 100)
  }

  test("encode/decode survive caller frames that already carry id/value columns") {
    import spark.implicits._
    val df = Seq((1L, "b", "x"), (2L, "a", "y")).toDF("id", "value", "k")
    val dict = GlobalDictionary.build(df, "k")
    val enc = GlobalDictionary.encode(df, dict, "k")
    assert(enc.columns.toSet == Set("id", "value", "k", "k_id"))
    assert(enc.filter(col("k") === "x").head().getAs[Long]("k_id") == 1L)
    val dec = GlobalDictionary.decode(
      enc.withColumnRenamed("k_id", "kid"), dict, "kid", "k2")
    assert(dec.filter(col("k") === "x").head().getAs[String]("k2") == "x")
  }
}
