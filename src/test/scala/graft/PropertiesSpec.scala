package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Property-based checks (SURVEY.md §5.2d) driven by ScalaCheck
  * generators with fixed seeds (no scalatest-plus bridge in the
  * offline cache, so sampling is explicit).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOf(word).map(_.mkString(" "))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("shingle count is max(0, tokens-2) and every shingle has >= 3 words") {
    val docs = (1 to 10).map(i => sample(doc, i))
    val rows = docs.toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.wordShingles(col("text")).as("sh"),
        col("text"))
      .collect()
    rows.foreach { r =>
      val n = r.getInt(0)
      val sh = r.getSeq[String](1)
      assert(sh.length == math.max(0, n - 2),
        s"text='${r.getString(2)}' n=$n shingles=${sh.length}")
      sh.foreach(s => assert(s.split(" ").length >= 3))
    }
  }

  test("identical texts always get identical minhash signatures") {
    val ds = (1 to 8).map(i => sample(doc.suchThat(_.split("\\s+").length >= 3), 100 + i))
    ds.foreach { d =>
      val sigs = Seq(d, d).toDF("text")
        .select(TextFunctions.minhashSignature(
          TextFunctions.wordShingles(col("text")), 8).as("sig"))
        .collect().map(_.getSeq[String](0))
      assert(sigs(0) == sigs(1))
      assert(sigs(0).length == 8)
    }
  }

  test("segment store round-trips arbitrary rows exactly") {
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.long, word, Gen.choose(-1e6, 1e6)))
    for (seed <- 1 to 3) {
      val rows = sample(gen, seed.toLong)
      val root = java.nio.file.Files
        .createTempDirectory("graft_prop").resolve("t").toString
      val df = rows.toDF("id", "s", "v")
      val t = graft.table.SegmentedTable.create(spark, root, df.schema, Map.empty)
      t.load(df)
      val back = t.read().as[(Long, String, Double)].collect().sorted
      assert(back.sameElements(rows.map(r => (r._1, r._2, r._3)).sorted))
    }
  }
}
