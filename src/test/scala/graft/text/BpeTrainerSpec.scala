package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges replays the classic hand example") {
    // wc: to x3, tot x1 → pairs (t,o)=4, (o,t)=1 → merge1 (t,o)
    // then " to " / " to t " → pairs (to,t)=1 → merge2; vocabulary
    // exhausts before k=3 (all words single-symbol)
    val docs = Seq((1L, "to to tot"), (2L, "to")).toDF("doc_id", "text")
    val m = BpeTrainer.learnMerges(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(m == Seq((1, "t", "o", 4L), (2, "to", "t", 1L)))
  }

  test("merge replace is exact on self-adjacent runs (the multi-pass contract)") {
    // "abab": symbols " a b a b " — one replace pass merges only the
    // first (a,b) occurrence (the consumed-delimiter effect); the
    // repeated passes must yield " ab ab ", so iteration 2 sees
    // (ab,ab). A single-pass implementation would learn (ab,a) here.
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val m = BpeTrainer.learnMerges(docs, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)))
  }

  test("learned merges are deterministic across partitionings") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    def run(parts: Int) = BpeTrainer
      .learnMerges(docs.repartition(parts), "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    val a = run(1)
    val b = run(13)
    assert(a == b && a.length == 4)
    // counts are non-increasing? NOT guaranteed in general BPE (a
    // merged symbol can participate in a more frequent later pair),
    // but every learned pair must have a positive corpus count
    assert(a.forall(_._4 > 0))
  }
}
