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

  test("applyMerges segments with the learned table; no merges means characters") {
    val docs = Seq((1L, "to to tot"), (2L, "to")).toDF("doc_id", "text")
    val m = BpeTrainer.learnMerges(docs, "text", 3).orderBy("iter")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // learned (t,o) then (to,t): every word collapses to one symbol
    val out = BpeTrainer.applyMerges(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L), (2L, 1L, 1L)))
    // the empty merge table degenerates to character segmentation
    val raw = BpeTrainer.applyMerges(docs, "doc_id", "text", Nil)
      .orderBy("doc_id").collect()
    assert(raw.map(_.getLong(2)).toSeq == Seq(7L, 2L))
    // applying a PREFIX of the merges can only coarsen less: token
    // counts are monotone non-increasing in merge count
    val partial = BpeTrainer.applyMerges(docs, "doc_id", "text", m.take(1))
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(partial.zip(out.map(_.getLong(2))).forall { case (p, f) => p >= f })
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
