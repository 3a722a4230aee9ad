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

  test("unigram prune replays a hand-worked example and exhausts gracefully") {
    // wc: to×3, tot×1; 2 seed merges learn (t,o) then (to,t), leaving
    // symbols " to "(3) / " tot "(1).
    // Round 1: T=4; inv(c)=4e6 div (c+1); t/o have NO standalone rows
    // (fully absorbed), so each char costs 4e6 div 1:
    //   loss(to)  = 3·((4e6+4e6) − 4e6 div 4) = 3·7e6  = 21,000,000
    //   loss(tot) = 1·((3·4e6)   − 4e6 div 2) = 10,000,000  ← argmin
    // → prune "tot", re-split to " t o t ".
    // Round 2: symbols to:3, t:2, o:1; T=6:
    //   loss(to) = 3·((6e6 div 3 + 6e6 div 2) − 6e6 div 4) = 10,500,000
    // Round 3: no multi-char piece remains → 2 rows, not 5.
    val docs = Seq((1L, "to to tot"), (2L, "to")).toDF("doc_id", "text")
    val out = UnigramTrainer.prune(docs, "text", seedMerges = 2, rounds = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((1, "tot", 1L, 10000000L), (2, "to", 3L, 10500000L)))
  }

  test("unigram prune re-split is exact on self-adjacent runs") {
    // "abab" seeds to one symbol " abab " via (a,b) then (ab,ab);
    // pruning must re-split BOTH adjacent occurrences even though the
    // first replace pass consumes the shared delimiter — a single-pass
    // re-split would leave " a b a b" corrupted mid-round. After the
    // only multi-char piece goes, the vocabulary exhausts.
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val out = UnigramTrainer.prune(docs, "text", seedMerges = 2, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out.nonEmpty && out.head == ((1, "abab")))
    // subsequent prunes only ever see single characters or nothing
    assert(out.forall { case (_, p) => p == "abab" || p.length == 1 })
  }

  test("unigram prune log is deterministic across partitionings") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    def run(parts: Int) = UnigramTrainer
      .prune(docs.repartition(parts), "text", seedMerges = 6, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val a = run(1)
    val b = run(13)
    assert(a == b && a.length == 3)
    // every pruned piece is multi-char (the base alphabet is never
    // pruned) and carried a positive standalone count
    assert(a.forall { case (_, p, c, _) => p.length >= 2 && c > 0 })
  }
}
