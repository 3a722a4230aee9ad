package graft.queries

import graft.TestSpark
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-analysis operators added in round 11: collocation mining
  * (t29), cross-source vocabulary overlap (t30), and the ANN recall
  * audit (s10 / [[Similarity.recallAtK]]).
  */
class CorpusAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // --- Similarity.recallAtK unit behavior ---

  private def results(rows: Seq[(Long, Int, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("query_id", "rank", "neighbor_id")
  }

  test("recallAtK: identical result sets score 1e6 ppm") {
    val t = results(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val out = Similarity.recallAtK(t, t, 3).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("hits") == 3L)
    assert(out.head.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("recallAtK: disjoint result sets score 0, partial floors exactly") {
    val t = results(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val miss = results(Seq((1L, 1, 20L), (1L, 2, 21L), (1L, 3, 22L)))
    assert(Similarity.recallAtK(t, miss, 3).collect()
      .head.getAs[Long]("recall_ppm") == 0L)
    // 1 of 3 → floor(1e6/3) = 333333 (integer div, not rounding)
    val one = results(Seq((1L, 1, 10L), (1L, 2, 21L), (1L, 3, 22L)))
    assert(Similarity.recallAtK(t, one, 3).collect()
      .head.getAs[Long]("recall_ppm") == 333333L)
  }

  test("recallAtK: rank order is irrelevant — recall is set overlap") {
    val t = results(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val reversed = results(Seq((1L, 1, 12L), (1L, 2, 11L), (1L, 3, 10L)))
    assert(Similarity.recallAtK(t, reversed, 3).collect()
      .head.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("recallAtK: every truth query appears even with no approx rows") {
    val t = results(Seq((1L, 1, 10L), (2L, 1, 10L)))
    val a = results(Seq((1L, 1, 10L)))
    val byQ = Similarity.recallAtK(t, a, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hits")).toMap
    assert(byQ == Map(1L -> 1L, 2L -> 0L))
  }

  // --- s10 gate over real data: recall against itself / the ladder ---

  test("s10: bucketed recall is bounded by 1e6 and brute-vs-brute is perfect") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val truth = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
    val self = Similarity.recallAtK(truth, truth, 3).collect()
    assert(self.nonEmpty && self.forall(_.getAs[Long]("recall_ppm") == 1000000L))
    val approx = Similarity.bucketedTopK(emb, q, "vec_id", "embedding", 3, 4)
    val audit = Similarity.recallAtK(truth, approx, 3).collect()
    assert(audit.length == self.length)
    assert(audit.forall { r =>
      val ppm = r.getAs[Long]("recall_ppm")
      ppm >= 0L && ppm <= 1000000L
    })
  }

  // --- two-stage IVF-PQ re-rank (s11 / Similarity.ivfPqRerankTopK) ---

  test("ivfPqRerankTopK: full-coverage shortlist re-ranks to exactly brute force") {
    // with nprobe = nlist and a corpus-sized shortlist, stage 1 keeps
    // every candidate, so the exact re-rank must reproduce brute force
    // — quantization can then only affect WHICH rows survive a
    // narrower shortlist, never the re-rank arithmetic itself
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 3)
    val nlist = 4
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist)
    val books = Similarity.trainCodebooks(emb, "embedding", 4, 16, 16)
    val n = emb.count().toInt
    val reranked = Similarity.ivfPqRerankTopK(emb, q, "vec_id", "embedding",
      3, n, cents, books, 4, 16, nlist)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))
    assert(reranked.collect().map(key).toSet == brute.collect().map(key).toSet)
  }

  test("ivfPqRerankTopK: rejects a shortlist smaller than k") {
    val emb = graft.Tables.embeddings(spark, sf)
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 4)
    val books = Similarity.trainCodebooks(emb, "embedding", 4, 16, 16)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqRerankTopK(emb, emb.filter(col("vec_id") < 1),
        "vec_id", "embedding", 5, 3, cents, books, 4, 16, 1)
    }
  }

  test("s11: re-rank emits k rows per query in exact-cosine order") {
    val out = graft.SparkEntry.queries("s11_pq_rerank")(spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length))
    }
  }

  // --- t32 length-outlier pruning / d09 cross-source dup audit ---

  test("t32: drop/keep verdicts partition every source, P5..P95 keeps the bulk") {
    val out = graft.SparkEntry.queries("t32_length_prune")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("kept")
      assert(r.getAs[Long]("dropped_low") + r.getAs[Long]("dropped_high") +
        kept == n)
      // exact bound from linear interpolation at h = q(n-1): at most
      // floor(0.05(n-1))+1 values sit strictly below P5, and at most
      // (n-1)-floor(0.95(n-1)) strictly above P95
      val maxLow = (0.05 * (n - 1)).toLong + 1
      val maxHigh = (n - 1) - (0.95 * (n - 1)).toLong
      assert(r.getAs[Long]("dropped_low") <= maxLow)
      assert(r.getAs[Long]("dropped_high") <= maxHigh)
      assert(kept >= n - maxLow - maxHigh,
        s"source ${r.getAs[String]("source")}: kept $kept of $n")
      assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
    }
  }

  test("d09: canonical cross-source pairs, bounded by the candidate total") {
    val out = graft.SparkEntry.queries("d09_cross_source_dups")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("dup_pairs") > 0L)
    }
    val allPairs = graft.dedup.Dedup.minhashCandidates(
      graft.Tables.documents(spark, sf), "doc_id", "text", 16, 4).count()
    assert(out.map(_.getAs[Long]("dup_pairs")).sum <= allPairs)
  }

  // --- SQ8 scalar quantization (s12 / Similarity.sq8*) ---

  test("SQ8 codec: codes stay in 0..255, reconstruction error is bounded") {
    val emb = graft.Tables.embeddings(spark, sf)
    val (mins, maxs) = Similarity.trainSq8Bounds(emb, "embedding", 64)
    val rows = emb.select(col("embedding").as("v"),
        Similarity.sq8Codes(col("embedding"), mins, maxs).as("codes"),
        Similarity.sq8Dequant(
          Similarity.sq8Codes(col("embedding"), mins, maxs),
          mins, maxs).as("deq"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Long](1)
      assert(codes.forall(c => c >= 0L && c <= 255L))
      val v = r.getSeq[Float](0)
      val deq = r.getSeq[Double](2)
      v.indices.foreach { i =>
        val step = (maxs(i) - mins(i)) / 255.0
        assert(math.abs(deq(i) - v(i)) <= step + 1e-12,
          s"dim $i: |${deq(i)} - ${v(i)}| > quantization step $step")
      }
    }
  }

  test("SQ8 codec: a constant dimension encodes 0 and reconstructs exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Array(1.5f, 2f)), Tuple1(Array(1.5f, 4f)))
      .toDF("embedding")
    val (mins, maxs) = Similarity.trainSq8Bounds(df, "embedding", 2)
    assert(mins(0) == 1.5 && maxs(0) == 1.5)
    val out = df.select(
        Similarity.sq8Codes(col("embedding"), mins, maxs).as("codes"),
        Similarity.sq8Dequant(
          Similarity.sq8Codes(col("embedding"), mins, maxs),
          mins, maxs).as("deq"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0).head == 0L)
      assert(r.getSeq[Double](1).head == 1.5)
    }
    // the varying dim hits both range ends: min -> 0, max -> 255
    assert(out.map(_.getSeq[Long](0)(1)).sorted.toSeq == Seq(0L, 255L))
  }

  test("s12: SQ8 serving emits ranked rows per query over real data") {
    val out = graft.SparkEntry.queries("s12_sq8_ann")(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
  }

  // --- t29 collocations over real data ---

  test("t29: top-100 bound, min-count floor, exact lift replay") {
    val out = graft.SparkEntry.queries("t29_pmi_collocations")(spark, sf)
      .collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(out.forall(_.getAs[Long]("c2") >= 5L))
    assert(out.forall(_.getAs[Long]("lift_ppm") > 0L))
    // replay one row's lift from independently recomputed marginals
    val docs = graft.Tables.documents(spark, sf)
    val pairs = docs
      .select(graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val head = out.head
    val (w1, w2) = (head.getAs[String]("w1"), head.getAs[String]("w2"))
    val n2 = pairs.count().toDouble
    val c2 = pairs.filter(col("w1") === w1 && col("w2") === w2).count().toDouble
    val cl = pairs.filter(col("w1") === w1).count().toDouble
    val cr = pairs.filter(col("w2") === w2).count().toDouble
    val expected = math.min(
      math.floor(c2 * n2 / (cl * cr) * 1000000.0).toLong, 1000000000000L)
    assert(head.getAs[Long]("lift_ppm") == expected)
  }

  test("t29: deterministic across reruns (stable global top-100 order)") {
    val a = graft.SparkEntry.queries("t29_pmi_collocations")(spark, sf).collect()
    val b = graft.SparkEntry.queries("t29_pmi_collocations")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  // --- Rrf fusion unit behavior ---

  test("Rrf: single list preserves its order, contributions are exact div") {
    val l = results(Seq((0L, 1, 0L), (0L, 2, 0L), (0L, 3, 0L)))
      .select(col("query_id").as("doc_id"), col("rank"))
      .withColumn("doc_id", col("rank").cast("long") * 10)
    val out = graft.text.Rrf.fuse(Seq("only" -> l), "doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 20L, 30L))
    // 1e9 div 61/62/63 — exact integer division, never float rounding
    assert(out.map(_.getAs[Long]("rrf_ppb")).toSeq ==
      Seq(1000000000L / 61, 1000000000L / 62, 1000000000L / 63))
  }

  test("Rrf: a doc in both lists outranks same-rank docs in one list") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((1L, 2), (3L, 1)).toDF("doc_id", "rank")
    val out = graft.text.Rrf.fuse(Seq("a" -> a, "b" -> b), "doc_id").collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Long]("rrf_ppb") ==
      1000000000L / 61 + 1000000000L / 62)
    // absent sides surface as null ranks, not zeros
    val doc3 = out.find(_.getAs[Long]("doc_id") == 3L).get
    assert(doc3.isNullAt(doc3.fieldIndex("a_rank")))
    assert(doc3.getAs[Int]("b_rank") == 1)
  }

  test("Rrf: rejects duplicate or non-identifier list names") {
    val l = results(Seq((1L, 1, 1L))).select(col("query_id").as("doc_id"), col("rank"))
    intercept[IllegalArgumentException] {
      graft.text.Rrf.fuse(Seq("x" -> l, "x" -> l), "doc_id")
    }
    intercept[IllegalArgumentException] {
      graft.text.Rrf.fuse(Seq("bad name" -> l), "doc_id")
    }
  }

  test("t31: fused top-10, every row surfaced by at least one system") {
    val out = graft.SparkEntry.queries("t31_hybrid_rrf")(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Int])
      val vec = Option(r.getAs[Any]("vec_rank")).map(_.asInstanceOf[Int])
      assert(lex.nonEmpty || vec.nonEmpty)
      assert(lex.forall(x => x >= 1 && x <= 10))
      assert(vec.forall(x => x >= 1 && x <= 10))
      val expect = lex.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        vec.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppb") == expect)
    }
    // descending by fused score with id tie-break
    val scores = out.map(_.getAs[Long]("rrf_ppb")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  // --- t30 source overlap over real data ---

  test("t30: canonical pairs, ratio bounds, containment >= jaccard") {
    val out = graft.SparkEntry.queries("t30_source_overlap")(spark, sf).collect()
    assert(out.nonEmpty)
    val nSources = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count().toInt
    assert(out.length <= nSources * (nSources - 1) / 2)
    out.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val j = r.getAs[Long]("jaccard_ppm")
      val c = r.getAs[Long]("containment_ppm")
      val inter = r.getAs[Long]("inter")
      val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
      assert(inter <= math.min(na, nb))
      assert(j >= 0L && j <= 1000000L)
      assert(c >= j && c <= 1000000L)
      // exact integer replay
      assert(j == inter * 1000000L / (na + nb - inter))
      assert(c == inter * 1000000L / math.min(na, nb))
    }
  }
}
