package graft.queries

import graft.TestSpark
import graft.functions.TextFunctions
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fourth-session round-11 operators: the hashed linear quality
  * classifier (t33), n-gram diversity audit (t34), winnowing
  * fingerprints (t35), mutual kNN graph (s13), and the k-means
  * cluster audit (s14).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side twin of TextFunctions.hashedClassifierScore for one
    * token.
    */
  private def tokenWeight(w: String): Long = {
    val base = java.lang.Long.parseLong(md5Hex(w).substring(0, 15), 16) %
      1000000007L
    (base % 1024L) * 2654435761L % 2001L - 1000L
  }

  // --- t33 hashed quality classifier ---

  test("t33: score is the exact sum of per-token hashed weights") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the data join"), (2L, "merge")).toDF("doc_id", "text")
    val out = df
      .withColumn("__w", TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        TextFunctions.hashedClassifierScore(col("__w")).as("w_sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) ==
      Seq("the", "data", "join").map(tokenWeight).sum)
    assert(out(2L) == tokenWeight("merge"))
  }

  test("t33: weights stay in [-1000, 1000], label partitions at zero") {
    val out = graft.SparkEntry.queries("t33_quality_classifier")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val w = r.getAs[Long]("w_sum")
      assert(math.abs(w) <= n * 1000L,
        s"doc ${r.getAs[Long]("doc_id")}: |$w| > $n * 1000")
      assert(r.getAs[String]("label") == (if (w >= 0) "keep" else "drop"))
    }
    // a fixed hash family is not degenerate on real data: both classes
    assert(out.map(_.getAs[String]("label")).toSet == Set("keep", "drop"))
  }

  // --- t34 n-gram diversity ---

  test("t34: totals replay from per-doc token counts, ratio is exact") {
    val out = graft.SparkEntry.queries("t34_ngram_diversity")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val totals = graft.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(sum(greatest(
        TextFunctions.tokenCount(col("text")).cast("long") - 2L, lit(0L)))
        .as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val total = r.getAs[Long]("total_grams")
      val distinct = r.getAs[Long]("distinct_grams")
      assert(total == totals(src))
      assert(distinct >= 1L && distinct <= total)
      assert(r.getAs[Long]("diversity_ppm") == distinct * 1000000L / total)
    }
  }

  // --- t35 winnowing ---

  test("t35: a shared run of >= win+gram-1 tokens guarantees a shared fingerprint") {
    val s = spark
    import s.implicits._
    // 7 shared tokens = gram 4 + win 4 - 1 → at least one common
    // winnowed fingerprint (the MOSS guarantee)
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val df = Seq(
      (1L, s"one two $shared"),
      (2L, s"$shared nine ten eleven")).toDF("doc_id", "text")
    val fps = df
      .withColumn("__w", TextFunctions.tokens(col("text")))
      .withColumn("__h", TextFunctions.gramFingerprints(col("__w"), 4))
      .select(col("doc_id"),
        TextFunctions.winnowedFingerprints(col("__h"), 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("t35: documents shorter than win+gram-1 tokens yield no fingerprints") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // 6 < 7
    val out = df
      .withColumn("__w", TextFunctions.tokens(col("text")))
      .withColumn("__h", TextFunctions.gramFingerprints(col("__w"), 4))
      .select(TextFunctions.winnowedFingerprints(col("__h"), 4).as("fps"))
      .collect()
    assert(out.head.getSeq[Long](0).isEmpty)
  }

  test("t35: gate stats are bounded by the winnowable positions") {
    val nTok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = graft.SparkEntry.queries("t35_winnowing")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nFps = r.getAs[Long]("n_fps")
      // positions = n_tokens - 6 windows of minima, distinct can only shrink
      assert(nFps <= math.max(0L, nTok(id) - 6L))
      if (nTok(id) >= 7L) assert(nFps >= 1L)
      if (nFps > 0L)
        assert(r.getAs[Long]("fp_min") <= r.getAs[Long]("fp_max"))
      else assert(r.isNullAt(r.fieldIndex("fp_min")))
    }
  }

  // --- s13 mutual kNN graph ---

  test("mutualKnnGraph: keeps reciprocated edges only") {
    val s = spark
    import s.implicits._
    // all-positive 2-dim vectors share one sign bucket (bits=2);
    // with k=1: 1↔2 are mutual nearest, 3's nearest (2) does not
    // reciprocate → exactly one edge
    val df = Seq(
      (1L, Array(1f, 0.10f)),
      (2L, Array(1f, 0.11f)),
      (3L, Array(1f, 5f))).toDF("vec_id", "embedding")
    val edges = Similarity.mutualKnnGraph(df, "vec_id", "embedding", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSeq == Seq((1L, 2L)))
  }

  test("s13: canonical unique edges, mutual degree bounded by k") {
    val out = graft.SparkEntry.queries("s13_knn_graph")(spark, sf).collect()
    assert(out.nonEmpty)
    val edges = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(edges.forall { case (a, b) => a < b })
    assert(edges.distinct.length == edges.length)
    val degree = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.length)
    assert(degree.max <= 3)
  }

  // --- e05 inter-arrival distribution ---

  test("e05: gap totals conserve, percentiles and extremes are ordered") {
    val out = graft.SparkEntry.queries("e05_interarrival")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
    // one gap per event that has a predecessor: total = events - users
    assert(out.map(_.getAs[Long]("n_gaps")).sum ==
      ev.count() - ev.select(col("user_id")).distinct().count())
    out.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_ns"), r.getAs[Long]("max_ns"))
      val (p50, p95) = (r.getAs[Double]("p50_ns"), r.getAs[Double]("p95_ns"))
      assert(mn > 0L) // (user_id, ts) collision-free ⇒ strictly positive
      assert(mn <= p50 && p50 <= p95 && p95 <= mx)
    }
  }

  // --- d13 directional containment ---

  test("d13: containments bound Jaccard from above, share d11's pair set") {
    val d13 = graft.SparkEntry.queries("d13_containment_pairs")(spark, sf)
      .collect()
    val d11 = graft.SparkEntry.queries("d11_lsh_estimate_audit")(spark, sf)
      .collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
    assert(d13.map(key).toSet == d11.map(key).toSet)
    val exactByPair = d11.map(r => key(r) -> r.getAs[Long]("exact_ppm")).toMap
    d13.foreach { r =>
      val (ca, cb) = (r.getAs[Long]("cont_a_ppm"), r.getAs[Long]("cont_b_ppm"))
      assert(ca >= 0L && ca <= 1000000L && cb >= 0L && cb <= 1000000L)
      assert(r.getAs[Long]("max_cont_ppm") == math.max(ca, cb))
      // |∩|/min-side ≥ |∩|/|∪| always: containment dominates Jaccard
      // (floor can cost at most 1 ppm in the comparison)
      assert(math.max(ca, cb) + 1 >= exactByPair(key(r)))
    }
  }

  // --- d12 span-coverage yield ---

  test("d12: covers exactly d06's affected docs, bounded by span geometry") {
    val out = graft.SparkEntry.queries("d12_span_coverage")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val covered = r.getAs[Long]("tokens_covered")
      val n = r.getAs[Long]("n_tokens")
      assert(covered >= 8L && covered <= n) // one span covers 8 tokens
      assert(r.getAs[Long]("covered_ppm") == covered * 1000000L / n)
    }
    // same "affected document" set as the d06 inventory
    val d06Docs = graft.SparkEntry.queries("d06_dup_ngrams")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == d06Docs)
  }

  // --- graft_dedup TVF ---

  test("graft_dedup is FROM-able in SQL and matches the DataFrame API") {
    val docs = graft.Tables.documents(spark, sf)
    docs.createOrReplaceTempView("dedup_src")
    val viaSql = spark
      .sql("SELECT * FROM graft_dedup('dedup_src', 'doc_id', 'text')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaApi = graft.dedup.Dedup
      .minhashCandidates(docs, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("graft_dedup reads graft tables through the shared source resolution") {
    graft.Tables.documents(spark, sf).limit(100)
      .createOrReplaceTempView("dedup_src_small")
    spark.sql("CREATE GRAFT TABLE dedup_t AS SELECT * FROM dedup_src_small")
    try {
      val viaTable = spark
        .sql("SELECT * FROM graft_dedup('dedup_t', 'doc_id', 'text')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaView = spark
        .sql("SELECT * FROM graft_dedup('dedup_src_small', 'doc_id', 'text')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaTable == viaView)
    } finally spark.sql("DROP GRAFT TABLE dedup_t")
  }

  test("graft_dedup rejects a wrong arity with its usage line") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_dedup('dedup_src')").collect()
    }
    assert(e.getMessage.contains("graft_dedup"))
  }

  // --- graft_ann TVF ---

  test("graft_ann is FROM-able in SQL and matches the DataFrame API") {
    val emb = graft.Tables.embeddings(spark, sf)
    emb.createOrReplaceTempView("ann_corpus")
    emb.filter(col("vec_id") < 5).createOrReplaceTempView("ann_queries")
    val viaSql = spark
      .sql("SELECT * FROM graft_ann('ann_corpus', 'ann_queries', 3)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaApi = Similarity
      .bucketedTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // 5-arg form: explicit column names over a renamed view
    emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .createOrReplaceTempView("ann_renamed")
    emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .createOrReplaceTempView("ann_renamed_q")
    val viaCols = spark
      .sql("SELECT * FROM graft_ann('ann_renamed', 'ann_renamed_q', 3, 'id', 'vec')")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaCols == viaApi)
  }

  test("graft_ann rejects bad arity and non-positive k with its usage line") {
    graft.Tables.embeddings(spark, sf).createOrReplaceTempView("ann_corpus2")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_ann('ann_corpus2')").collect()
    }
    assert(e.getMessage.contains("graft_ann"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_ann('ann_corpus2', 'ann_corpus2', 0)")
        .collect()
    }
    assert(e2.getMessage.contains("k must be positive"))
  }

  // --- graft_funnel / graft_sessionize TVFs ---

  test("graft_funnel is FROM-able in SQL and matches the DataFrame API") {
    val viaSql = spark.sql(
      s"SELECT * FROM graft_funnel('$sf/events.parquet', " +
        "'view', 'click', 'purchase')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val viaApi = graft.events.EventAnalytics.funnel(
      graft.Tables.events(spark, sf), "view", "click", "purchase")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSql == viaApi && viaSql.size == 3)
  }

  test("graft_sessionize is FROM-able in SQL, honors the gap argument") {
    val viaSql = spark.sql(
      s"SELECT * FROM graft_sessionize('$sf/events.parquet')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaApi = graft.events.EventAnalytics.sessionize(
      graft.Tables.events(spark, sf), 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // a tighter gap can only split sessions — total count non-decreasing
    val tight = spark.sql(
      s"SELECT SUM(n_sessions) FROM graft_sessionize('$sf/events.parquet', 5)")
      .collect()(0).getLong(0)
    val loose = spark.sql(
      s"SELECT SUM(n_sessions) FROM graft_sessionize('$sf/events.parquet', 30)")
      .collect()(0).getLong(0)
    assert(tight >= loose)
  }

  test("graft_redact is FROM-able in SQL and matches the DataFrame surface") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "mail a@b.co or call 555-123-4567"), (2L, "clean text"))
      .toDF("doc_id", "text").createOrReplaceTempView("redact_src")
    val rows = spark
      .sql("SELECT * FROM graft_redact('redact_src', 'doc_id', 'text')")
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 1 &&
      rows(0).getString(4) == "mail [EMAIL] or call [PHONE]")
    assert(rows(1).getString(4) == "clean text")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_redact('redact_src')").collect()
    }
    assert(e.getMessage.contains("graft_redact"))
  }

  test("graft_funnel's optional 5th argument applies the per-step conversion deadline") {
    val windowed = spark.sql(
      s"SELECT * FROM graft_funnel('$sf/events.parquet', " +
        "'view', 'click', 'purchase', 360)")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    val open = spark.sql(
      s"SELECT * FROM graft_funnel('$sf/events.parquet', " +
        "'view', 'click', 'purchase')")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    val viaApi = graft.events.EventAnalytics.funnelWindowed(
      graft.Tables.events(spark, sf), "view", "click", "purchase",
      6L * 3600 * 1000000000L)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(windowed == viaApi)
    // stage 1 is deadline-free; later stages can only shrink
    assert(windowed(1) == open(1))
    assert(windowed(2) <= open(2) && windowed(3) <= open(3))
  }

  test("graft_chunk is FROM-able in SQL, matches the DataFrame surface, honors window/stride") {
    val s2 = spark
    import s2.implicits._
    val text = (0 until 100).map(i => s"w$i").mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .createOrReplaceTempView("chunk_src")
    val viaSql = spark
      .sql("SELECT * FROM graft_chunk('chunk_src', 'doc_id', 'text')")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val viaApi = graft.text.Chunker
      .chunk(spark.table("chunk_src"), "doc_id", "text")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(viaSql == viaApi && viaSql == Set((0, 0, 64), (1, 48, 52)))
    // explicit window/stride: 50/25 over 100 tokens -> starts 0,25,50
    val custom = spark
      .sql("SELECT chunk_idx, start_tok, n_tokens FROM " +
        "graft_chunk('chunk_src', 'doc_id', 'text', 50, 25)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(custom == Set((0, 0, 50), (1, 25, 50), (2, 50, 50)))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_chunk('chunk_src')").collect()
    }
    assert(e.getMessage.contains("graft_chunk"))
  }

  test("graft_block_stats is FROM-able in SQL, matches the DataFrame API, sizes replay") {
    val s2 = spark
    import s2.implicits._
    // 5000 docs in one ("web","en") block forces sub_blocks=2 at the
    // default 4096 side; the small blocks stay at 1
    val rows = (0 until 5000).map(i => (i.toLong, "x", "en", "web")) ++
      (0 until 30).map(i => (5000L + i, "x", "fr", "web")) ++
      (0 until 10).map(i => (6000L + i, "x", "en", "book"))
    rows.toDF("doc_id", "text", "lang", "source")
      .createOrReplaceTempView("bs_src")
    val viaSql = spark
      .sql("SELECT * FROM graft_block_stats('bs_src', 'source', 'lang')")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5))).toMap
    val viaApi = graft.dedup.Dedup
      .blockStats(spark.table("bs_src"), Seq("source", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5))).toMap
    assert(viaSql == viaApi)
    // n=5000 of 5040 total: ppm = 5000*1e6 div 5040 = 992063;
    // pair_work = 5000*4999/2
    assert(viaSql(("web", "en")) == ((5000L, 992063L, 2, 12497500L)))
    assert(viaSql(("web", "fr")) == ((30L, 5952L, 1, 435L)))
    assert(viaSql(("book", "en")) == ((10L, 1984L, 1, 45L)))
    // trailing integer overrides the sub-block side
    val tight = spark
      .sql("SELECT sub_blocks FROM " +
        "graft_block_stats('bs_src', 'source', 'lang', 1000) " +
        "WHERE source = 'web' AND lang = 'en'")
      .collect().map(_.getInt(0)).toSeq
    assert(tight == Seq(5))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_block_stats('bs_src')").collect()
    }
    assert(e.getMessage.contains("graft_block_stats"))
    // all-integer tail: the last arg is the side, leaving zero cols
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_block_stats('bs_src', 4096)").collect()
    }
    assert(e2.getMessage.contains("blocking column"))
  }

  test("graft_funnel / graft_sessionize reject bad arity with their usage lines") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_funnel('$sf/events.parquet')").collect()
    }
    assert(e.getMessage.contains("graft_funnel"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_sessionize('$sf/events.parquet', 1, 2)")
        .collect()
    }
    assert(e2.getMessage.contains("graft_sessionize"))
  }

  // --- e06 funnel ---

  test("e06: stages are monotone non-increasing, ppm exact, strict ordering enforced") {
    val out = graft.SparkEntry.queries("e06_funnel")(spark, sf)
      .orderBy("stage").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val n = out.map(_.getAs[Long]("n_users"))
    assert(n(0) >= n(1) && n(1) >= n(2), "a funnel can only narrow")
    assert(n(0) > 0)
    out.foreach(r => assert(r.getAs[Long]("conv_ppm") ==
      r.getAs[Long]("n_users") * 1000000L / n(0)))
    // strict ordering on a planted frame: click before the first view
    // must NOT convert
    val s2 = spark
    import s2.implicits._
    val planted = Seq(
      (1L, 100L, "click"), (1L, 200L, "view"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"), (2L, 300L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val ta = planted.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("ta"))
    val tb = planted.filter(col("event_type") === "click")
      .join(ta, "user_id").filter(col("ts") > col("ta"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tb"))
    assert(tb.select("user_id").as[Long].collect().toSet == Set(2L),
      "user 1's click precedes their first view and must not count")
  }

  // --- e07 sessionization ---

  test("e07: sessions partition each user's events; gap rule splits exactly") {
    val out = graft.SparkEntry.queries("e07_sessionize")(spark, sf).collect()
    val events = graft.Tables.events(spark, sf)
    assert(out.length == events.select("user_id").distinct().count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("max_events") >= 1L)
      assert(r.getAs[Long]("max_dur_ms") >= 0L)
    }
    // planted frame: 3 events with one 31-min gap → exactly 2 sessions
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapNs = 30L * 60L * 1000000000L
    val planted = Seq((1L, 0L), (1L, gapNs), (1L, 2 * gapNs + 1))
      .toDF("user_id", "ts")
    val sids = planted
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts") - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("sid").as[Long].collect().toSeq
    assert(sids == Seq(1L, 1L, 2L),
      "a gap of exactly 30 min stays in-session; 30 min + 1 ns splits")
  }

  // --- t39 burstiness ---

  test("t39: ratios replay, burstiness is at least one per containing doc") {
    val out = graft.SparkEntry.queries("t39_burstiness")(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    out.foreach { r =>
      val (cf, df) = (r.getAs[Long]("cf"), r.getAs[Long]("df"))
      assert(df >= 1L && cf >= df) // a containing doc contributes >= 1
      assert(r.getAs[Long]("burstiness_ppm") == cf * 1000000L / df)
      assert(r.getAs[Long]("burstiness_ppm") >= 1000000L)
    }
    // descending with token tie-break
    val ppms = out.map(_.getAs[Long]("burstiness_ppm")).toSeq
    assert(ppms == ppms.sorted.reverse)
  }

  // --- t38 langid confusion matrix ---

  test("t38: matrix covers every document, shares are exact within-language ppm") {
    val out = graft.SparkEntry.queries("t38_langid_confusion")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum ==
      graft.Tables.documents(spark, sf).count())
    out.groupBy(_.getAs[String]("lang")).values.foreach { rows =>
      val tot = rows.map(_.getAs[Long]("n")).sum
      rows.foreach { r =>
        assert(r.getAs[Long]("share_ppm") ==
          r.getAs[Long]("n") * 1000000L / tot)
      }
      val s = rows.map(_.getAs[Long]("share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length)
    }
    // predictions stay in the classifier's label space
    val preds = out.map(_.getAs[String]("pred_lang")).toSet
    assert(preds.subsetOf(Set("en", "es", "fr", "de", "und")))
  }

  // --- s16 PQ distortion audit ---

  test("pqDistortionAudit: a codebook containing the corpus has zero distortion") {
    val s = spark
    import s.implicits._
    val books = Seq((0, 0, Array(1f, 0f)), (0, 1, Array(0f, 1f)),
      (1, 0, Array(2f, 0f)), (1, 1, Array(0f, 2f)))
    val df = Seq(
      Tuple1(Array(1f, 0f, 2f, 0f)), // sub0→code0, sub1→code0
      Tuple1(Array(0f, 1f, 0f, 2f)), // sub0→code1, sub1→code1
      Tuple1(Array(1f, 0f, 0f, 2f))).toDF("embedding")
    val out = Similarity.pqDistortionAudit(df, "embedding", books, 2, 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(0 -> (3L, 2L, 0L), 1 -> (3L, 2L, 0L)))
  }

  test("s16: every subspace audits the whole corpus, codes bounded by ksub") {
    val out = graft.SparkEntry.queries("s16_pq_distortion")(spark, sf)
      .collect()
    assert(out.map(_.getAs[Int]("sub")).sorted.toSeq == Seq(0, 1, 2, 3))
    val n = graft.Tables.embeddings(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == n)
      val used = r.getAs[Long]("codes_used")
      assert(used >= 1L && used <= 16L)
      assert(r.getAs[Long]("sum_d2_ppm") >= 0L)
    }
  }

  // --- e04 cohort retention ---

  test("e04: week-0 retention is total, cohorts partition the user base") {
    val out = graft.SparkEntry.queries("e04_retention_cohorts")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val week0 = out.filter(_.getAs[Long]("week_offset") == 0L)
    assert(week0.nonEmpty)
    week0.foreach { r =>
      // every user is active in their own first week by construction
      assert(r.getAs[Long]("active_users") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("retention_ppm") == 1000000L)
    }
    out.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0L)
      assert(r.getAs[Long]("retention_ppm") <= 1000000L)
      assert(r.getAs[Long]("retention_ppm") ==
        r.getAs[Long]("active_users") * 1000000L / r.getAs[Long]("cohort_size"))
    }
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(week0.map(_.getAs[Long]("cohort_size")).sum == users)
  }

  // --- t37 tokenizer fertility ---

  test("t37: ratios replay exactly; subword tokens at least cover words") {
    val out = graft.SparkEntry.queries("t37_token_fertility")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val chars = r.getAs[Long]("total_chars")
      val bpe = r.getAs[Long]("total_bpe_tokens")
      val words = r.getAs[Long]("total_words")
      assert(bpe >= words) // a word yields >= 1 subword token
      assert(r.getAs[Long]("chars_per_token_ppm") == chars * 1000000L / bpe)
      assert(r.getAs[Long]("fertility_ppm") == bpe * 1000000L / words)
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
    }
  }

  // --- d11 LSH estimator audit ---

  test("d11: estimates are sixteenths, bounds hold, error is the exact gap") {
    val out = graft.SparkEntry.queries("d11_lsh_estimate_audit")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Long]("est_ppm")
      val exact = r.getAs[Long]("exact_ppm")
      // agreement/16 floored to ppm — only 17 possible estimate values
      assert(est >= 0L && est <= 1000000L && est % 62500L == 0L)
      // candidates share a band, so they share ≥1 shingle almost
      // surely; exact Jaccard of candidate pairs must be positive here
      assert(exact > 0L && exact <= 1000000L)
      assert(r.getAs[Long]("err_ppm") == math.abs(est - exact))
    }
  }

  test("d11: identical documents estimate and measure exactly 1e6") {
    val s = spark
    import s.implicits._
    import graft.functions.MinHashExpressions._
    val twin = "alpha beta gamma delta epsilon"
    val df = Seq((1L, twin), (2L, twin)).toDF("id", "text")
      .withColumn("__w", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("__sh", wordShingles3(col("__w")))
      .select(col("id"), minhashSignature(col("__sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) == df(2L)) // identical text ⇒ identical signature
  }

  // --- s15 range search ---

  test("s15: radius semantics — monotone in threshold, exhaustive at -1") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count()
    val all = Similarity.rangeSearch(emb, q, "vec_id", "embedding", -1.0)
    assert(all.count() == 5L * (n - 1)) // every non-self pair qualifies
    val loose = Similarity.rangeSearch(emb, q, "vec_id", "embedding", 0.3)
      .collect()
    val tight = Similarity.rangeSearch(emb, q, "vec_id", "embedding", 0.5)
      .collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
    assert(tight.map(key).toSet.subsetOf(loose.map(key).toSet))
    loose.foreach(r => assert(r.getAs[Long]("cos_ppm") >= 300000L))
  }

  // --- d10 dedup apply ---

  test("d10: verdicts partition every source, drops equal non-representative members") {
    val out = graft.SparkEntry.queries("d10_dedup_apply")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("kept") + r.getAs[Long]("dropped") ==
        r.getAs[Long]("n_docs"))
    }
    val docs = graft.Tables.documents(spark, sf)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // total drops == cluster members that are not their own representative
    val clusters = graft.dedup.Dedup.nearDupClusters(
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4))
    val expectedDrops = clusters.filter(col("rep") =!= col("doc_id")).count()
    assert(out.map(_.getAs[Long]("dropped")).sum == expectedDrops)
  }

  // --- t36 vocabulary coverage ---

  test("t36: coverage is monotone in k, exact ppm, bounded by 1e6") {
    val out = graft.SparkEntry.queries("t36_vocab_coverage")(spark, sf)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(5L, 10L, 25L))
    val covered = out.map(_.getAs[Long]("covered"))
    assert(covered.toSeq == covered.sorted.toSeq)
    out.foreach { r =>
      val ppm = r.getAs[Long]("coverage_ppm")
      assert(ppm == r.getAs[Long]("covered") * 1000000L / r.getAs[Long]("total"))
      assert(ppm > 0L && ppm <= 1000000L)
    }
  }

  // --- s14 cluster audit ---

  test("clusterAudit: centroids auditing themselves have zero inertia") {
    val s = spark
    import s.implicits._
    val cents = Seq(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))
    val df = Seq((10L, Array(1f, 0f)), (11L, Array(0f, 1f)),
      (12L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.clusterAudit(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(0 -> (1L, 0L), 1 -> (2L, 0L)))
  }

  test("s14: populations cover the corpus, inertia non-negative") {
    val out = graft.SparkEntry.queries("s14_cluster_audit")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 8) // nlist = 8 trained cells
    val total = out.map(_.getAs[Long]("n_vectors")).sum
    assert(total == graft.Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_vectors") > 0L)
      assert(r.getAs[Long]("sum_d2_ppm") >= 0L)
    }
  }

  test("t32's length-prune bounds through the KLL sketch path match the exact order statistics") {
    // the documented 100 TB float-column route (t32's scaladoc): the
    // sketch path must reproduce the EXACT per-source P5/P95 order
    // statistics — and therefore identical keep/drop verdicts — on
    // the gate corpus. Rank rule shared with exactQuantiles:
    // r = max(1, ceil(p·n)).
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val src = docs.select(col("source")).distinct()
      .orderBy(col("source")).head().getString(0)
    val one = docs.filter(col("source") === src)
    val viaSketch = graft.functions.KllQuantiles.exactQuantiles(
      one, "n_tokens", Seq(50000L, 950000L), k = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val sorted = one.select(col("n_tokens")).collect()
      .map(_.getLong(0)).sorted
    def orderStat(ppm: Long): Double = {
      val r = math.max(1L, (ppm * sorted.length + 999999L) / 1000000L)
      sorted((r - 1).toInt).toDouble
    }
    assert(viaSketch == Map(50000L -> orderStat(50000L),
      950000L -> orderStat(950000L)),
      s"sketch-path bounds diverge for source $src: $viaSketch")
    // identical bounds => identical curation verdicts, by construction
    val kept = one.filter(col("n_tokens") >= lit(viaSketch(50000L)) &&
      col("n_tokens") <= lit(viaSketch(950000L))).count()
    val keptExact = sorted.count(t =>
      t >= orderStat(50000L) && t <= orderStat(950000L))
    assert(kept == keptExact.toLong)
  }

  test("pair-space pre-flight: over-budget audits fail loud, and the conf restores them") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val key = Similarity.MaxCandidatePairsKey
    spark.conf.set(key, "10") // absurd budget: everything is over it
    try {
      val e1 = intercept[IllegalStateException] {
        Similarity.mutualKnnGraph(emb, "vec_id", "embedding", 1, 2).count()
      }
      assert(e1.getMessage.contains(key) && e1.getMessage.contains("ivfPqIndexTopK"),
        e1.getMessage)
      val e2 = intercept[IllegalStateException] {
        graft.dedup.Dedup.blockedJaccardPairs(
          docs, "doc_id", "text", Seq("source", "lang"), 0.8).count()
      }
      assert(e2.getMessage.contains("minhashCandidates"), e2.getMessage)
      // raising the budget (or the default) restores the audits
      spark.conf.set(key, "0") // disabled
      assert(Similarity.mutualKnnGraph(emb, "vec_id", "embedding", 1, 2)
        .count() >= 0)
    } finally spark.conf.unset(key)
    // at the DEFAULT budget the dev-corpus audits are far under it
    assert(Similarity.mutualKnnGraph(emb, "vec_id", "embedding", 1, 2)
      .count() >= 0)
  }
}
