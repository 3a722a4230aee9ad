package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the physical plans we rely on for scale (SURVEY.md §4):
  * filters/columns must reach the Parquet scan, small dims must
  * broadcast, top-k must plan as TakeOrderedAndProject. A regression
  * here is a silent 100×-at-scale performance bug even when results
  * stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.sf).queryExecution.executedPlan.toString

  test("filter + projection are pushed into the parquet scan") {
    val p = plan("q02_filter_proj")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)") ||
      p.contains("EqualTo(l_returnflag,R)"), p.take(2000))
    // pruned read schema: only the 5 referenced columns
    assert(!p.contains("l_shipdate"), "unreferenced column must be pruned")
  }

  test("star join broadcasts the dimension tables") {
    val p = plan("q05_star_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge at this size")
  }

  test("top-k plans as TakeOrderedAndProject") {
    val p = plan("q06_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("pricing summary uses map-side partial aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("partial_sum"), "map-side combine must run before the shuffle")
  }

  test("star join facts are co-located: no shuffle on the order key") {
    // disable auto-broadcast so the fact-fact join cannot dodge the
    // question by broadcasting tiny orders; the dim broadcast() hints
    // still apply, as they would at any scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("q05_star_join")(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), "dims must still broadcast")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"fact-fact join must read co-located buckets:\n${p.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-located fact-fact join has no Exchange below the join") {
    // force the join path (at sf0.001 orders would broadcast, which
    // proves nothing about bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("g03_colocated_join")(spark, TestSpark.sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(2000))
      // both scans read bucket layout, and no shuffle feeds the join:
      // the only Exchange allowed is the post-join aggregation's
      assert(p.sliding("Bucketed: true".length).count(_ == "Bucketed: true") == 2,
        p.take(3000))
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n${p.take(3000)}")
      // the result is still exactly the unbucketed answer
      val want = SparkEntry.queries("q04_join_agg")(spark, TestSpark.sf).count()
      assert(df.count() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("timestamp range filter is pushed down") {
    val p = plan("q15_between_dates")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(o_orderdate"),
      p.take(2000))
  }

  test("event-time normalization preserves column pruning on the events scan") {
    // normalizeEventTs inserts a projection over ts; the scan beneath
    // must still read ONLY the referenced columns — a portability
    // boundary that broke pruning would re-read all 6 event columns
    // (props included, the wide one) on every time-bucketed query
    val p = plan("q30_time_window")
    assert(!p.contains("props"), "unreferenced props column must stay pruned")
    assert(!p.contains("event_id"), "unreferenced event_id must stay pruned")
    assert(p.contains("ReadSchema"), p.take(2000))
  }

  test("as-of join is a window over one partition-key shuffle, not a product") {
    val p = plan("q41_asof_join")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan as a product join:\n${p.take(3000)}")
    // exactly one shuffle keyed on user_id feeds the window
    assert(p.contains("hashpartitioning(user_id"), p.take(3000))
  }

  test("kNN label purity never plans as a product join") {
    val p = plan("s09_knn_label_purity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketed self-join must stay keyed:\n${p.take(3000)}")
  }

  test("OOV masking is a narrow projection: no Exchange at all") {
    val p = plan("t12_oov_mask")
    assert(!p.contains("Exchange"),
      s"per-doc masking must not shuffle:\n${p.take(3000)}")
  }

  test("PII scrub is a narrow projection: no Exchange, ASCII or multibyte") {
    // detection + redaction are pure in-row regex work — the ideal
    // 100 TB map stage; a shuffle here would mean the scrub picked up
    // a join or aggregation it doesn't need
    for (g <- Seq("t44_pii_scrub", "t47_utf8_pii")) {
      val p = plan(g)
      assert(!p.contains("Exchange"),
        s"$g must not shuffle:\n${p.take(3000)}")
    }
  }

  test("chunking and canonicalization are narrow projections: no Exchange at all") {
    // both are in-row stages (explode / NFC+regex) — the ideal 100 TB
    // map shape; an Exchange would mean the chunker or normalizer
    // picked up a join or aggregation it doesn't need
    for (g <- Seq("t50_doc_chunks", "t49_text_canonicalize")) {
      val p = plan(g)
      assert(!p.contains("Exchange"),
        s"$g must not shuffle:\n${p.take(3000)}")
    }
  }

  test("chunk dedup shuffles narrow fingerprints — the text never rides an Exchange") {
    // the distinct-doc rewrite legitimately plans two keyed hash
    // aggregations, but both must move only (fp, doc_id) rows: the
    // wide chunk text leaving the map stage would multiply the
    // shuffle bytes by the chunk width at 100 TB
    val p = plan("d18_chunk_dedup")
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected a keyed shuffle:\n${p.take(3000)}")
    exchanges.foreach(l => assert(!l.contains("chunk_text"),
      s"chunk_text must not ride a shuffle:\n$l"))
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort expected:\n${p.take(3000)}")
  }

  test("image near-dup pairs stay band-keyed: no product join, no corpus broadcast") {
    // d14's gate frame is an eager localCheckpoint (so its own plan
    // is just a scan); pin the UNDERLYING scaffold instead — the
    // banded self-join must meet on (band_idx, band_key, blocks),
    // never as a product or a corpus-side broadcast
    import org.apache.spark.sql.functions._
    val s2 = spark
    import s2.implicits._
    val h = (1L to 64L).map(i => (i, i % 7, i % 5)).toDF("id", "hi", "lo")
    val banded = h.select(col("id"), posexplode(array(
        shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
        col("lo").bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val pairs = graft.dedup.Dedup.bandPairs(
      graft.dedup.Dedup.saltBuckets(banded, maxBucketSide = 4096))
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the banded self-join must never plan a product:\n${p.take(3000)}")
    assert(p.contains("hashpartitioning(band_idx"),
      s"the self-join must key on the band columns:\n${p.take(3000)}")
  }

  test("blocked Jaccard self-join is salted: sub-block pair keys, never a raw block join") {
    // d03's guard: the within-block all-pairs join must key on the
    // id-hash sub-block pair (__i, __j) next to the blocking columns
    // — an unguarded a.join(b, blockCols) is n² on the dominant
    // block of a real corpus
    val p = plan("d03_jaccard_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocked Jaccard must never plan a product:\n${p.take(3000)}")
    assert(p.contains("__i") && p.contains("__j"),
      s"blocked Jaccard self-join must carry the sub-block salt keys:\n${p.take(3000)}")
  }

  test("hashed classifier and winnowing are narrow projections: no keyed shuffle") {
    // the hashing trick means NO vocabulary join and no keyed shuffle —
    // the whole model evaluates in-row
    val p33 = plan("t33_quality_classifier")
    assert(!p33.contains("Exchange"),
      s"hashed classifier must not shuffle:\n${p33.take(3000)}")
    // t35 carries exactly one ROUND-ROBIN spread (CPU parallelism over
    // a single small file — the d04 pattern), never a keyed shuffle
    val p35 = plan("t35_winnowing")
    assert(!p35.contains("hashpartitioning"),
      s"winnowing must not shuffle on a key:\n${p35.take(3000)}")
    assert("Exchange".r.findAllIn(p35).size <= 1, p35.take(3000))
  }

  test("mutual kNN graph stays keyed; cluster audit assigns cells in-row") {
    val p13 = plan("s13_knn_graph")
    assert(!p13.contains("CartesianProduct") &&
      !p13.contains("BroadcastNestedLoopJoin"),
      s"mutual graph candidates must stay bucket-keyed:\n${p13.take(3000)}")
    // s14: no Window (assignment is the literal-centroid projection,
    // not a crossJoin+rank), centroid join broadcast, one final agg
    val p14 = plan("s14_cluster_audit")
    assert(!p14.contains("Window"),
      s"cell assignment must be in-row, not windowed:\n${p14.take(3000)}")
    assert(p14.contains("BroadcastHashJoin"),
      s"the nlist-row centroid table must broadcast:\n${p14.take(3000)}")
    assert(!p14.contains("CartesianProduct"), p14.take(3000))
  }

  test("vocab coverage takes the head as TakeOrdered, never a global sort") {
    val p = plan("t36_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-25 head must be TakeOrdered (driver-bounded):\n${p.take(3000)}")
  }

  test("event-sequence analytics shuffle on the user key, broadcast their totals") {
    // e03/e04/e05 all pivot on a per-user window/agg — the inherent
    // corpus shuffle — and must broadcast their small totals side
    // instead of shuffling the matrix again
    for (g <- Seq("e03_transition_matrix", "e04_retention_cohorts",
        "e05_interarrival")) {
      val p = plan(g)
      assert(p.contains("hashpartitioning(user_id"),
        s"$g must key its corpus shuffle on user_id:\n${p.take(3000)}")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$g:\n${p.take(3000)}")
    }
    assert(plan("e03_transition_matrix").contains("BroadcastHashJoin"))
    assert(plan("e04_retention_cohorts").contains("BroadcastHashJoin"))
  }

  test("runtime bloom-filter join: the dim filter reaches the fact side") {
    // the reference's FilterPushJoin collects the filtered small
    // side's join keys and pushes them as an IN filter into the fact
    // scan (CarbonJoins.scala:31-93); Spark's runtime bloom-filter
    // join is the built-in equivalent — prove it fires on a
    // selective dim filter once the size thresholds allow
    import org.apache.spark.sql.functions.col
    val sets = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = sets.map { case (k, _) => k -> spark.conf.getOption(k) }
    sets.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      val part = spark.read.parquet(s"${TestSpark.sf}/part.parquet")
        .filter(col("p_size") === 1)
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter did not inject:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("materialized IVF-PQ serving scans the index, not the corpus vectors") {
    // s08's corpus side must come entirely from the cell-partitioned
    // index table: embeddings.parquet may appear exactly once — the
    // 5-row query-set lookup (with its vec_id filter pushed down) —
    // where s06 (inline encode) reads it for the corpus too
    val p = plan("s08_ann_ivfpq_index")
    val embScans = "embeddings\\.parquet".r.findAllIn(p).size
    assert(p.contains("ivfpq_index"),
      s"serving must read the materialized index\n${p.take(2000)}")
    assert(embScans <= 1,
      s"corpus vectors must not be rescanned at serve time ($embScans embedding scans)\n${p.take(2000)}")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]") ||
      p.contains("LessThan(vec_id,5)"),
      "query-set lookup must push its filter")
  }

  test("BM25 index serving scans the postings table, never the documents") {
    // t21 is the text twin of s08: the build pass materialized the
    // inverted index, so serving must read postings only — with the
    // token predicate pushed to the parquet scan — and never touch
    // documents.parquet
    val p = plan("t21_bm25_index_serve")
    assert(p.contains("bm25_index"),
      s"serving must read the materialized index\n${p.take(2000)}")
    assert(!p.contains("documents.parquet"),
      s"documents must not be scanned at serve time\n${p.take(2000)}")
    assert(p.contains("In(token, [join,spark,stream])") ||
      p.contains("In(token, [spark,join,stream])"),
      s"token IN filter must push to the postings scan\n${p.take(3000)}")
  }

  test("hybrid RRF fusion: lexical side serves from the index, fused top-k is TakeOrdered") {
    // t31 composes the t21 postings serve with a vector search; the
    // fusion layer must not reintroduce a documents scan (the whole
    // point of the materialized index), and the fused top-10 must plan
    // as TakeOrderedAndProject, never a global sort
    val p = plan("t31_hybrid_rrf")
    assert(p.contains("bm25_index"),
      s"lexical side must read the materialized index\n${p.take(2000)}")
    assert(!p.contains("documents.parquet"),
      s"documents must not be scanned at serve time\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"fused top-k must not global-sort\n${p.take(3000)}")
  }

  test("n-gram phrase serving tokenizes only index-pruned candidate docs") {
    // t24: the bigram index supplies the candidate set; documents must
    // be scanned exactly once, joined against the BROADCAST candidates
    // BEFORE tokenization — a naive plan tokenizes the whole corpus
    val p = plan("t24_phrase_ngram_serve")
    assert(p.contains("bigram_index"),
      s"candidates must come from the materialized bigram index\n${p.take(2000)}")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"documents must be scanned exactly once\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the candidate set must broadcast\n${p.take(3000)}")
    // tokenization (Generate/explode of the n-gram transform) must sit
    // ABOVE the join: the explode's generator input is the joined side
    val genIdx = p.indexOf("Generate explode")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(genIdx >= 0 && joinIdx > genIdx,
      s"n-gram explode must consume the join output, not the raw corpus\n${p.take(3000)}")
  }

  test("d22 block stats: narrow aggregation with a broadcast total, text never shuffles") {
    // the pre-flight must stay cheap at any corpus size: one keyed
    // aggregation over the blocking columns, a 1-row broadcast for
    // the corpus total, and the wide text column never on an Exchange
    val p = plan("d22_block_stats")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row total must broadcast\n${p.take(2000)}")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(!exchanges.exists(_.contains("text#")),
      s"text on a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("d21 cross-modality verdict: no cartesian, no wide column on the verdict shuffle") {
    // every leg is a bounded candidate generator; the verdict stage
    // unions only narrow (id_a, id_b, leg) rows — text/payload bytes
    // must never ride an Exchange above the fingerprint map stages
    val p = plan("d21_crossmodal_dupes")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs stage may materialize\n${p.take(2000)}")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(l => l.contains("text#") || l.contains("payload#")),
      s"wide columns on a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("t52 bracket-slice scan pushes the union-of-brackets to parquet") {
    // the sketch + below-count passes run during plan construction
    // (bounded collects); the RETURNED plan is the slice scan — its
    // union-of-brackets pre-filter must reach the parquet scan as
    // pushed range predicates (row-group min/max pruning is what
    // makes the recount ~2B/n of the file at scale, not a full read),
    // and the exact order statistic must be a window rank, never a
    // global sort
    val p = plan("t52_percentile_sketch")
    // bounds are STRICT since the r16 boundary-duplicate peel (the
    // recount works on open intervals) — still literal range
    // predicates at the scan
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan(l_extendedprice") ||
        p.contains("Or(And(GreaterThan")),
      s"bracket bounds must push to the slice scan\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), "no cartesian in the recount")
  }

  test("dup-span inventory scans the text exactly once") {
    // the r6 shape tokenized twice (inventory agg + back-join over a
    // second gram pass); the window rewrite must leave exactly one
    // documents scan in the plan
    val p = plan("d06_dup_ngrams")
    val docScans = "documents\\.parquet".r.findAllIn(p).size
    assert(docScans == 1,
      s"dupSpanInventory must tokenize the corpus once ($docScans scans)\n${p.take(3000)}")
    assert(p.contains("Window"), p.take(2000))
  }

  test("skyline never plans as a product join; one corpus-sized exchange") {
    val p = plan("q42_skyline")
    // the naive skyline is an O(n^2) self-join — the SFS operator must
    // never degrade to one
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan as a product:\n${p.take(3000)}")
    // corpus-sized shuffle: the distinct only; the final pass exchanges
    // just the (small) local skylines
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n${p.take(3000)}")
  }

  test("importance weighting aggregates map-side before both shuffles") {
    val p = plan("t17_importance_weights")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"vocab aggregation must combine map-side:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      "the totals fold must broadcast, never cross-join at row level")
  }

  test("sequence packing windows per shard, never a global order") {
    val p = plan("t14_seq_pack")
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
    // an unpartitioned window would collapse the corpus to one task
    assert(!p.contains("SinglePartition"),
      s"packing must not serialize through one partition:\n${p.take(3000)}")
  }

  test("correlated scalar subquery decorrelates to a keyed join") {
    // q47's per-customer total must decorrelate into an aggregate +
    // equi-join on o_custkey — a plan that kept the subquery
    // correlated would re-aggregate orders per outer row (a
    // nested-loop O(n²) at scale)
    val p = plan("q47_correlated_subquery")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery must not nested-loop\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"),
      s"correlated subquery must not cartesian\n${p.take(3000)}")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"decorrelation must produce a keyed join\n${p.take(3000)}")
  }

  test("interval RANGE window is one keyed shuffle, no self-join") {
    val p = plan("q46_range_window")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"),
      s"a value-bounded frame must not expand into a self-join\n${p.take(3000)}")
  }

  test("heavy-hitter recount stays in-row against the broadcast sketch") {
    // t22's second pass broadcasts the 1-ROW sketch result and tests
    // candidate membership with array_contains inside the scan's
    // codegen span. MEASURED (20M rows / 1M keys): this form reads
    // 1.04 s where the exploded-candidates BroadcastHashJoin reads
    // 2.59 s — the ≤64-element in-row scan is noise next to the
    // join's HashedRelation build and codegen break. The broadcast
    // of one row plans as BroadcastNestedLoopJoin (a degenerate
    // 1-row "loop"); a SHUFFLED join anywhere here would be the real
    // scale bug.
    val p = plan("t22_heavy_hitters")
    assert(p.contains("array_contains"),
      s"recount must probe in-row against the broadcast sketch\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"recount must never shuffle the corpus for a 1-row probe side\n${p.take(3000)}")
  }

  test("filtered ANN pushes the metadata predicate to the corpus scan") {
    // s17's pre-filter contract: the label predicate must reach the
    // parquet scan (row-group pruning at I/O), not run post-bucket
    val p = plan("s17_filtered_ann")
    assert(p.contains("EqualTo(label,1)"),
      s"label predicate must be pushed to the scan\n${p.take(3000)}")
    // and the filtered search returns only in-filter neighbors
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val out = graft.similarity.Similarity.filteredTopK(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
      "vec_id", "embedding",
      org.apache.spark.sql.functions.col("label") === 1, 3, 4)
    val ok = emb.filter(org.apache.spark.sql.functions.col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.collect().forall(r => ok.contains(r.getLong(2))),
      "every neighbor must satisfy the predicate")
  }
}
