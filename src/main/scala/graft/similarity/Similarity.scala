package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns
  * (ArrayType(FloatType)).
  *
  * Scale design:
  *  - Brute-force top-k broadcasts the (small) query set and scans the
  *    corpus once — a map-side-only plan, no corpus shuffle; correct
  *    baseline at any corpus size when |queries| is small.
  *  - The sign-LSH variant buckets vectors by the sign pattern of their
  *    leading components (a fixed random-hyperplane family at dims
  *    0..B-1); the join is then keyed by bucket, so each query probes
  *    ~corpus/2^B vectors. Recall/probe tradeoff is tuned with B and
  *    multi-probe (flip one sign bit) — the classic IVF-style scale
  *    path when the query set itself is large.
  *
  * All arithmetic is double-precision sequential fold (zip_with +
  * aggregate), inside codegen — no UDF.
  */
object Similarity {

  /** Guarded task-parallelism lift for CPU-bound vector math — the
    * shared [[graft.util.Spread]] implementation.
    */
  private def spread(df: DataFrame): DataFrame =
    graft.util.Spread.toCpuParallelism(df)

  /** Budget for the exact-pair audits' candidate space (sum over
    * buckets/blocks of c²). Shared with [[graft.dedup.Dedup]]'s
    * blocked-exact operators. <= 0 disables. Default 2e9: one decade
    * above the sf1 audit workloads (~1e8) and one below the sf10
    * sizes that exhausted a node's disk (~1e10).
    */
  val MaxCandidatePairsKey = "spark.graft.maxCandidatePairs"
  val MaxCandidatePairsDefault = "2000000000"

  /** Query-side broadcast gate. Every probe join here is designed for
    * a SMALL query set, but an unconditional broadcast() hint is
    * honored regardless of size — a caller passing a huge query frame
    * would pin it to the driver/8 GB broadcast ceiling. Non-CBO size
    * estimates can't see filter selectivity (a 5-row filter of a
    * 100 GB corpus "estimates" 100 GB), so the gate counts for real:
    * one limit-bounded probe job (stops at cap+1 rows — constant
    * cost). At or under the cap → hint, the intended plan even when
    * global broadcast is disabled; over → no hint, and the planner
    * degrades to a shuffle join instead of OOMing the driver.
    */
  private val MaxBroadcastQueries = 100000

  /** Gate-verdict memo (r6 VERDICT #5): repeated serving against the
    * same query frame must not re-run the count probe per call. Keyed
    * by the ANALYZED logical plan of the caller's frame — the
    * repeated-serve session shape is a held DataFrame handle, whose
    * plan object is stable across calls (a RECREATED frame carries
    * fresh ExprIds/FileIndex instances and re-probes — one extra
    * constant-cost job, never a correctness issue). Weakly referenced,
    * so retired plans don't accumulate.
    */
  private val gateVerdicts =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        java.lang.Boolean]())

  /** Probe-count observability for specs. */
  private[graft] val gateProbes = new java.util.concurrent.atomic.AtomicLong

  /** Broadcast-hint `derived` iff the RAW query frame is small. The
    * count probe runs on `raw` — a limit-bounded scan of the caller's
    * query set (stops at cap+1 rows, constant cost) — not on the
    * derived frame, whose construction (centroid assignment, probe
    * explosion) would otherwise be evaluated once for the probe and
    * again in the join. `fanout` is the caller's bound on
    * |derived| / |raw| (probe explosion: nprobe cells, bits+1
    * multi-probes) — the hint lands on the EXPLODED frame, so the
    * estimate shortcut's safety margin must price it.
    */
  private def gated(derived: DataFrame, raw: DataFrame,
                    fanout: Int = 1, probeFree: Boolean = false): DataFrame = {
    // free short-circuit before any job: without CBO, size estimates
    // never shrink through FILTERS (a 5-row filter of a 100 GB corpus
    // estimates 100 GB — which is exactly what the count probe exists
    // to check), but they DO under-price projections (defaultSize per
    // column, compressed parquet bytes). The shortcut therefore
    // demands an 8x margin for width/compression under-estimates and
    // multiplies by the caller's explode fanout — conservative enough
    // that a hinted frame is really broadcastable, while the common
    // genuinely-small frame still skips the probe job.
    val est = raw.queryExecution.optimizedPlan.stats.sizeInBytes
    val thresh = raw.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh > 0 && est * 8 * math.max(1, fanout) <= BigInt(thresh))
      return broadcast(derived)
    // probe-free mode (the SQL TVF builder path, which must stay a
    // pure plan constructor — a count-probe job at ANALYSIS time
    // would make even EXPLAIN launch work): when the estimate
    // shortcut misses, degrade to the un-hinted shuffle join instead
    // of probing. Safe both ways — never an OOM hint, never a job.
    if (probeFree) return derived
    val key = raw.queryExecution.analyzed
    // probe OUTSIDE the map's monitor: computeIfAbsent would hold the
    // global gate lock for the duration of a Spark job, serializing
    // unrelated frames' gate decisions behind it. A lost race costs at
    // most one duplicate constant-cost probe.
    val cached = gateVerdicts.get(key)
    val small =
      if (cached != null) cached.booleanValue()
      else {
        gateProbes.incrementAndGet()
        val v = raw.limit(MaxBroadcastQueries + 1).count() <= MaxBroadcastQueries
        gateVerdicts.put(key, v)
        v
      }
    if (small) broadcast(derived) else derived
  }

  /** Sequential double dot product of two float-array columns — a
    * native codegen'd expression (one tight loop, no intermediate
    * array), numerically identical to the declarative
    * aggregate(zip_with(...)) form it replaced.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.arrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-pattern bucket over the first `bits` components: bit j set
    * iff v[j] > 0. Deterministic from raw values — reproducible in any
    * engine without a shared hash function.
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k cosine neighbors for each query vector (excluding
    * self-matches by id). Queries are broadcast; corpus is scanned once.
    * Output: (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(gated(q, queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** RANGE search: every corpus vector within a cosine radius of each
    * query (the radius-query API next to [[bruteForceTopK]]'s top-k —
    * what near-duplicate lookups and "all sufficiently similar"
    * retrieval use when k is unknowable in advance). Exact form:
    * queries broadcast, corpus scanned once, no window at all (unlike
    * top-k there is no rank to compute, so the plan is pure
    * scan+filter — map-side only). Result size is data-dependent;
    * callers bound it with the threshold, not k.
    *
    * Output: (query_id, neighbor_id, cos_ppm) — the similarity is
    * reported floored to integer ppm (the s14 discipline: the double
    * itself is bit-deterministic, the floor makes the emitted value
    * engine-hashable).
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, threshold: Double): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")))
    c.crossJoin(gated(q, queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .filter(col("cos") >= threshold)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("cos") * lit(1000000.0)).cast("long").as("cos_ppm"))
  }

  /** Bucketed (sign-LSH) top-k: candidates restricted to the query's
    * bucket, optionally multi-probed. Same output shape as
    * [[bruteForceTopK]]; approximate — recall rises with `multiProbe`
    * (each probe flips one sign bit, visiting the adjacent Hamming-1
    * buckets, the IVF nprobe> 1 analogue) and falls with `bits`.
    * Probed buckets are disjoint, so no candidate dedup is needed.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int, bits: Int,
                   multiProbe: Boolean = false,
                   lazyBuild: Boolean = false): DataFrame = {
    val base = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val probes =
      if (multiProbe)
        Seq(col("bucket")) ++ (0 until bits).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j)))
      else Seq(col("bucket"))
    val q = base.withColumn("probe", explode(array(probes: _*))).drop("bucket")
    // lazyBuild (the SQL TVF path): builders run at ANALYSIS time and
    // must only construct a plan — spread()'s partition-count probe
    // forces physical planning and gated()'s count probe can launch a
    // job, so both are skipped; the estimate-only broadcast decision
    // inside gated(probeFree) still fires for genuinely-small frames
    val corpusSel = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), signBucket(col(vecCol), bits).as("probe"))
    val c = if (lazyBuild) corpusSel else spread(corpusSel)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(gated(q, queries, fanout = if (multiProbe) bits + 1 else 1,
        probeFree = lazyBuild),
        Seq("probe"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** FILTERED vector search — top-k among only the corpus rows
    * matching a metadata predicate (the "filtered ANN" every serving
    * stack needs: search documents of one tenant / label / language).
    * This is the PRE-FILTER strategy: the predicate applies before
    * bucket assignment, so (a) it reaches the scan as a pushed filter
    * (label predicates prune row groups — the selectivity is paid at
    * I/O, not compute), and (b) every query receives k matches from
    * the filtered pool whenever its probed buckets hold that many —
    * unlike post-filtering a fixed-k unfiltered result, which can
    * return fewer than k (or none) under selective predicates. The
    * trade: the filtered corpus is re-bucketed per predicate, so for
    * HIGH-frequency repeated predicates, materialize the filtered
    * index once (the s08 index-table path) instead.
    */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, predicate: Column, k: Int,
                   bits: Int): DataFrame =
    bucketedTopK(corpus.filter(predicate), queries, idCol, vecCol, k, bits)

  /** Recall@k audit of an approximate ANN result against exhaustive
    * ground truth: per query, the fraction of the true top-k the
    * approximate index returned, as an exact integer ppm (hits ×
    * 10^6 div k — no float division, so the figure replays bit-exact
    * on any engine). Both inputs use the (query_id, rank, neighbor_id)
    * shape every topK variant here emits — one row per (query,
    * neighbor), as a ranked result by construction; ranks are ignored
    * (recall is set overlap — an index that returns the right
    * neighbors in a different order is not penalized). The truth side
    * defines the denominator: a query the approximate index never
    * returns scores 0, and recall@k of a truth list shorter than k
    * (corpus smaller than k+1) still divides by k.
    *
    * Scale: the join is keyed by (query_id, neighbor_id) and both
    * sides are top-k results — |queries| × k rows, never corpus-sized.
    * This is the index-quality loop a production ANN deployment runs
    * after every build/compaction, promoted to a first-class operator
    * over any two result sets (tune bits/nlist/nprobe until measured
    * recall meets the target, then ship the index).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    t.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        expr(s"CAST(hits * 1000000 DIV $k AS BIGINT)").as("recall_ppm"))
  }

  /** Quantizer fits read a seed-fixed BOUNDED sample, never the full
    * corpus: k-means centroid quality converges at a fixed sample size
    * (a few hundred points per centroid), so at 100 TB the fit cost
    * must be O(sample), not O(corpus) — index BUILD reads a sample;
    * only the cheap encode/assign projections touch every row. Small
    * corpora (≤ maxRows) pass through untouched, so test-scale results
    * are unchanged.
    */
  private def boundedTrainingSample(df: DataFrame, maxRows: Long): DataFrame = {
    val n = df.count()
    if (n <= maxRows) df
    else df.sample(withReplacement = false, maxRows.toDouble / n, seed = 42L)
  }

  /** Train the IVF coarse quantizer: k-means with a fixed seed over a
    * bounded sample (see [[boundedTrainingSample]]). Returns the
    * (tiny) centroid table as (cell id, float array).
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, maxTrainRows: Long = 1000000L): Seq[(Int, Array[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = boundedTrainingSample(
      spread(corpus.select(col(idCol).as("id"),
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))),
      maxTrainRows)
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(train)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
  }

  /** Per-row top-`n` nearest cells over a LITERAL centroid array — a
    * pure projection: the nlist cosines, sort, and slice all happen
    * inside one row's expression tree, so cell assignment is
    * shuffle-free at any corpus size (the previous form crossJoined
    * corpus × centroids and ranked with a row_number window — a full
    * corpus shuffle just to take a per-row argmax).
    *
    * Sort key is struct(cdot, -cell): array_sort ascending + reverse
    * gives cdot DESC with ties broken by cell ASC, matching the
    * (cos DESC, id ASC) convention everywhere else in this module.
    */
  private def nearestCells(v: Column, centroids: Seq[(Int, Array[Float])],
                           n: Int): Column = {
    val cents = array(centroids.map { case (i, cArr) =>
      struct(lit(i).as("cell"), typedLit(cArr).as("centroid"))
    }: _*)
    val scored = transform(cents, c =>
      struct(
        (dot(v, c.getField("centroid")) /
          (norm(v) * norm(c.getField("centroid")))).as("cdot"),
        (-c.getField("cell")).as("negcell")))
    slice(reverse(array_sort(scored)), 1, n)
  }

  /** IVF-style ANN: a k-means coarse quantizer partitions the corpus
    * into `nlist` cells; each query probes its `nprobe` nearest cells
    * and ranks candidates by exact cosine. This is the classic
    * IVF-Flat layout: at 100 TB the corpus is written clustered by
    * cell id (one shuffle at index-build time), a query scans
    * ~nprobe/nlist of the data, and the centroid table (nlist × dim
    * floats) is a plan literal evaluated in-row — cell assignment
    * never shuffles. Deterministic via fixed seed.
    *
    * Output: (query_id, rank, neighbor_id) like [[bruteForceTopK]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16,
              nprobe: Int = 4): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k,
      trainCentroids(corpus, idCol, vecCol, nlist), nprobe)

  /** Attach the `cell` column: each row's `nprobe` nearest coarse
    * cells (one row per probed cell when nprobe > 1). A narrow
    * projection — `explain` shows no Exchange and no Window; this is
    * the stage that assigns 100 TB of corpus vectors to cells, so it
    * must never shuffle.
    */
  def assignCells(df: DataFrame, vecCol: String,
                  centroids: Seq[(Int, Array[Float])], nprobe: Int): DataFrame =
    if (nprobe == 1)
      df.withColumn("cell",
        element_at(nearestCells(col(vecCol), centroids, 1), 1)
          .getField("negcell") * -1)
    else
      df.withColumn("cell",
        explode(transform(nearestCells(col(vecCol), centroids, nprobe),
          x => x.getField("negcell") * -1)))

  /** IVF search against an already-trained centroid table (the index
    * reuse path: train once, serve many query batches).
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  centroids: Seq[(Int, Array[Float])], nprobe: Int): DataFrame = {
    val c = assignCells(
      spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))),
      "cv", centroids, 1)
    val q = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "qv", centroids, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(gated(q, queries, fanout = nprobe), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Embedding near-duplicate pairs: (id_a, id_b) with cosine ≥
    * threshold, bucket-blocked so no quadratic stage materializes.
    * Near-identical vectors share sign buckets with high probability;
    * raise recall with fewer bits or multi-probe.
    *
    * Per-vector norms are staged BEFORE the pair join (per-pair cosine
    * is then one dot product, not dot + two norms), and the join is
    * salted: with few sign buckets the join has few keys, so the right
    * side is replicated across `salt` sub-keys to spread pair
    * generation over salt × buckets tasks — the standard skew
    * treatment, and the cost (replicating the smaller per-bucket side)
    * is negligible next to the per-pair math.
    */
  // ---- product quantization (IVF's memory-side complement) ----
  //
  // PQ compresses each vector to M small codes (here M bytes): the
  // vector is cut into M subvectors, each subspace gets its own tiny
  // k-means codebook, and a vector is stored as its M nearest-centroid
  // ids. Search scores a query against COMPRESSED codes (asymmetric
  // distance): per subspace, the exact distance from the query
  // subvector to the row's selected centroid, summed across subspaces.
  // At 100 TB this is what makes a billion-vector index fit: 64 floats
  // (256 B) become M=4 codes (4 B), and scoring never touches the
  // original vectors.

  /** Squared L2 between two float arrays via three sequential dot
    * folds: d2 = aa - 2ab + bb, each term order-deterministic (the
    * oracle mirrors the exact expression shape).
    */
  private def d2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Train per-subspace codebooks: M independent k-means fits (fixed
    * seeds) over a bounded sample's subvector slices (the sample is
    * drawn ONCE and persisted across the M fits — one corpus pass, not
    * M). Returns (sub, code, centroid) — M × ksub rows, the whole
    * index metadata.
    */
  def trainCodebooks(corpus: DataFrame, vecCol: String, m: Int, dsub: Int,
                     ksub: Int, maxTrainRows: Long = 1000000L)
      : Seq[(Int, Int, Array[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = boundedTrainingSample(
      spread(corpus.select(col(vecCol).as("__v"))), maxTrainRows).persist()
    try {
      (0 until m).flatMap { sub =>
        val train = sampled.select(
          array_to_vector(slice(col("__v"), sub * dsub + 1, dsub)
            .cast("array<double>")).as("features"))
        val model = new KMeans().setK(ksub).setSeed(42L + sub).setMaxIter(10)
          .fit(train)
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (sub, i, c.toArray.map(_.toFloat))
        }
      }
    } finally { sampled.unpersist(); () }
  }

  /** Nearest codebook entry for one subvector — like [[nearestCells]],
    * a pure in-row expression over the literal codebook: compute ksub
    * distances, sort (d2 ASC, code ASC), take the head. No shuffle.
    */
  private def nearestCode(sub: Column, cents: Seq[(Int, Array[Float])]): Column = {
    val arr = array(cents.map { case (code, c) =>
      struct(lit(code).as("code"), typedLit(c).as("centroid"))
    }: _*)
    val scored = transform(arr, c => struct(
      d2(sub, c.getField("centroid")).as("d2"),
      c.getField("code").as("code")))
    element_at(array_sort(scored), 1).getField("code")
  }

  /** Attach the `codes` column (array of M codebook ids) — the PQ
    * encode pass. A narrow projection: this is the stage that
    * compresses the full corpus, so it must never shuffle.
    */
  def pqEncode(df: DataFrame, vecCol: String,
               codebooks: Seq[(Int, Int, Array[Float])],
               m: Int, dsub: Int): DataFrame = {
    val bySub = codebooks.groupBy(_._1)
    df.withColumn("codes", array((0 until m).map { sub =>
      nearestCode(slice(col(vecCol), sub * dsub + 1, dsub),
        bySub(sub).map(x => (x._2, x._3)).sortBy(_._1))
    }: _*))
  }

  /** PQ QUANTIZER-QUALITY audit — per-subspace distortion and codebook
    * utilization over the encoded corpus (the third leg of the audit
    * family: s10 measures serving recall, s14 the coarse quantizer's
    * balance, this the fine quantizer's fidelity). `codes_used` counts
    * live codebook entries — dead codes are wasted index bits and the
    * k-means fit should shrink ksub or refit; `sum_d2_ppm` is the
    * per-subspace reconstruction-error decomposition (per-row floor
    * before the sum — order-free integers, the s14 discipline).
    *
    * Scale: encode is [[pqEncode]]'s narrow in-row projection; the
    * per-subspace explode multiplies rows by M (small); the only
    * shuffle is the M-row final agg.
    *
    * Output: (sub, n_vectors, codes_used, sum_d2_ppm).
    */
  def pqDistortionAudit(corpus: DataFrame, vecCol: String,
                        codebooks: Seq[(Int, Int, Array[Float])],
                        m: Int, dsub: Int): DataFrame = {
    val bySub = requireContiguousCodes(codebooks, m)
    val enc = pqEncode(spread(corpus.select(col(vecCol).as("v"))),
      "v", codebooks, m, dsub)
    enc.select(explode(array((0 until m).map { sub =>
        val table = typedLit(bySub(sub).sortBy(_._2).map(_._3))
        val code = element_at(col("codes"), sub + 1)
        struct(lit(sub).as("sub"), code.as("code"),
          floor(d2(slice(col("v"), sub * dsub + 1, dsub),
            element_at(table, code + 1)) * lit(1000000.0)).cast("long")
            .as("d2ppm"))
      }: _*)).as("p"))
      .select(col("p.sub").as("sub"), col("p.code").as("code"),
        col("p.d2ppm").as("d2ppm"))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("code")).as("codes_used"),
        sum(col("d2ppm")).as("sum_d2_ppm"))
  }

  /** PQ top-k by asymmetric distance: queries (broadcast) score every
    * corpus row's codes; per subspace the query slice is compared to
    * the row's selected centroid (a literal-array lookup — in a real
    * serving path this is the per-query distance table), terms summed
    * in subspace order. Output: (query_id, rank, neighbor_id).
    */
  /** Asymmetric-distance expression: per subspace, d2 from the query
    * slice (`qv`) to the centroid the row's code selects (a literal
    * distance-table lookup), summed in subspace order. Shared by the
    * PQ and IVF-PQ rankers so their float math stays bit-identical.
    */
  /** Validate the positional-lookup contract every ADC/distortion
    * consumer relies on: `element_at(sortBy(code).map(vec), code + 1)`
    * is only the right centroid when each subspace's code ids are
    * EXACTLY 0 until ksub with no gaps — a codebook with
    * non-contiguous ids would otherwise silently score distances
    * against the wrong centroid. Returns the by-subspace grouping so
    * callers don't re-group. Driver-side, O(codebook).
    */
  private def requireContiguousCodes(codebooks: Seq[(Int, Int, Array[Float])],
                                     m: Int): Map[Int, Seq[(Int, Int, Array[Float])]] = {
    val bySub = codebooks.groupBy(_._1)
    require((0 until m).forall(bySub.contains),
      s"codebooks must cover every subspace 0 until $m")
    bySub.foreach { case (sub, entries) =>
      val codes = entries.map(_._2).sorted
      require(codes == (0 until codes.length),
        s"subspace $sub codebook code ids must be contiguous " +
          s"0 until ${codes.length} (positional centroid lookup), got " +
          codes.take(20).mkString("[", ",", if (codes.length > 20) ",…]" else "]"))
    }
    bySub
  }

  private def adcExpr(codebooks: Seq[(Int, Int, Array[Float])],
                      m: Int, dsub: Int): Column = {
    val bySub = requireContiguousCodes(codebooks, m)
    (0 until m).map { sub =>
      val table = typedLit(bySub(sub).sortBy(_._2).map(_._3))
      d2(slice(col("qv"), sub * dsub + 1, dsub),
        element_at(table, element_at(col("codes"), sub + 1) + 1))
    }.reduce(_ + _)
  }

  /** Rank candidate (query_id, neighbor_id, adc) rows: top-k per query
    * by (adc ASC, neighbor ASC) — the shared ADC ranking tail.
    */
  private[similarity] def rankByAdc(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  def pqTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 codebooks: Seq[(Int, Int, Array[Float])],
                 m: Int, dsub: Int): DataFrame = {
    val encoded = pqEncode(
      spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))),
      "cv", codebooks, m, dsub).select(col("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    rankByAdc(
      encoded.join(gated(q, queries), col("neighbor_id") =!= col("query_id"))
        .withColumn("adc", adcExpr(codebooks, m, dsub)), k)
  }

  /** IVF-PQ: the coarse quantizer prunes the search to `nprobe` cells
    * (only ~nprobe/nlist of the corpus is scored) and PQ codes make
    * each scored row a few bytes — together the billion-vector
    * serving layout. Corpus rows carry (cell, codes); queries probe
    * their nearest cells and rank candidates by asymmetric distance.
    * (Production refinement: quantize residuals v − centroid[cell]
    * instead of raw vectors; the plumbing is identical.)
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int,
                centroids: Seq[(Int, Array[Float])],
                codebooks: Seq[(Int, Int, Array[Float])],
                m: Int, dsub: Int, nprobe: Int): DataFrame =
    ivfPqServe(
      ivfPqIndexRows(corpus, idCol, vecCol, centroids, codebooks, m, dsub),
      queries, idCol, vecCol, k, centroids, codebooks, m, dsub, nprobe)

  // ---- scalar quantization (SQ8): 4-byte floats → 1-byte codes ----
  //
  // The third quantization family beside IVF (coarse cells) and PQ
  // (subspace codebooks): each dimension is linearly mapped onto
  // 0..255 against per-dimension corpus bounds. 4× storage compression
  // with no training beyond one min/max reduction — the rung a
  // deployment reaches for FIRST, before PQ's codebook machinery.

  /** Per-dimension [min, max] bounds over the corpus: ONE reduction
    * job (2·dim agg expressions, partial-aggregated map-side, no
    * row-explosion shuffle), collected to the driver like the
    * centroid tables — the result is dim-sized, never corpus-sized.
    * Exact min/max (not sampled): the bounds ARE the codec contract,
    * and an out-of-range value under sampled bounds would clip.
    */
  def trainSq8Bounds(corpus: DataFrame, vecCol: String,
                     dim: Int): (Array[Double], Array[Double]) = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val aggs = (0 until dim).map(i =>
      min(element_at(col(vecCol), i + 1).cast("double")).as(s"__mn_$i")) ++
      (0 until dim).map(i =>
        max(element_at(col(vecCol), i + 1).cast("double")).as(s"__mx_$i"))
    val r = corpus.agg(aggs.head, aggs.tail: _*).collect()(0)
    (Array.tabulate(dim)(i => r.getDouble(i)),
      Array.tabulate(dim)(i => r.getDouble(dim + i)))
  }

  /** Encode a vector to int codes 0..255: floor((x−mn)/(mx−mn)·255),
    * computed in double with the exact expression shape the oracle
    * replays. A constant dimension (mx = mn) encodes as 0 — the
    * division-by-zero guard; its dequantized value is exactly mn.
    * x = mx encodes as 255 ((mx−mn)/(mx−mn) is exactly 1.0 in IEEE
    * division), so the code range is closed — no clamp needed.
    */
  def sq8Codes(v: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedLit(mins); val mx = typedLit(maxs)
    transform(v, (x, i) => {
      val lo = element_at(mn, i + 1); val hi = element_at(mx, i + 1)
      when(hi === lo, lit(0L))
        .otherwise(floor((x.cast("double") - lo) / (hi - lo) * lit(255.0)))
    })
  }

  /** Reconstruct double values from SQ8 codes: mn + c·(mx−mn)/255. */
  def sq8Dequant(codes: Column, mins: Array[Double],
                 maxs: Array[Double]): Column = {
    val mn = typedLit(mins); val mx = typedLit(maxs)
    transform(codes, (c, i) => {
      val lo = element_at(mn, i + 1); val hi = element_at(mx, i + 1)
      lo + c.cast("double") * (hi - lo) / lit(255.0)
    })
  }

  /** Top-k by cosine served from the SQ8-compressed corpus: corpus
    * vectors flow encode → dequantize (what a 1-byte-stored corpus
    * yields at read time), queries stay raw — the asymmetric scoring
    * every scalar-quantized deployment uses. Same output shape and
    * ranking rules as [[bruteForceTopK]].
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int,
              mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
      sq8Dequant(sq8Codes(col(vecCol), mins, maxs), mins, maxs).as("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(gated(q, queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Two-stage IVF-PQ serving — the standard precision refinement
    * every PQ deployment runs: stage 1 shortlists `candidates` per
    * query by asymmetric distance over the quantized index (cheap,
    * code-only, never touches a corpus vector); stage 2 fetches the
    * RAW vectors of only the shortlisted rows through a keyed join
    * (|queries| × candidates rows — the single bounded corpus touch)
    * and re-ranks them by exact cosine. Quantization error can
    * reorder an ADC shortlist; the re-rank restores exact order
    * within it, so precision@k approaches brute force while the scan
    * cost stays the index's.
    */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, candidates: Int,
                      centroids: Seq[(Int, Array[Float])],
                      codebooks: Seq[(Int, Int, Array[Float])],
                      m: Int, dsub: Int, nprobe: Int): DataFrame = {
    require(candidates >= k,
      s"shortlist size ($candidates) must be >= k ($k)")
    val index = ivfPqIndexRows(corpus, idCol, vecCol, centroids, codebooks, m, dsub)
    val shortlist = rankByAdc(scoredCandidates(index, queries, idCol, vecCol,
        centroids, codebooks, m, dsub, nprobe), candidates)
      .select(col("query_id"), col("neighbor_id"))
    val cv = spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    shortlist.join(cv, Seq("neighbor_id"))
      .join(gated(qv, queries), Seq("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** The IVF-PQ index-BUILD pass: (neighbor_id, cell, codes) for every
    * corpus row — assign + encode, both narrow shuffle-free
    * projections. This is what gets MATERIALIZED (one pass over the
    * corpus, persisted partitioned by cell) so that serving never
    * touches the raw vectors again; at 100 TB index build and query
    * are different jobs. Reference analogy: the persisted driver-side
    * index of hadoop/.../CarbonInputFormat.java:76-481.
    */
  def ivfPqIndexRows(corpus: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[(Int, Array[Float])],
                     codebooks: Seq[(Int, Int, Array[Float])],
                     m: Int, dsub: Int): DataFrame =
    pqEncode(
      assignCells(
        spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))),
        "cv", centroids, 1),
      "cv", codebooks, m, dsub)
      .select(col("neighbor_id"), col("cell"), col("codes"))

  /** IVF-PQ SERVING from a prebuilt index: the corpus side is the
    * materialized (neighbor_id, cell, codes) table — a query probes
    * nprobe cells of the index (cell-partitioned, so the scan prunes
    * to those partitions) and never reads a corpus vector; only the
    * tiny query set carries raw embeddings. Identical math to
    * [[ivfPqTopK]] by construction (it delegates here).
    */
  def ivfPqServe(index: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 centroids: Seq[(Int, Array[Float])],
                 codebooks: Seq[(Int, Int, Array[Float])],
                 m: Int, dsub: Int, nprobe: Int): DataFrame =
    rankByAdc(scoredCandidates(index, queries, idCol, vecCol,
      centroids, codebooks, m, dsub, nprobe), k)

  /** The serve pipeline up to (but not including) the top-k rank: all
    * candidates of the probed cells with their asymmetric distances.
    * Factored out so [[AnnSession]] can persist it as the reusable
    * candidate pool across interactive k refinements.
    */
  private[similarity] def scoredCandidates(index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])],
      codebooks: Seq[(Int, Int, Array[Float])],
      m: Int, dsub: Int, nprobe: Int): DataFrame = {
    val q = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "qv", centroids, nprobe)
    index.join(gated(q, queries, fanout = nprobe), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", adcExpr(codebooks, m, dsub))
  }

  // ---- residual quantization (the production IVF-PQ refinement) ----
  //
  // Raw-vector PQ wastes code range re-describing WHERE a cell sits in
  // the space; quantizing the residual v − centroid[cell] centers every
  // cell's distribution at the origin, so the same codebook bits buy
  // finer distances. The plumbing is identical to raw IVF-PQ — one
  // extra subtraction in the encode and query projections.

  /** v − centroid[cell], computed in DOUBLE (float→double casts are
    * exact, so the oracle reproduces the bits). The centroid table is
    * a plan literal indexed by the row's cell id — a pure projection,
    * no join, no shuffle.
    */
  private def residualExpr(v: Column, cellCol: Column,
                           centroids: Seq[(Int, Array[Float])]): Column = {
    val table = typedLit(centroids.sortBy(_._1).map(_._2))
    val cent = element_at(table, cellCol.cast("int") + 1)
    zip_with(v, cent, (x, c) => x.cast("double") - c.cast("double"))
  }

  /** Train PQ codebooks over residuals: assign each (sampled) vector
    * its nearest coarse cell, subtract that centroid, fit the
    * per-subspace codebooks on what remains.
    */
  def trainResidualCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], m: Int, dsub: Int, ksub: Int,
      maxTrainRows: Long = 1000000L): Seq[(Int, Int, Array[Float])] = {
    val assigned = assignCells(
      spread(corpus.select(col(vecCol).as("__v"))), "__v", centroids, 1)
    val rv = assigned.withColumn("__rv",
      residualExpr(col("__v"), col("cell"), centroids))
    trainCodebooks(rv, "__rv", m, dsub, ksub, maxTrainRows)
  }

  /** Residual IVF-PQ top-k: corpus rows carry (cell, codes-of-residual);
    * each query probes its nprobe nearest cells and is scored in THAT
    * cell's residual frame (query residual recomputed per probed cell —
    * asymmetric distance stays exact on the query side). Same plan
    * shape as [[ivfPqTopK]]: encode/assign are narrow projections, the
    * probe is a broadcast join keyed by cell.
    */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int,
                        centroids: Seq[(Int, Array[Float])],
                        codebooks: Seq[(Int, Int, Array[Float])],
                        m: Int, dsub: Int, nprobe: Int): DataFrame = {
    val c = pqEncode(
      assignCells(
        spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))),
        "cv", centroids, 1)
        .withColumn("rv", residualExpr(col("cv"), col("cell"), centroids)),
      "rv", codebooks, m, dsub)
      .select(col("neighbor_id"), col("cell"), col("codes"))
    val q = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv0")),
      "qv0", centroids, nprobe)
      .withColumn("qv", residualExpr(col("qv0"), col("cell"), centroids))
      .select(col("query_id"), col("cell"), col("qv"))
    rankByAdc(
      c.join(gated(q, queries, fanout = nprobe), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("adc", adcExpr(codebooks, m, dsub)), k)
  }

  /** Salted sign-bucket self-join scaffold shared by [[nearDupPairs]]
    * and [[knnLabelConsistency]] — the skew-guarded all-candidates
    * shape: the `a` side carries ONE salt (pmod of its id), the `b`
    * side replicates across all salts, so each (a,b) pair meets at
    * EXACTLY one salt and pair generation spreads over salt × buckets
    * tasks. `carry` columns thread through as <name>_a / <name>_b.
    * Emits (id_a, va, na, id_b, vb, nb, bucket, salt, carry…) with
    * self-pairs NOT yet excluded — callers choose their own pair
    * predicate (`<` for unordered pairs, `=!=` for per-vector
    * neighborhoods).
    *
    * EAGER at call time: the pair-space pre-flight below runs one real
    * Spark aggregation over the corpus (including the signBucket
    * compute) BEFORE the candidate-pair DataFrame is returned — so
    * constructing the frame is not free even if it is never acted on,
    * and repeated construction repeats the pass (callers invoking the
    * scaffold in a loop should build once and reuse). Deliberately NOT
    * persisted to share with the join that follows: caching would
    * materialize the full wide corpus (vectors included) to memory or
    * disk to save one narrow pass — a bad trade at exactly the corpus
    * sizes where the guard matters, and the returned frame's consumers
    * have no unpersist hook. Disable via
    * `spark.graft.maxCandidatePairs <= 0` to make construction lazy
    * again.
    */
  private def saltedSelfJoin(corpus: DataFrame, idCol: String,
      vecCol: String, bits: Int, salt: Int,
      carry: Seq[String] = Nil, opName: String = "exact-pair audit"): DataFrame = {
    val v = spread(corpus.select((col(idCol).as("id") +: col(vecCol).as("v") +:
        carry.map(col)): _*)
        .withColumn("bucket", signBucket(col("v"), bits)))
      .withColumn("nrm", norm(col("v")))
    // pair-space pre-flight: salting bounds PER-TASK work, not the
    // TOTAL pair space — one decade past the audit regime the
    // in-bucket candidate shuffle exceeds a node's disk before it
    // exceeds anyone's patience (sf10 measurement: s09/s13 spilled
    // >52 GB and died on ENOSPC after 17 min). One cheap distributive
    // agg turns that into an immediate, actionable error.
    val budget = corpus.sparkSession.conf
      .get(Similarity.MaxCandidatePairsKey, Similarity.MaxCandidatePairsDefault)
      .toLong
    if (budget > 0) {
      // Σc² in DOUBLE: a long product wraps silently for a bucket of
      // ~3.04e9+ rows — exactly the pathological scale the guard
      // exists for (doubles are exact to 2^53 and merely approximate
      // beyond, which only matters far past any sane budget)
      val r = v.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c").cast("double") * col("c").cast("double")).as("p"),
          max(col("c")).as("m")).head()
      val pairs = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      if (pairs > budget.toDouble) throw new IllegalStateException(
        s"$opName: estimated in-bucket candidate pairs ${pairs.toLong} " +
        s"(largest bucket ${r.getLong(1)} vectors) exceed " +
        s"${Similarity.MaxCandidatePairsKey}=$budget. Exact-pair audits " +
        "are for corpora where the full pair space is affordable; at " +
        "this size, raise `bits` so buckets stay bounded, audit a " +
        "sample, or serve neighbors from the ANN ladder " +
        "(bucketedTopK/ivfTopK/ivfPqIndexTopK — near-flat in corpus " +
        "size). Set the conf <= 0 to disable this guard.")
    }
    val a = v.select((Seq(col("id").as("id_a"), col("v").as("va"),
      col("bucket"), col("nrm").as("na"),
      pmod(col("id"), lit(salt)).cast("int").as("salt")) ++
      carry.map(c => col(c).as(s"${c}_a"))): _*)
    val b = v.select((Seq(col("id").as("id_b"), col("v").as("vb"),
      col("bucket"), col("nrm").as("nb")) ++
      carry.map(c => col(c).as(s"${c}_b"))): _*)
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    a.join(b, Seq("bucket", "salt"))
  }

  /** Per-vector kNN LABEL-AGREEMENT over sign-LSH buckets — the
    * label-noise diagnostic a labeled-embedding corpus runs before
    * training (neighborhood label voting, the Confident-Learning /
    * deep-kNN pruning signal): each vector's k nearest in-bucket
    * neighbors vote, and `agree` counts the votes matching the
    * vector's own label. A vector alone in its bucket keeps
    * agree = 0 / n_neighbors = 0 (still a row — loners are signal,
    * not droppable; consumers normalize by n_neighbors, never by k,
    * so sparse neighborhoods are not misread as disagreement).
    *
    * Scale: the self-join is bucket+salt keyed ([[saltedSelfJoin]] —
    * each (a,b) pair meets at exactly one salt), never all-pairs; the
    * per-vector top-k is one window over the bucket-pair rows keyed
    * by id. Ranks replay identically in any engine: deterministic
    * double dot products, ties by neighbor id. `bits` sets the bucket
    * count — raise it with corpus size so buckets stay bounded.
    *
    * Output: (id, label, agree, n_neighbors) — integers only, so the
    * result is hash-comparable across engines.
    *
    * NOTE: calling this runs the scaffold's EAGER pair-space
    * pre-flight (one corpus aggregation) before the frame returns —
    * see [[saltedSelfJoin]].
    */
  def knnLabelConsistency(corpus: DataFrame, idCol: String, vecCol: String,
                          labelCol: String, k: Int, bits: Int,
                          salt: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b").asc)
    val voted = saltedSelfJoin(corpus, idCol, vecCol, bits, salt,
        carry = Seq(labelCol), opName = "knnLabelConsistency")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("id_a"))
      .agg(sum(when(col(s"${labelCol}_b") === col(s"${labelCol}_a"), 1L)
        .otherwise(0L)).as("agree"),
        count(lit(1)).as("n_neighbors"))
    corpus.select(col(idCol).as("id"), col(labelCol).as("label"))
      .join(voted.withColumnRenamed("id_a", "id"), Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("agree"), lit(0L)).as("agree"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }

  /** Exact cosine near-dup pairs over sign-LSH buckets. NOTE: calling
    * this runs the scaffold's EAGER pair-space pre-flight (one corpus
    * aggregation) before the frame returns — see [[saltedSelfJoin]].
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bits: Int, salt: Int = 8): DataFrame =
    saltedSelfJoin(corpus, idCol, vecCol, bits, salt,
        opName = "nearDupPairs")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))

  /** MUTUAL kNN graph over sign-LSH buckets — the neighborhood graph
    * that embedding-space clustering / manifold methods build before
    * community detection or label propagation: an undirected edge
    * (a, b) exists iff a is among b's k nearest in-bucket neighbors
    * AND b is among a's (the mutual filter is the standard noise
    * suppressor — a hub vector close to everything only keeps edges
    * to vectors that reciprocate).
    *
    * Scale: candidates come from [[saltedSelfJoin]] (bucket+salt
    * keyed, never all-pairs); the per-vector top-k is one window over
    * the bucket-pair rows. The directed edge set is ≤ |corpus| × k
    * rows, and mutuality is decided WITHOUT a second corpus pass: a
    * directed edge appears at most once per direction, so grouping by
    * the unordered pair and keeping count = 2 is exactly "both
    * directions present" — one keyed shuffle over the bounded edge
    * set. Ranks replay in any engine (double cosine, ties by id).
    *
    * Output: (id_a, id_b) with id_a < id_b — integers only.
    */
  def mutualKnnGraph(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, bits: Int, salt: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b").asc)
    val directed = saltedSelfJoin(corpus, idCol, vecCol, bits, salt,
        opName = "mutualKnnGraph")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a"), col("id_b"))
    directed
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === 2)
      .select(col("id_a"), col("id_b"))
  }

  /** k-means CLUSTER AUDIT over trained coarse centroids — the
    * balance/compactness report a curator reads after fitting the IVF
    * quantizer (and before trusting SemDeDup cells or cell-pruned
    * serving): per cell, its population and summed squared distance
    * to the centroid (the inertia decomposition). A cell hoarding
    * most of the corpus means the quantizer under-fits and every
    * cell-keyed stage downstream inherits the skew.
    *
    * Scale: assignment is the same in-row literal-centroid projection
    * as [[assignCells]] (no shuffle, no window); the centroid table
    * (nlist × dim floats) broadcasts; the only shuffle is the final
    * nlist-row aggregation. Per-row d2 is floored to integer ppm
    * BEFORE summing, so the per-cell total is an order-free integer —
    * hash-comparable across engines and across partitionings.
    *
    * Output: (cell, n_vectors, sum_d2_ppm).
    */
  def clusterAudit(corpus: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(centroids.nonEmpty, "clusterAudit needs trained centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.toDF("cell", "centroid"))
    assignCells(
        corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
        "v", centroids, 1)
      .join(cents, Seq("cell"))
      .withColumn("__d2ppm",
        floor(d2(col("v"), col("centroid")) * lit(1000000.0)).cast("long"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("__d2ppm")).as("sum_d2_ppm"))
  }
}
