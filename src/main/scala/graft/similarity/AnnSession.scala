package graft.similarity

import org.apache.spark.sql.DataFrame

/** Interactive ANN serve session — the incremental-reuse shape of
  * "Incremental Based Framework for Efficient Top-K Similarity Search
  * in Interactive Data Analysis Sessions" (EDBT 2020, PAPERS.md): an
  * analyst iterates on the SAME query set, refining k, and each
  * refinement must not redo the probe work of the last one.
  *
  * The session pins everything reusable once:
  *  - the materialized IVF-PQ index handle (built by
  *    [[Similarity.ivfPqIndexRows]], served corpus-vector-free);
  *  - the quantizers (plan literals — centroid/codebook arrays);
  *  - the scored CANDIDATE POOL per query frame: all candidates in
  *    the probed cells with their asymmetric distances, persisted on
  *    first use. `topK(queries, k)` for a larger k over the same
  *    frame is then a re-rank of the cached pool — no index scan, no
  *    re-scoring — exact as long as k stays within the pool (the pool
  *    holds EVERY candidate of the probed cells, so any k is within
  *    it; a larger `nprobe` is the only refinement that needs a new
  *    pool, and that allocates a fresh cache entry).
  *
  * Pools are cached per query-frame plan (the held-DataFrame session
  * discipline of the broadcast-gate memo) and released by [[close]].
  */
final class AnnSession(index: DataFrame,
                       centroids: Seq[(Int, Array[Float])],
                       codebooks: Seq[(Int, Int, Array[Float])],
                       m: Int, dsub: Int, nprobe: Int) {

  // keyed by (frame plan, idCol, vecCol): the same frame served over a
  // DIFFERENT vector column is a different pool — a plan-only key
  // would re-rank candidates scored on the wrong column. BuildOnceKeyed,
  // not TrieMap.getOrElseUpdate: the latter can evaluate the builder
  // concurrently, and the losing insert's persist()ed pool would leak
  // cache memory until session end.
  private val pools = new graft.util.BuildOnceKeyed[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, String),
    DataFrame]

  /** The scored candidate pool for a query frame: one probe join +
    * ADC scoring pass, persisted for every later refinement — built
    * and persisted exactly once per (frame, columns) even under
    * racing topK calls.
    */
  private def pool(queries: DataFrame, idCol: String,
                   vecCol: String): DataFrame =
    pools.getOrElseUpdate((queries.queryExecution.analyzed, idCol, vecCol), {
      val scored = Similarity.scoredCandidates(index, queries, idCol, vecCol,
        centroids, codebooks, m, dsub, nprobe)
      scored.persist()
    })

  /** Exact top-k over the probed cells — identical results to
    * [[Similarity.ivfPqServe]] at any k, but repeated/refined calls on
    * a held query frame re-rank the cached pool instead of re-probing.
    */
  def topK(queries: DataFrame, idCol: String, vecCol: String,
           k: Int): DataFrame =
    Similarity.rankByAdc(pool(queries, idCol, vecCol), k)

  /** Diversity-aware top-k: greedy MAXIMAL MARGINAL RELEVANCE over
    * the same cached candidate pool `topK` serves from. Each step
    * picks argmax over the remaining pool of
    * `lambda·(−adc) − (1−lambda)·max_{s∈selected} cos(c, s)` (ties by
    * neighbor id), with candidate-candidate similarity computed on
    * PQ-RECONSTRUCTED vectors — the codes are already in the pool, so
    * diversification reads NO corpus vectors, exactly like serving.
    * `lambda = 1` degenerates to `topK` (pure relevance); the first
    * pick always equals plain top-1.
    *
    * The greedy loop runs on the driver over at most
    * |queries| × poolSize candidates (top-poolSize of the pool by
    * relevance) — bounded by the request, never by the corpus, the
    * same contract as collecting a top-k result itself. That contract
    * is ENFORCED, not assumed: a bounded count probe on the query
    * frame (the broadcast-gate discipline) fails loudly when
    * |queries| × poolSize exceeds [[AnnSession.MaxDiverseRows]],
    * before any pool is built or collected — a caller accidentally
    * passing a corpus-sized frame gets an error naming the fix
    * (batch the frame) instead of a driver OOM.
    */
  def topKDiverse(queries: DataFrame, idCol: String, vecCol: String,
                  k: Int, poolSize: Int = 64,
                  lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    // an oversized poolSize must fail naming ITSELF: past MaxDiverseRows
    // the integer division below would floor maxQueries to 0 and reject
    // every non-empty frame with a message blaming the frame size
    require(poolSize <= AnnSession.MaxDiverseRows,
      s"poolSize ($poolSize) exceeds the driver-side candidate cap " +
        s"(${AnnSession.MaxDiverseRows} rows): even one query would " +
        "collect more than the MMR contract allows — shrink poolSize")
    val maxQueries = AnnSession.MaxDiverseRows / poolSize
    // limit(cap+1).count() early-exits the scan — constant cost however
    // large the frame is, so the guard itself never pays corpus price
    if (queries.select(queries.col(idCol)).limit(maxQueries + 1).count() > maxQueries)
      throw new IllegalArgumentException(
        s"topKDiverse collects |queries| x poolSize candidate rows on the " +
          s"driver; this frame exceeds $maxQueries queries at poolSize=" +
          s"$poolSize (cap ${AnnSession.MaxDiverseRows} rows). MMR is an " +
          "interactive-serve operator — batch the query frame, or use " +
          "topK for corpus-scale scoring")
    val spark = queries.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.col("query_id"))
      .orderBy(org.apache.spark.sql.functions.col("adc").asc,
        org.apache.spark.sql.functions.col("neighbor_id").asc)
    import org.apache.spark.sql.functions.{col, row_number}
    val poolDf = pool(queries, idCol, vecCol)
    val rows = poolDf
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= poolSize)
      .select(col("query_id"), col("neighbor_id"), col("adc"), col("codes"))
      .collect()
    val bySub: Map[(Int, Int), Array[Float]] =
      codebooks.map { case (s, c, v) => (s, c) -> v }.toMap
    def decode(codes: Seq[Int]): Array[Float] = {
      val out = new Array[Float](m * dsub)
      var s = 0
      while (s < m) {
        System.arraycopy(bySub((s, codes(s))), 0, out, s * dsub, dsub)
        s += 1
      }
      out
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    // ids read via Number: a query frame with an int id column must not
    // throw at collect time (the pool pipeline itself never widens them).
    val picked = rows.groupBy(_.getAs[Number](0).longValue()).toSeq
      .sortBy(_._1).flatMap {
      case (qid, cands) =>
        val cs = cands.map(r => (r.getAs[Number](1).longValue(),
          r.getAs[Number](2).doubleValue(),
          decode(r.getSeq[Any](3).map(_.asInstanceOf[Number].intValue()))))
          .sortBy(c => (c._2, c._1))
        val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Float])]
        val rest = scala.collection.mutable.ArrayBuffer(cs: _*)
        while (sel.size < k && rest.nonEmpty) {
          val best = rest.maxBy { c =>
            val sim = if (sel.isEmpty) 0.0 else sel.map(s => cos(c._3, s._3)).max
            (lambda * -c._2 - (1 - lambda) * sim, -c._1.toDouble)
          }
          sel += best
          rest -= best
        }
        sel.zipWithIndex.map { case ((nid, _, _), i) => (qid, i + 1, nid) }
    }
    import spark.implicits._
    // the greedy loop ran on widened longs; cast the id columns back to
    // the POOL's types so the result schema matches topK's exactly
    // (the documented lambda=1 ≡ topK equivalence holds at the schema
    // level for int-id query frames too)
    picked.toSeq.toDF("query_id", "rank", "neighbor_id")
      .select(col("query_id").cast(poolDf.schema("query_id").dataType),
        col("rank"),
        col("neighbor_id").cast(poolDf.schema("neighbor_id").dataType))
  }

  /** Number of cached pools (spec observability). */
  private[graft] def cachedPools: Int = pools.size

  /** Release every cached pool. */
  def close(): Unit = {
    pools.values.foreach(_.unpersist())
    pools.clear()
  }
}

object AnnSession {
  /** Hard cap on rows [[AnnSession.topKDiverse]] may collect to the
    * driver (|queries| × poolSize). ~1M rows of (ids, adc, m codes)
    * is tens of MB — comfortably interactive, far from OOM.
    */
  private[graft] val MaxDiverseRows: Int = 1 << 20

  /** Open a serve session over a materialized index table. */
  def apply(index: DataFrame,
            centroids: Seq[(Int, Array[Float])],
            codebooks: Seq[(Int, Int, Array[Float])],
            m: Int, dsub: Int, nprobe: Int): AnnSession =
    new AnnSession(index, centroids, codebooks, m, dsub, nprobe)
}
