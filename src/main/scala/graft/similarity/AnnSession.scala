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

  /** Number of cached pools (spec observability). */
  private[graft] def cachedPools: Int = pools.size

  /** Release every cached pool. */
  def close(): Unit = {
    pools.values.foreach(_.unpersist())
    pools.clear()
  }
}

object AnnSession {
  /** Open a serve session over a materialized index table. */
  def apply(index: DataFrame,
            centroids: Seq[(Int, Array[Float])],
            codebooks: Seq[(Int, Int, Array[Float])],
            m: Int, dsub: Int, nprobe: Int): AnnSession =
    new AnnSession(index, centroids, codebooks, m, dsub, nprobe)
}
