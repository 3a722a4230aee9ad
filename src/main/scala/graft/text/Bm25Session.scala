package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interactive BM25 serve session — the text twin of
  * [[graft.similarity.AnnSession]] (same EDBT 2020 incremental-reuse
  * shape): an analyst iterates on the SAME keyword set, refining k,
  * and each refinement must not redo the postings probe + scoring of
  * the last one.
  *
  * The session pins:
  *  - the materialized postings handle (built once per corpus — the
  *    token-partitioned SegmentedTable t21 serves from);
  *  - the scored CANDIDATE POOL per query-term SET: every doc holding
  *    any query term, with its exact integer-ppm BM25 score, persisted
  *    on first use. `topK(terms, k)` for a larger k over the same term
  *    set is then a re-rank of the cached pool — no postings scan, no
  *    re-scoring — exact at any k (the pool holds EVERY candidate doc
  *    of the term set, so any k is within it; only a CHANGED term set
  *    allocates a fresh pool).
  *
  * Pools are keyed by the normalized term set (sorted, deduped — the
  * pool is per SET, not per spelling order) through BuildOnceKeyed, so
  * racing topK calls build and persist each pool exactly once.
  */
final class Bm25Session(postings: DataFrame) {

  private val pools = new graft.util.BuildOnceKeyed[Seq[String], DataFrame]

  private def pool(terms: Seq[String]): DataFrame = {
    val key = terms.distinct.sorted
    pools.getOrElseUpdate(key, Bm25Session.scoreDocs(postings, key).persist())
  }

  /** Exact top-k for the term set — identical results to a fresh
    * index serve at any k, but repeated/refined calls re-rank the
    * cached pool instead of re-probing the postings.
    */
  def topK(terms: Seq[String], k: Int): DataFrame =
    pool(terms).orderBy(col("score_ppm").desc, col("doc_id").asc).limit(k)

  /** Number of cached pools (spec observability). */
  private[graft] def cachedPools: Int = pools.size

  /** Release every cached pool. */
  def close(): Unit = {
    pools.values.foreach(_.unpersist())
    pools.clear()
  }
}

object Bm25Session {

  /** Open a serve session over a materialized postings table
    * (schema: token, doc_id, tf, dl, df, n_docs, sum_dl — all
    * integers, the t21 index layout).
    */
  def apply(postings: DataFrame): Bm25Session = new Bm25Session(postings)

  /** Per-doc BM25 over the terms' postings — THE scoring kernel,
    * shared verbatim by the t21 gate and the session so the two can
    * never drift. Exact integer ppm (FLOOR(score·1e6 + 0.5)) per term
    * BEFORE the per-doc sum, so summation order is immaterial; the
    * token predicate pushes to the postings scan (token-partitioned
    * layout), so cost is |postings of the terms|, never the corpus.
    */
  def scoreDocs(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val n = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((n - dfd + lit(0.5)) / (dfd + lit(0.5)) + lit(1.0))
    val sat = tfd * lit(2.2) /
      (tfd + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dld / avgdl))
    postings.filter(col("token").isin(terms: _*))
      .withColumn("score_ppm",
        floor(idf * sat * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("score_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
  }
}
