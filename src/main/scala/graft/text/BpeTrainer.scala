package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level BPE merge LEARNING — the canonical tokenizer-training
  * workload (Sennrich et al. 2016): iteratively count adjacent
  * symbol-pair frequencies over the word-frequency dictionary, merge
  * the most frequent pair everywhere, repeat. t05 APPLIES a fixed
  * BPE-ish scheme; this LEARNS the merge table. Reference analogue:
  * the corpus-statistics loop of the reference's dictionary
  * generation (global distinct + frequency accumulation), re-expressed
  * as the standard distributed BPE trainer shape.
  *
  * Determinism contract (what the oracle replays):
  *  - the corpus is tokenized ONCE into a word-count table (the t29
  *    discipline: all marginals from one tokenization);
  *  - words become space-delimited character symbols, padded with one
  *    leading and trailing space (`" h e l l o "`);
  *  - pair counts weight each adjacent symbol pair by the word's
  *    corpus count, counting overlapping occurrences;
  *  - the winning pair each round is (count DESC, left ASC, right
  *    ASC) — byte-order string ties, identical in both engines;
  *  - the merge applies plain non-overlapping left-to-right
  *    string replacement of `" l r "` with `" lr "`, repeated
  *    `replacePasses` times. A single pass misses every second
  *    occurrence of a self-adjacent run (the consumed-delimiter
  *    effect), and each pass at least halves the misses, so 6 passes
  *    are exact for words up to 2^6 pair occurrences — far beyond any
  *    real word. Both the Spark side and the DuckDB oracle run the
  *    SAME pass count, so the semantics are pinned, not approximated.
  *
  * Scale shape: the only corpus-sized stage is the single tokenize +
  * word count (map-side partial, one keyed shuffle). Each of the k
  * rounds is one pair-count aggregation over the VOCAB-sized symbol
  * table (orders of magnitude smaller than the corpus) plus a 1-row
  * argmax collect; the symbol table is re-cached per round (previous
  * round released, the connected-components discipline) so merge
  * re-application never compounds to O(k²). No all-pairs stage, no
  * driver loops over data — only over the k merge decisions.
  *
  * Returns (iter, merge_left, merge_right, pair_count), one row per
  * learned merge, iter 1..k (fewer if the vocabulary exhausts).
  */
object BpeTrainer {

  def learnMerges(docs: DataFrame, textCol: String, k: Int,
                  replacePasses: Int = 6): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
    var cur = wc.cache()
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var i = 1
      var exhausted = false
      while (i <= k && !exhausted) {
        val top = cur
          .withColumn("syms", split(trim(col("sym")), " "))
          .filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(0, size(syms) - 2), " +
              "j -> struct(syms[j] AS l, syms[j + 1] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("pc"))
          .orderBy(col("pc").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        // the argmax materialized `cur`'s cache — only now is the
        // superseded round safe to release (unpersisting before the
        // child materializes would recompute the whole merge chain
        // from scratch each round, the O(k²) this cache exists to
        // prevent); at most two vocab-sized caches ever coexist
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, pc) = (top(0).getString(0), top(0).getString(1),
            top(0).getLong(2))
          merges += ((i, l, r, pc))
          val from = lit(s" $l $r ")
          val to = lit(s" $l$r ")
          val merged = (1 to replacePasses).foldLeft(col("sym"))((c, _) =>
            call_function("replace", c, from, to))
          prev = cur
          cur = cur.select(col("cnt"), merged.as("sym")).cache()
          i += 1
        }
      }
    } finally {
      if (prev != null) prev.unpersist()
      cur.unpersist()
    }
    merges.toSeq.toDF("iter", "merge_left", "merge_right", "pair_count")
  }

  /** APPLY a learned merge table: segment every document with the
    * merges (in learned order, same pinned multi-pass replace
    * semantics as training) and return the per-doc BPE token count —
    * the compression measurement a tokenizer-training loop reads
    * after each vocabulary round. Output: (doc_id, n_words,
    * n_bpe_tokens).
    *
    * Scale shape: the merge table is a driver-side literal (k rows by
    * contract), so the apply is pure in-row string work over the
    * tokenized text — Exchange-free, embarrassingly parallel, the
    * ideal 100 TB map stage. The per-word chain evaluates inside one
    * higher-order transform whose lambda touches only its own
    * element.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)],
                  replacePasses: Int = 6): DataFrame = {
    def chain(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val base = concat(lit(" "), regexp_replace(w, "(.)", "$1 "))
      merges.foldLeft(base) { case (c, (l, r)) =>
        (1 to replacePasses).foldLeft(c)((e, _) =>
          call_function("replace", e, lit(s" $l $r "), lit(s" $l$r ")))
      }
    }
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__w"))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_words"),
        aggregate(
          transform(col("__w"), w => size(split(trim(chain(w)), " "))),
          lit(0), (a, b) => a + b).cast("long").as("n_bpe_tokens"))
  }
}
