package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training, SentencePiece-style (Kudo 2018):
  * where BPE GROWS a vocabulary by merging the most frequent pair
  * ([[BpeTrainer]]), the unigram trainer SHRINKS one — seed a
  * too-large vocabulary, then iteratively remove the piece whose
  * removal costs the corpus likelihood the least, re-segmenting after
  * every removal (the EM-prune loop production tokenizers run).
  * Reference analogue: the corpus-statistics loop of the reference's
  * dictionary generation, re-expressed as the prune-direction trainer.
  *
  * Determinism contract (what the oracle replays):
  *  - seed segmentation = the [[BpeTrainer]] contract verbatim: the
  *    word-count dictionary's words as space-delimited symbols with
  *    `seedMerges` learned BPE merges applied (same padding, same
  *    (count DESC, l ASC, r ASC) winner rule, same `replacePasses`
  *    non-overlapping replace semantics) — "seed vocab from the pair
  *    counts";
  *  - piece costs are PURE INTEGER inverse probabilities (no floats
  *    anywhere, sidestepping cross-engine FLOOR(double) edges):
  *    inv(c) = min((T · 10⁶) div (c + 1), 10¹²) where T is the total
  *    symbol-occurrence count this round and the +1 smooths pieces
  *    whose standalone count is zero;
  *  - a multi-char piece's removal loss is
  *    min(c_p, 10⁵) · (Σ_{ch ∈ chars(p)} inv(c_ch) − inv(c_p)):
  *    every occurrence re-segments into single characters (the base
  *    alphabet is never pruned, so the fallback always exists); the
  *    count factor saturates at 10⁵ and the char-sum at 10¹³ purely
  *    to keep the product in long range (|loss| < 2⁶⁰ even for
  *    pathological piece lengths) — a piece frequent enough to hit
  *    the count cap has tiny inv(c_p) and never wins the argmin
  *    anyway, and a >10-char piece saturating the char-sum is
  *    already the most prunable thing in the table;
  *  - the pruned piece each round is (loss ASC, piece ASC) — byte
  *    -order string ties, identical in both engines;
  *  - re-splitting replaces `" p "` with the spaced characters
  *    `" c1 c2 … cn "`, `replacePasses` times (the consumed-delimiter
  *    effect needs the same multi-pass treatment as BPE merges).
  *
  * Scale shape: identical to [[BpeTrainer]] — one corpus-sized
  * tokenize + word count, then every seed round AND every prune round
  * is a keyed aggregation over the VOCAB-sized symbol table plus a
  * 1-row argmin collect; at most two vocab-sized caches coexist. No
  * all-pairs stage; driver loops only over the seedMerges + rounds
  * decisions.
  *
  * Returns (iter, pruned, piece_count, loss): one row per prune
  * round, iter 1..rounds (fewer if the multi-char vocabulary
  * exhausts).
  */
object UnigramTrainer {

  private val InvCap = 1000000000000L   // 10^12, the t18 ppm cap
  private val CntCap = 100000L          // with ChSumCap keeps |loss| < 2^60
  private val ChSumCap = 10000000000000L // 10^13: >10-char pieces saturate

  def prune(docs: DataFrame, textCol: String, seedMerges: Int, rounds: Int,
            replacePasses: Int = 6): DataFrame = {
    require(seedMerges >= 1, s"seedMerges must be positive, got $seedMerges")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._

    // --- seed phase: the BpeTrainer contract, re-applied to the word
    // dictionary so the prune loop starts from the segmented frame
    val merges = BpeTrainer.learnMerges(docs, textCol, seedMerges,
      replacePasses)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wc = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
    val seeded = merges.foldLeft(col("sym")) { case (c, (l, r)) =>
      (1 to replacePasses).foldLeft(c)((c2, _) =>
        call_function("replace", c2, lit(s" $l $r "), lit(s" $l$r ")))
    }

    var cur = wc.select(col("cnt"), seeded.as("sym")).cache()
    var prev: DataFrame = null
    val log = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    try {
      var i = 1
      var exhausted = false
      while (i <= rounds && !exhausted) {
        val counts = cur
          .select(col("cnt"), explode(split(trim(col("sym")), " ")).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
        val tot = counts.agg(sum(col("c")).as("t"))
        val multi = counts.filter(length(col("p")) >= 2)
        // chars(p) joined back against the SAME round's counts — a
        // character fully absorbed into merges has no standalone row,
        // hence the +1 smoothing inside inv()
        val chSum = multi
          .select(col("p"), col("c"), explode(expr(
            "transform(sequence(1, length(p)), i -> substring(p, i, 1))"))
            .as("ch"))
          .join(counts.select(col("p").as("ch"), col("c").as("cc")),
            Seq("ch"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("invc", least(
            expr("(t * 1000000L) div (coalesce(cc, 0L) + 1)"), lit(InvCap)))
          .groupBy(col("p"), col("c"))
          .agg(least(sum(col("invc")), lit(ChSumCap)).as("chsum"))
        val top = chSum
          .crossJoin(broadcast(tot))
          .withColumn("keep", least(
            expr("(t * 1000000L) div (c + 1)"), lit(InvCap)))
          .withColumn("loss",
            least(col("c"), lit(CntCap)) * (col("chsum") - col("keep")))
          .select(col("p"), col("c"), col("loss"))
          .orderBy(col("loss").asc, col("p").asc)
          .limit(1).collect()
        // argmin materialized `cur` — only now release the superseded
        // round (the BpeTrainer cache discipline)
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty) exhausted = true
        else {
          val (p, c, loss) = (top(0).getString(0), top(0).getLong(1),
            top(0).getLong(2))
          log += ((i, p, c, loss))
          val from = lit(s" $p ")
          val to = lit(" " + p.map(ch => s"$ch ").mkString)
          val split = (1 to replacePasses).foldLeft(col("sym"))((c2, _) =>
            call_function("replace", c2, from, to))
          prev = cur
          cur = cur.select(col("cnt"), split.as("sym")).cache()
          i += 1
        }
      }
    } finally {
      if (prev != null) prev.unpersist()
      cur.unpersist()
    }
    log.toSeq.toDF("iter", "pruned", "piece_count", "loss")
  }
}
