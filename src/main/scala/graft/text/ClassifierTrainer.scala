package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINING of the hashed linear quality classifier — the
  * missing half of t33, which APPLIES fixed weights: a batch
  * perceptron over the hashing-trick feature space (Joulin et al.
  * 2017's fastText shape — the model every CCNet/DCLM-style quality
  * filter trains before the corpus-scale apply). Reference analogue:
  * the global-statistics accumulation loop of the reference's
  * dictionary generation (`processing/.../GlobalDictionaryUtil`),
  * re-expressed as iterative keyed aggregation.
  *
  * Determinism contract (what the oracle replays): all integer
  * arithmetic, so every engine and every partitioning produces the
  * identical model —
  *  - feature b(w) = md5-base-hash(w) mod `buckets` (the t33 bucket
  *    function); x_db = COUNT of tokens of doc d in bucket b;
  *  - weights start at zero; round r scores every train doc
  *    s_d = Σ_b w[b]·x_db, and every doc with y_d·s_d <= 0
  *    (misclassified — zero counts as wrong, so round 1 updates on
  *    the whole set) contributes the batch update
  *    w[b] += Σ_misclassified y_d·x_db;
  *  - integer sums are order-free, so partitioning cannot change the
  *    model (spec-pinned).
  *
  * Scale shape (the BpeTrainer loop discipline): the corpus is
  * tokenized ONCE into the (doc, bucket, cnt, y) feature frame — the
  * only corpus-sized stage, one keyed shuffle — and cached. Each
  * round is one in-row scoring pass (the weight vector rides along as
  * a `buckets`-element array LITERAL — no join, no broadcast table)
  * plus one bucket-keyed aggregation whose result is `buckets` rows;
  * the driver only ever collects the D-row update, never data. The
  * trained model then applies with t33's Exchange-free in-row shape.
  *
  * Returns (bucket, weight): the learned weight per bucket 0..D−1,
  * plus one (-1, accuracy_ppm) row — the final TRAIN accuracy of the
  * model (y·s > 0 counts correct) in exact integer ppm.
  */
object ClassifierTrainer {

  def trainPerceptron(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: Column,
                      buckets: Int = 256, rounds: Int = 3): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // the cached frame is PRE-PARTITIONED BY DOC: every round's
    // per-doc scoring aggregation (ClusteredDistribution on (__d, y)
    // — satisfied by HashPartitioning(__d)) and the miss-set join
    // (both sides keyed __d) then run Exchange-free, so a round pays
    // exactly ONE narrow shuffle: the D-row bucket update. Without
    // this, each round re-shuffles the corpus-sized feature frame
    // twice — measured 6.8 s → the co-located form at the sf0.1 gate
    val feats = docs
      .select(labelCol.cast("long").as("y"),
        col(idCol).as("__d"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .select(col("__d"), col("y"),
        (graft.functions.TextFunctions.shingleBaseHash(col("w"))
          % buckets).cast("int").as("b"))
      .repartition(col("__d")) // before the agg: one build shuffle total
      .groupBy(col("__d"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      // force the feature build once; every round reads the cache —
      // and fail by NAME on an empty train split (otherwise the
      // accuracy read below divides by n=0, yields NULL, and
      // surfaces as an opaque NPE)
      require(feats.count() > 0,
        "trainPerceptron: empty training set — no (doc, bucket) features " +
          "were derived from the input frame")
      var w = Array.fill(buckets)(0L)
      def scored(weights: Array[Long]): DataFrame = {
        val wl = typedLit(weights.toSeq)
        feats.groupBy(col("__d"), col("y"))
          .agg(sum(element_at(wl, col("b") + 1) * col("cnt")).as("s"))
      }
      for (_ <- 1 to rounds) {
        val miss = scored(w).filter(col("y") * col("s") <= 0)
          .select(col("__d"))
        val delta = feats.join(miss, "__d")
          .groupBy(col("b")).agg(sum(col("y") * col("cnt")).as("d"))
          .collect() // at most `buckets` rows — model-sized, never data
        delta.foreach(r => w(r.getInt(0)) += r.getLong(1))
      }
      val acc = scored(w)
        .agg(sum(when(col("y") * col("s") > 0, 1L).otherwise(0L)).as("ok"),
          count(lit(1)).as("n"))
        .select(expr("CAST(ok * 1000000 DIV n AS BIGINT)"))
        .collect()(0).getLong(0)
      (w.toSeq.zipWithIndex.map { case (wt, b) => (b, wt) } :+
        (-1, acc))
        .toDF("bucket", "weight")
    } finally feats.unpersist()
  }

  /** Apply a trained model to a corpus and report per-split accuracy
    * — the held-out read every training loop ends with. The model is
    * a D-element LITERAL, so scoring is pure in-row work (one token
    * walk per doc, weight lookup by hash bucket — the t33 apply
    * shape, Exchange-free) followed by one split-keyed aggregation
    * whose result is |splits| rows. Integer arithmetic end to end,
    * so the figures replay bit-exact in any engine.
    */
  def evaluate(docs: DataFrame, textCol: String, labelCol: Column,
               splitCol: Column, weights: Array[Long]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val buckets = weights.length
    val wl = typedLit(weights.toSeq)
    val score = aggregate(
      transform(graft.functions.TextFunctions.tokens(col(textCol)), t =>
        element_at(wl,
          (graft.functions.TextFunctions.shingleBaseHash(t) % buckets)
            .cast("int") + 1)),
      lit(0L), (a, x) => a + x)
    docs
      .select(splitCol.as("split"), labelCol.cast("long").as("y"),
        score.as("s"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") * col("s") > 0, 1L).otherwise(0L)).as("n_correct"))
      .select(col("split"), col("n_docs"), col("n_correct"),
        expr("CAST(n_correct * 1000000 DIV n_docs AS BIGINT)").as("acc_ppm"))
  }
}
