package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClassifierTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def label = when(
    graft.functions.TextFunctions.langScore(col("text"), "en") >= 2, 1L)
    .otherwise(-1L)

  test("hand example: one round learns the separating signal") {
    import spark.implicits._
    // y = +1 docs say "good", y = −1 docs say "bad"; after round 1
    // (w0 = 0 → every doc misclassified → w = Σ y·x) the bucket of
    // "good" must be positive, of "bad" negative, and the model must
    // separate the training set perfectly (accuracy row = 1000000)
    val docs = Seq(
      (1L, "good stuff here", 1L), (2L, "more good things", 1L),
      (3L, "bad junk there", -1L), (4L, "very bad words", -1L))
      .toDF("doc_id", "text", "y")
    val m = ClassifierTrainer.trainPerceptron(docs, "doc_id", "text",
      col("y"), buckets = 64, rounds = 2)
    val rows = m.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def bucketOf(w: String): Int =
      Seq(w).toDF("t").select(
        (graft.functions.TextFunctions.shingleBaseHash(col("t")) % 64)
          .cast("int")).collect()(0).getInt(0)
    assert(rows(bucketOf("good")) > 0, "the 'good' bucket must go positive")
    assert(rows(bucketOf("bad")) < 0, "the 'bad' bucket must go negative")
    assert(rows(-1) == 1000000L, s"separable set must train to 100%, got ${rows(-1)}")
  }

  test("model is identical across partitionings (integer order-free sums)") {
    val docs = graft.Tables.documents(spark, TestSpark.sf).limit(200)
    val one = ClassifierTrainer.trainPerceptron(
      docs.repartition(1), "doc_id", "text", label, 128, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val many = ClassifierTrainer.trainPerceptron(
      docs.repartition(13), "doc_id", "text", label, 128, 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(one.sameElements(many), "partitioning changed the learned model")
  }

  test("a training round never re-shuffles the doc-keyed feature cache") {
    // reconstructs the exact round shape trainPerceptron runs (keep in
    // lockstep with it): with the cache pre-partitioned by __d, the
    // scoring agg (ClusteredDistribution(__d, y) — satisfied by
    // HashPartitioning(__d)) and the miss join must plan WITHOUT a
    // doc-keyed exchange; the only shuffle a round pays is the D-row
    // bucket update. This is the measured 6.8 s → 4.2 s co-location.
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    val feats = graft.Tables.documents(spark, TestSpark.sf).limit(200)
      .select(lit(1L).as("y"), col("doc_id").as("__d"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .select(col("__d"), col("y"),
        (TextFunctions.shingleBaseHash(col("w")) % 128).cast("int").as("b"))
      .repartition(col("__d"))
      .groupBy(col("__d"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      feats.count()
      val wl = typedLit(Seq.fill(128)(0L))
      val scored = feats.groupBy(col("__d"), col("y"))
        .agg(sum(element_at(wl, col("b") + 1) * col("cnt")).as("s"))
      val miss = scored.filter(col("y") * col("s") <= 0).select(col("__d"))
      val delta = feats.join(miss, "__d")
        .groupBy(col("b")).agg(sum(col("y") * col("cnt")).as("d"))
      // the cached relation PRINTS its own build plan (which rightly
      // contains the one REPARTITION_BY_COL exchange) — strip
      // InMemoryRelation subtrees by indentation before asserting the
      // ROUND itself plans no doc-keyed exchange
      val lines = delta.queryExecution.executedPlan.toString.split("\n")
      def indent(l: String): Int = l.takeWhile(c => !c.isLetter).length
      val kept = new scala.collection.mutable.ArrayBuffer[String]
      var skipBelow = -1
      for (l <- lines) {
        val i = indent(l)
        if (skipBelow >= 0 && i <= skipBelow) skipBelow = -1
        if (skipBelow < 0) {
          if (l.contains("InMemoryRelation")) skipBelow = i
          else kept += l
        }
      }
      val p = kept.mkString("\n")
      assert(!p.contains("hashpartitioning(__d"),
        s"a round re-shuffled the doc-keyed cache:\n${p.take(3000)}")
      assert(p.contains("Exchange hashpartitioning(b#"),
        s"the one expected shuffle (bucket update) is missing:\n${p.take(3000)}")
    } finally feats.unpersist()
  }

  test("t48 gate: the model generalizes to held-out splits") {
    val out = graft.SparkEntry.queries("t48_classifier_eval")(
      spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.keySet == Set("train", "val", "test"))
    // the en-marker signal is split-independent, so a model that only
    // memorized bucket noise would collapse off-train
    assert(out("val") > 600000L && out("test") > 600000L,
      s"held-out accuracy collapsed: $out")
  }

  test("t45 gate: the learned model beats chance on its own signal") {
    val out = graft.SparkEntry.queries("t45_train_classifier")(
      spark, TestSpark.sf).collect()
    assert(out.length == 257, s"expected 256 weights + accuracy, got ${out.length}")
    val acc = out.find(_.getInt(0) == -1).get.getLong(1)
    assert(acc > 600000L,
      s"train accuracy $acc ppm — the en-marker signal is IN the features, " +
        "a perceptron that can't beat 60% on its own training set is broken")
  }
}
