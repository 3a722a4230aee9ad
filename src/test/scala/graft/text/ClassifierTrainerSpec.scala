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
