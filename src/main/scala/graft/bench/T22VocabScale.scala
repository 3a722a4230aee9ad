package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t22 vocabulary-scale evidence.
  *
  * At sf0.1 the corpus has 31 distinct tokens, so t22's two-pass
  * shape (Misra-Gries sketch + candidate recount — two scans) loses
  * to a single full-vocabulary groupBy (1.93× in BENCH_DETAIL). The
  * sketch exists for the opposite regime: when the vocabulary is too
  * large to shuffle. This main measures both plans over synthetic
  * corpora with the SAME row count but growing distinct-key counts
  * (Zipf-ish skew: a few heavy keys over a long uniform tail, the
  * real n-gram shape) and prints the crossover; results are recorded
  * in BENCH_NOTES.md. Both plans return the identical exact answer —
  * the candidate filter before the recount's shuffle is the entire
  * difference. Run:
  *   sbt "runMain graft.bench.T22VocabScale"
  */
object T22VocabScale {

  private def materialize(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("t22-vocab-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.MgCandidates.mgCandidates

    def bestOf3(f: => Unit): Double = {
      f
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val rows = 20000000L
    for (vocab <- Seq(100L, 10000L, 1000000L, 10000000L)) {
      // 20% of occurrences concentrate on 4 hot keys (~5% each —
      // comfortably above the 1/30 heavy-hitter threshold; id%5==0
      // rows take id%20 ∈ {0,5,10,15}); the rest spread uniformly
      // over `vocab` tail keys. Token strings are md5-derived so
      // their width (~32 chars) matches real shingle keys.
      val path = s"/tmp/graft_bench/tokens_v$vocab"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
        spark.range(rows)
          .select(md5(concat(lit("tok"),
            when(col("id") % 5 === 0, col("id") % 20)
              .otherwise(col("id") % lit(vocab)).cast("string")))
            .as("token"))
          .write.mode("overwrite").parquet(path)
      }
      val toks = spark.read.parquet(path)

      val groupBySec = bestOf3 {
        val totals = toks.agg(count(lit(1)).as("__total"))
        materialize(
          toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
            .crossJoin(broadcast(totals))
            .filter(col("cnt") * lit(30L) >= col("__total"))
            .select(col("token"), col("cnt")))
      }
      val sketchSec = bestOf3 {
        val cand = toks.agg(mgCandidates(col("token"), 64).as("__cand"),
          count(lit(1)).as("__total"))
        materialize(
          toks.crossJoin(broadcast(cand))
            .filter(array_contains(col("__cand"), col("token")))
            .groupBy(col("token"), col("__total"))
            .agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") * lit(30L) >= col("__total"))
            .select(col("token"), col("cnt")))
      }
      println(f"[t22-scale] rows=$rows vocab=$vocab%8d " +
        f"groupBy=$groupBySec%.3f sketch=$sketchSec%.3f " +
        f"ratio=${sketchSec / groupBySec}%.2f")
    }
    spark.stop()
  }
}
