package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure-both sweep of the remaining PINNED join shapes (the t22
  * discipline: a shape claim in a comment or PlanSpec is only as good
  * as the measurement behind it). Four pins, each measured against
  * its plausible alternative on production-shaped fixtures (20M-row
  * postings with 1M-wide md5 token keys / 20M-row wide CDC feeds /
  * 2M-vector corpora — NOT the tiny sf0.1 gate inputs where any
  * shape wins):
  *
  *  1. t21 postings serve: `token IN (…)` filter pushed to the
  *     parquet scan vs a broadcast join against a 3-row terms frame.
  *  2. t24 bigram AND-chain: one scan + countDistinct == n vs
  *     per-gram postings self-joins.
  *  3. g17 CDC netting: fingerprint group key (4 narrow cols) vs
  *     grouping on the full raw row.
  *  4. s11 shortlist fetch: small-side join (auto-broadcast) vs an
  *     explicit collected-id IN filter before the pairing join.
  *
  * Results → BENCH_NOTES.md. Run:
  *   sbt "runMain graft.bench.JoinShapeSweep"
  */
object JoinShapeSweep {

  private def materialize(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("join-shape-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def bestOf3(f: => Unit): Double = {
      f
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    // ---- fixture 1: postings (doc_id, token, tf), 20M rows, 1M
    // tokens + 4 hot terms (the t21/t24 index shape) ----------------
    val postingsPath = "/tmp/graft_bench/sweep_postings"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$postingsPath/_SUCCESS"))) {
      spark.range(20000000L)
        .select((col("id") % 2000000L).as("doc_id"),
          md5(concat(lit("tok"),
            when(col("id") % 5 === 0, col("id") % 20)
              .otherwise(col("id") % 1000000L).cast("string"))).as("token"),
          (col("id") % 7 + 1).cast("int").as("tf"))
        .write.mode("overwrite").parquet(postingsPath)
    }
    val postings = spark.read.parquet(postingsPath)
    val terms = Seq("tok0", "tok5", "tok10").map(t =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)

    // t21 pin: IN filter pushed to the scan
    val t21Filter = bestOf3 {
      materialize(postings.filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("s")))
    }
    // alternative: broadcast join against the terms frame
    val termsDf = terms.toDF("token")
    val t21Join = bestOf3 {
      materialize(postings.join(broadcast(termsDf), "token")
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("s")))
    }
    println(f"SWEEP t21 IN-pushdown=$t21Filter%.2fs broadcast-join=$t21Join%.2fs")

    // t24 pin: one scan + countDistinct == n
    val g2 = terms.take(2)
    val t24And = bestOf3 {
      materialize(postings.filter(col("token").isin(g2: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("token")).as("ng"))
        .filter(col("ng") === 2))
    }
    // alternative: per-gram self-join
    val t24SelfJoin = bestOf3 {
      val p1 = postings.filter(col("token") === g2(0)).select(col("doc_id")).distinct()
      val p2 = postings.filter(col("token") === g2(1)).select(col("doc_id")).distinct()
      materialize(p1.join(p2, "doc_id"))
    }
    println(f"SWEEP t24 one-scan-AND=$t24And%.2fs per-gram-self-join=$t24SelfJoin%.2fs")

    // ---- fixture 2: wide CDC feed, 20M rows x 10 data cols ---------
    val feedPath = "/tmp/graft_bench/sweep_feed"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$feedPath/_SUCCESS"))) {
      val base = spark.range(10000000L).select(
        Seq(col("id").as("k"), (col("id") % 7).as("flag")) ++
          Seq.tabulate(8)(i =>
            md5(concat(lit(s"c$i"), col("id").cast("string"))).as(s"c$i")): _*)
      // every row inserted; half also deleted then re-inserted → nets
      val feed = base.withColumn("__delta", lit(1L))
        .unionByName(base.filter(col("k") % 2 === 0).withColumn("__delta", lit(-1L)))
        .unionByName(base.filter(col("k") % 2 === 0).withColumn("__delta", lit(1L)))
      feed.write.mode("overwrite").parquet(feedPath)
    }
    val feed = spark.read.parquet(feedPath)
    val dataCols = feed.columns.filterNot(_ == "__delta")

    // g17 pin: fingerprint group key (narrow shuffle)
    val g17Fp = bestOf3 {
      materialize(feed
        .withColumn("__fp", xxhash64(dataCols.map(col): _*))
        .withColumn("__fp2", hash(dataCols.map(col): _*))
        .groupBy(col("__fp"), col("__fp2"), col("flag"), col("k"))
        .agg(sum(col("__delta")).as("n")).filter(col("n") =!= 0L)
        .groupBy(col("flag")).agg(sum(col("n")).as("cnt")))
    }
    // alternative: group on the full raw row
    val g17Raw = bestOf3 {
      materialize(feed
        .groupBy(dataCols.map(col): _*)
        .agg(sum(col("__delta")).as("n")).filter(col("n") =!= 0L)
        .groupBy(col("flag")).agg(sum(col("n")).as("cnt")))
    }
    println(f"SWEEP g17 fingerprint-net=$g17Fp%.2fs raw-row-net=$g17Raw%.2fs")

    // ---- fixture 3: 2M x 64-dim vectors, 50-row shortlist ----------
    val vecPath = "/tmp/graft_bench/sweep_vectors"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$vecPath/_SUCCESS"))) {
      spark.range(2000000L)
        .select(col("id").as("neighbor_id"),
          expr("transform(sequence(1, 64), j -> cast(pmod(id * j, 997) as float))")
            .as("cv"))
        .write.mode("overwrite").parquet(vecPath)
    }
    val vectors = spark.read.parquet(vecPath)
    val shortlist = (0 until 50).map(i =>
      (i.toLong % 5, (i.toLong * 40007L) % 2000000L)).toDF("query_id", "neighbor_id")

    // s11 pin: plain join, small side auto-broadcast
    val s11Join = bestOf3 {
      materialize(shortlist.join(vectors, Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          element_at(col("cv"), 1).as("v0")))
    }
    // alternative: collected-id IN filter, then the pairing join
    val ids = shortlist.select("neighbor_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val s11Filter = bestOf3 {
      materialize(vectors.filter(col("neighbor_id").isin(ids: _*))
        .join(broadcast(shortlist), Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          element_at(col("cv"), 1).as("v0")))
    }
    println(f"SWEEP s11 plain-join=$s11Join%.2fs id-filter-then-join=$s11Filter%.2fs")

    spark.stop()
  }
}
