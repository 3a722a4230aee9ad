package graft.bench

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** st01 amortization evidence (r6 VERDICT "Next round" #1).
  *
  * The streaming hourly aggregation pays a fixed micro-batch cost
  * (query planning, offset/WAL commits, state-store open) of a few
  * hundred ms per run that the batch baseline doesn't. That cost is
  * per-TRIGGER, not per-row, so it amortizes with data volume. This
  * main measures streaming-vs-batch for the identical aggregation at
  * 1×, 4×, and 10× the sf0.1 events volume (the corpus staged as N
  * file copies — the multi-file layout a real stream source sees) and
  * prints the ratio at each scale; results are recorded in
  * BENCH_NOTES.md. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.bench.St01Amortization"
  */
object St01Amortization {

  private def materialize(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }

  private def hourly(events: DataFrame): DataFrame =
    EventStreams.hourlyAgg(graft.Tables.normalizeEventTs(events)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000"))))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("st01-amortization")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bestOf3(f: => Unit): Double = {
      f // warm-up
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val src = Paths.get(s"$sfDir/events.parquet")
    for (copies <- Seq(1, 10, 100, 300, 1000)) {
      val dir = Paths.get(s"/tmp/graft_bench/events_x$copies")
      if (!Files.exists(dir.resolve(s"c${copies - 1}.parquet"))) {
        Files.createDirectories(dir)
        (0 until copies).foreach { i =>
          Files.copy(src, dir.resolve(s"c$i.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      val schema = spark.read.parquet(dir.toString).schema

      val batchSec = bestOf3 {
        materialize(hourly(spark.read.parquet(dir.toString)))
      }
      val streamSec = bestOf3 {
        val stream = spark.readStream.schema(schema).parquet(dir.toString)
        materialize(EventStreams.runToCompletion(spark, hourly(stream),
          statePartitions = 4))
      }
      println(f"[st01-amort] copies=$copies%2d batch=$batchSec%.3f " +
        f"stream=$streamSec%.3f ratio=${streamSec / batchSec}%.2f")
    }

    // Same 100×-volume corpus laid out as production-size files (~90 MB
    // instead of 1000 fragmented 2 MB copies): the streaming file source
    // partitions per file, so file size sets its scan-task overhead.
    val bigDir = "/tmp/graft_bench/events_big"
    if (!Files.exists(Paths.get(s"$bigDir/_SUCCESS"))) {
      spark.read.parquet("/tmp/graft_bench/events_x1000")
        .repartition(24).write.mode("overwrite").parquet(bigDir)
    }
    val bigSchema = spark.read.parquet(bigDir).schema
    val batchBig = bestOf3 { materialize(hourly(spark.read.parquet(bigDir))) }
    val streamBig = bestOf3 {
      val stream = spark.readStream.schema(bigSchema).parquet(bigDir)
      materialize(EventStreams.runToCompletion(spark, hourly(stream),
        statePartitions = 4))
    }
    println(f"[st01-amort] bigfiles(100M rows, 24 files) batch=$batchBig%.3f " +
      f"stream=$streamBig%.3f ratio=${streamBig / batchBig}%.2f")
    spark.stop()
  }
}
