package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.SegmentedTable

/** Measure-both sweep for the broad-DML staging pool: at FIXED data
  * size, how does a DML that rewrites every segment scale with the
  * SEGMENT COUNT, sequential vs pooled staging
  * (`spark.graft.dmlStagingParallelism` 1 vs default)?
  *
  * The r18 verdict named sequential per-segment staging as the one
  * remaining driver-side serialization on the hot DML path: each
  * rewrite is one Spark job, so wall time grows with segment count
  * even when total data is constant. The pool overlaps the jobs; this
  * sweep quantifies it (results → BENCH_NOTES.md).
  *
  * Usage: sbt "runMain graft.bench.DmlStagingSweep [rows] [segCounts…]"
  */
object DmlStagingSweep {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(400000L)
    val segCounts =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(8, 32, 64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- segCounts; par <- Seq("1", "8")) {
      spark.conf.set(SegmentedTable.DmlStagingParallelismKey, par)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_dmlsweep_${n}_$par").resolve("t").toString
      val per = rows / n
      val df = spark.range(rows).select(col("id").as("k"),
        (col("id") % 7).as("m"), concat(lit("v"), col("id")).as("v"))
      val t = SegmentedTable.create(spark, root, df.schema,
        Map("sort_columns" -> "k"))
      (0 until n).foreach(s =>
        t.load(df.filter(col("k") >= s * per && col("k") < (s + 1) * per)))

      // DELETE touching every segment (m uniform across ranges)
      val tDel = time(t.delete(col("m") === 3L))

      // full-sync MERGE: matched update + by-source delete → every
      // live segment rewrites
      val src = spark.range(0, rows, 2).select(col("id").as("sk"),
        concat(lit("s"), col("id")).as("sv"))
      val tMerge = time(t.mergeFull(src, "s", "t", "t.k = s.sk",
        matched = Seq(SegmentedTable.MergeUpdate(None, Seq("v" -> "s.sv"))),
        notMatched = Nil,
        equiKeys = Seq("k" -> "sk"),
        bySource = Seq(SegmentedTable.MergeDelete(None))))

      println(f"[dml-staging] segs=$n%3d par=$par%s delete=$tDel%7.2fs merge=$tMerge%7.2fs")
      graft.util.RunRoot.deleteRecursively(
        java.nio.file.Paths.get(root).getParent)
    }
    spark.stop()
  }
}
