package graft.bench

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of gates to files — the
  * optimization rounds' plan-evidence artifact (plans/rNN/<gate>_
  * <suffix>.txt). Same session shape as [[graft.Bench]] so the plans
  * are the plans the bench times.
  *
  * Usage: runMain graft.bench.ExplainDump <gate[,gate...]> <outDir> <suffix>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <gate[,gate...]> <outDir> <suffix>")
    val names = args(0).split(",").toSeq
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      // streaming pseudo-gates: the st01/st15 optimization lives in
      // the STREAMING aggregation plan (pre-drain), which the gate
      // functions never expose (they return the post-drain batch
      // read) — explain the un-started streaming frame instead
      val df = n match {
        case "st01_streamplan" =>
          graft.streaming.EventStreams.hourlyAgg(
            graft.streaming.EventStreams.eventStream(spark, sfDir))
        case "st15_streamplan" =>
          graft.streaming.EventStreams.slidingAgg(
            graft.streaming.EventStreams.eventStream(spark, sfDir))
        case _ => graft.SparkEntry.queries(n)(spark, sfDir)
      }
      // a streaming frame has no batch physical plan — record its
      // analyzed logical plan (EventTimeWatermark presence/absence is
      // what the streaming pseudo-gates pin)
      val txt =
        if (df.isStreaming) df.queryExecution.analyzed.treeString
        else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      System.err.println(s"[explain] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
