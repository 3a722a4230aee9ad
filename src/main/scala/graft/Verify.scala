package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run on a small thread pool (SPARK_GRAFT_VERIFY_THREADS,
  * default 4): Spark job submission is thread-safe, each result lands
  * in its own directory, and the shared fixture builders serialize
  * per key through [[graft.util.BuildOnce]] — so the dump's wall time
  * stops growing linearly with the gate count. An optional third arg
  * restricts the dump to a comma-separated list of query names (dev
  * loop for checking one new gate without paying for all of them).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def dump(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    // Streaming gates drain through EventStreams.runToCompletion,
    // which temporarily mutates SESSION conf (shuffle partitions,
    // no-data micro-batches) with save/restore — a batch gate planned
    // inside that window on another thread would inherit the
    // overrides. They run sequentially AFTER the pool; everything
    // else parallelizes freely.
    val (streaming, batch) = selected.partition(_._1.startsWith("st"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = batch.map { case (name, fn) =>
        pool.submit(new Runnable { def run(): Unit = dump(name, fn) })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    streaming.foreach { case (name, fn) => dump(name, fn) }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
