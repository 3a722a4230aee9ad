package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.SegmentedTable

/** The segmented table as a streaming SINK (writeStream.format
  * ("graft")): per-batch segments, atomic epoch recording
  * (exactly-once under replay), append-only contract, and the
  * round-trip with the streaming source.
  */
class GraftStreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_sink_$name").resolve("t").toString

  /** Stage a df as one single-file parquet batch with a fixed mtime
    * so the file stream source delivers deterministic micro-batches.
    */
  private def stage(dir: java.nio.file.Path, df: org.apache.spark.sql.DataFrame,
      name: String, mtime: Long): Unit = {
    val tmp = dir.resolve(s".tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val l = Files.list(tmp)
      try l.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally l.close()
    }
    Files.move(part, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(dir.resolve(name),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    val walk = Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally walk.close()
  }

  test("writeStream lands one segment per micro-batch, rows exact") {
    val srcDir = Files.createTempDirectory("graft_sink_src")
    val t0 = System.currentTimeMillis() - 120000L
    stage(srcDir, docs.filter(col("doc_id") < 40), "a.parquet", t0)
    stage(srcDir, docs.filter(col("doc_id") >= 40 && col("doc_id") < 90),
      "b.parquet", t0 + 60000L)
    val root = fresh("land")
    SegmentedTable.create(spark, root, docs.schema, Map.empty)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sink_ckpt").toString)
      .start(root)
    try q.processAllAvailable() finally q.stop()
    val t = SegmentedTable.open(spark, root)
    assert(t.showSegments().count(_.status == "SUCCESS") == 2)
    assert(t.read().count() == 90)
    assert(t.status.sinkEpochs.values.max == 1L) // two epochs: 0 and 1
  }

  test("a replayed epoch is skipped atomically (exactly-once, per lineage)") {
    val root = fresh("replay")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 30), "q1", 0L).isDefined)
    // replay of epoch 0 (what Spark does after a crash between the
    // sink commit and the offset-log commit): no new segment
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 30), "q1", 0L).isEmpty)
    assert(t.read().count() == 30)
    // a later epoch lands; an out-of-order stale epoch does not
    assert(t.loadStreamBatch(docs.filter(col("doc_id") >= 30 && col("doc_id") < 50), "q1", 1L).isDefined)
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 10), "q1", 1L).isEmpty)
    assert(t.read().count() == 50)
    // a DIFFERENT query lineage restarts its epochs at 0 and must
    // not be deduped against q1's counter
    assert(t.loadStreamBatch(docs.filter(col("doc_id") >= 50 && col("doc_id") < 55), "q2", 0L).isDefined)
    assert(t.read().count() == 55)
    // plain loads interleave without disturbing the sink epochs
    t.load(docs.filter(col("doc_id") >= 55 && col("doc_id") < 60))
    assert(t.status.sinkEpochs == Map("q1" -> 1L, "q2" -> 0L))
  }

  test("sink requires an existing table and Append mode") {
    val root = fresh("missing")
    val e = intercept[Exception] {
      spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(TestSpark.sf)
        .writeStream.format("graft")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sink_ckpt2").toString)
        .start(root)
    }
    assert(e.getMessage.contains("create the table first"))

    // complete/update modes violate the append-only segment contract
    val root2 = fresh("mode")
    SegmentedTable.create(spark, root2,
      docs.groupBy(col("lang")).count().schema, Map.empty)
    val e2 = intercept[Exception] {
      spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(TestSpark.sf)
        .groupBy(col("lang")).count()
        .writeStream.outputMode("complete").format("graft")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sink_ckpt4").toString)
        .start(root2)
    }
    assert(e2.getMessage.contains("Append output mode only"))
  }

  test("epoch regression fails loudly; clearSinkLineage reopens the path") {
    val root = fresh("regress")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 20), "q", 5L).isDefined)
    // a batch BELOW the recorded epoch = the checkpoint was reset;
    // silent skipping would drop the whole reprocess
    val e = intercept[IllegalStateException](
      t.loadStreamBatch(docs.filter(col("doc_id") < 20), "q", 0L))
    assert(e.getMessage.contains("checkpoint was reset"))
    // the deliberate-reprocess escape hatch
    t.clearSinkLineage("q")
    assert(t.loadStreamBatch(
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 30), "q", 0L).isDefined)
    assert(t.read().count() == 30)
  }

  test("empty micro-batches commit nothing (no zero-row segments)") {
    val root = fresh("emptyb")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 0), "q", 0L).isEmpty)
    assert(t.showSegments().isEmpty)
    assert(t.status.sinkEpochs.isEmpty) // unrecorded: a replay re-lands nothing
    assert(t.loadStreamBatch(docs.filter(col("doc_id") < 10), "q", 0L).isDefined)
    assert(t.read().count() == 10)
  }

  test("a lost newest log entry is backfilled by the next commit") {
    // crash window: status.json flipped to N, log/N.json never written;
    // statusAt heals while N is current, and the NEXT commit must
    // backfill log/N.json or N becomes permanently unresolvable (a
    // streaming reader's committed offset would wedge forever)
    val root = fresh("backfill")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 20))
    val vN = t.currentVersion
    val lost = Paths.get(root, "_meta", "log", s"$vN.json")
    assert(Files.deleteIfExists(lost))
    t.load(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)) // backfills
    assert(Files.exists(lost), "next commit must restore the lost entry")
    assert(t.statusAt(vN).segments.count(_.status == "SUCCESS") == 1)
    assert(t.readChanges(vN, t.currentVersion)
      .filter(col("_change_type") === "insert").count() == 20)
  }

  test("source → sink round-trip: a graft-to-graft streaming pipeline") {
    val upstream = fresh("up")
    val downstream = fresh("down")
    val u = SegmentedTable.create(spark, upstream, docs.schema, Map.empty)
    SegmentedTable.create(spark, downstream, docs.schema, Map.empty)
    u.load(docs.filter(col("doc_id") < 35))
    val q = spark.readStream.format("graft").load(upstream)
      .writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sink_ckpt3").toString)
      .start(downstream)
    try {
      q.processAllAvailable()
      u.load(docs.filter(col("doc_id") >= 35 && col("doc_id") < 70))
      q.processAllAvailable()
      val d = SegmentedTable.open(spark, downstream)
      assert(d.read().count() == 70)
      assert(d.read().select(col("doc_id")).distinct().count() == 70)
    } finally q.stop()
  }
}
