package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.SegmentedTable

/** The segmented table as a Structured Streaming source
  * (readStream.format("graft")): initial snapshot, incremental
  * segment delivery, compaction invisibility, the append-only
  * contract, and checkpoint-restart resume.
  */
class GraftStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_ss_$name").resolve("t").toString

  private val names = new java.util.concurrent.atomic.AtomicInteger(0)

  test("snapshot first, then only newly committed segments; compaction invisible") {
    val root = fresh("inc")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 50))
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = spark.readStream.format("graft").load(root)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == 50) // initial snapshot
      t.load(docs.filter(col("doc_id") >= 50 && col("doc_id") < 120))
      q.processAllAvailable()
      assert(spark.table(sink).count() == 120) // only the new segment arrived
      assert(t.compact().isDefined)
      q.processAllAvailable()
      assert(spark.table(sink).count() == 120) // compaction re-emits nothing
      t.load(docs.filter(col("doc_id") >= 120 && col("doc_id") < 150))
      q.processAllAvailable()
      assert(spark.table(sink).count() == 150) // and the stream still advances
      // exactly-once per row, not just right counts
      assert(spark.table(sink).select(col("doc_id")).distinct().count() == 150)
    } finally q.stop()
  }

  test("a delete breaks the append-only contract loudly") {
    val root = fresh("del")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 30))
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = spark.readStream.format("graft").load(root)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    try {
      q.processAllAvailable()
      val id = t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
      t.deleteSegments(Seq(id))
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      assert(e.getMessage.contains("append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("append-only")))
    } finally q.stop()
  }

  test("ignoreDeletes streams the inserts and skips the deletes") {
    val root = fresh("igdel")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    val first = t.load(docs.filter(col("doc_id") < 30))
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = spark.readStream.format("graft").option("ignoreDeletes", "true")
      .load(root)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    try {
      q.processAllAvailable()
      t.deleteSegments(Seq(first))
      t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 80))
      q.processAllAvailable()
      // 30 from the snapshot + 50 inserted later; the delete is skipped
      assert(spark.table(sink).count() == 80)
    } finally q.stop()
  }

  test("maxVersionsPerBatch drains a commit burst as bounded batches") {
    val root = fresh("rate")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batches.add(n)
        ()
      }
      .start()
    try {
      q.processAllAvailable() // snapshot: one batch of 10
      // a burst of three commits while the stream runs
      t.load(docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
      t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
      t.load(docs.filter(col("doc_id") >= 60 && col("doc_id") < 100))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batches.asScala.toList
      // the burst drains as one batch per commit, not one giant batch
      assert(sizes == List(10L, 20L, 30L, 40L),
        s"expected per-commit batches, got $sizes")
    } finally q.stop()
  }

  test("AvailableNow drains a rate-limited backlog fully, as bounded batches, then terminates") {
    // the admission-control contract (SupportsTriggerAvailableNow on
    // the V1 source): before r15, the AvailableNowSourceWrapper took
    // ONE capped offset — a rate-limited drain stopped m versions in.
    // Now the prepare call pins the target and latestOffset PAGES to
    // it, so the run must land every pre-start commit in per-commit
    // batches and still terminate on its own.
    val root = fresh("availnow")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_availnow_ckpt").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerBatch", "1").load(root)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = batch.count()
          if (n > 0) batches.add(n)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run must self-terminate")
    }
    drain() // snapshot run establishes the rate-limit mark
    import scala.jdk.CollectionConverters._
    assert(batches.asScala.toList == List(10L))
    batches.clear()
    // a 3-commit backlog accumulates while no query runs — the
    // scheduled-job gap the wrapper-era drain couldn't page through
    t.load(docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
    t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
    t.load(docs.filter(col("doc_id") >= 60 && col("doc_id") < 100))
    drain()
    val sizes = batches.asScala.toList
    assert(sizes == List(20L, 30L, 40L),
      s"expected per-commit paged batches, got $sizes")
  }

  test("starting on an EMPTY table works; rows arrive once the first load commits") {
    val root = fresh("empty")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = spark.readStream.format("graft").load(root)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    try {
      q.processAllAvailable() // empty snapshot batch must not crash
      assert(spark.table(sink).count() == 0)
      t.load(docs.filter(col("doc_id") < 25))
      q.processAllAvailable()
      assert(spark.table(sink).count() == 25)
    } finally q.stop()
  }

  test("maxVersionsPerBatch survives a clean-shutdown restart (persisted mark)") {
    val root = fresh("ratestop")
    val ckpt = Files.createTempDirectory("graft_ss_rate_ckpt").toString
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batches.add(n)
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // clean shutdown, snapshot committed
    // a burst lands while the stream is DOWN
    t.load(docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
    t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
    t.load(docs.filter(col("doc_id") >= 60 && col("doc_id") < 100))
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batches.asScala.toList
      // without the persisted high-water mark the restart would drain
      // the whole backlog as ONE batch of 90
      assert(sizes == List(10L, 20L, 30L, 40L),
        s"expected capped per-commit batches across restart, got $sizes")
    } finally q2.stop()
  }

  test("rate-limit mark persists through an explicit file: URI checkpoint (DFS-shaped)") {
    // r7 ADVICE: the mark used to persist only for LOCAL checkpoint
    // paths — hdfs:/s3a: checkpoints silently lost the cap across
    // restarts. The mark now rides graft.table.TableIO on whatever
    // filesystem the checkpoint names; an explicit scheme exercises
    // exactly the non-stripped path a DFS checkpoint takes.
    val root = fresh("rateuri")
    val ckpt = s"file:${Files.createTempDirectory("graft_ss_rateuri_ckpt")}"
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graft")
      .option("maxVersionsPerBatch", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batches.add(n)
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // the mark landed under the URI checkpoint's sources dir
    val mark = new org.apache.hadoop.fs.Path(s"$ckpt/sources/0/graft_last_offered")
    assert(graft.table.TableIO.exists(mark),
      s"persisted high-water mark missing at $mark")
    // a burst lands while the stream is DOWN
    t.load(docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
    t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batches.asScala.toList
      assert(sizes == List(10L, 20L, 30L),
        s"expected capped per-commit batches across a URI-checkpoint restart, got $sizes")
    } finally q2.stop()
  }

  test("checkpoint restart resumes at the committed version, no re-emission") {
    val root = fresh("ckpt")
    val ckpt = Files.createTempDirectory("graft_ss_ckpt").toString
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 40))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val emitted = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.format("graft").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.select(col("doc_id")).collect().map(_.getLong(0))
        emitted.addAndGet(ids.length)
        ids.foreach(i => seen.add(i))
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(seen.size == 40 && emitted.get == 40)
    t.load(docs.filter(col("doc_id") >= 40 && col("doc_id") < 90))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the restarted query replays nothing: 40 + 50 emissions total
      assert(seen.size == 90, s"expected 90 distinct ids, got ${seen.size}")
      assert(emitted.get == 90, s"expected 90 total emissions, got ${emitted.get}")
    } finally q2.stop()
  }

  test("readChangeFeed streams deletes as data; netting tracks the table") {
    // CDF mode: a row-DELETE mid-stream must arrive as delete events
    // (not fail the stream), compaction must emit nothing, and the
    // netted multiset (insert = +1, delete = −1 per row value) must
    // equal the table's final contents at every quiescent point
    val root = fresh("cdf")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 60))
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(root)
      .writeStream.outputMode("append").format("memory").queryName(sink)
      .start()
    def nettedIds(): Set[Long] = spark.table(sink)
      .withColumn("__delta",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(col("doc_id")).agg(sum(col("__delta")).as("net"))
      .filter(col("net") > 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    try {
      q.processAllAvailable()
      // snapshot arrives as inserts stamped with the snapshot version
      assert(spark.table(sink)
        .filter(col("_change_type") =!= "insert").count() == 0)
      assert(nettedIds() == (0L until 60L).toSet)
      t.load(docs.filter(col("doc_id") >= 60 && col("doc_id") < 100))
      q.processAllAvailable()
      assert(nettedIds() == (0L until 100L).toSet)
      t.delete(col("doc_id") % 10 === 4) // rewrite: deletes + kept inserts
      q.processAllAvailable()
      assert(spark.table(sink)
        .filter(col("_change_type") === "delete").count() > 0,
        "the rewrite must emit delete events")
      assert(nettedIds() == (0L until 100L).filterNot(_ % 10 == 4).toSet)
      val before = spark.table(sink).count()
      assert(t.compact().isDefined)
      q.processAllAvailable()
      assert(spark.table(sink).count() == before,
        "compaction (dataChange=false) must emit nothing into the feed")
      // feed rows carry their commit versions, monotonically grouped
      assert(spark.table(sink).select(col("_commit_version")).distinct()
        .count() >= 3)
    } finally q.stop()
  }

  test("catalog streaming read: readStream.table drains with rate limit + restart semantics intact") {
    // the V2TableWithV1Fallback bridge: a catalog-first-class graft
    // table must also be streamable — readStream.table resolves to
    // the SAME V1 GraftStreamSource as format("graft"), so the
    // per-commit rate cap and the persisted high-water mark carry
    // over unchanged (the st07 drain, spelled catalog-side)
    val name = s"streamcat${names.incrementAndGet()}"
    val root = s"${graft.TestSpark.store}/$name"
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val ckpt = Files.createTempDirectory("graft_cat_ckpt").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream
      .option("maxVersionsPerBatch", "1")
      .table(s"graft.default.$name")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batches.add(n)
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // clean shutdown, snapshot committed
    // a burst lands while the stream is DOWN
    t.load(docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
    t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
    t.load(docs.filter(col("doc_id") >= 60 && col("doc_id") < 100))
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val sizes = batches.asScala.toList
      // rate limit AND restart both preserved through the catalog path
      assert(sizes == List(10L, 20L, 30L, 40L),
        s"expected capped per-commit batches across restart, got $sizes")
    } finally q2.stop()
  }

  test("catalog streaming write: writeStream.toTable lands exactly-once segments end-to-end") {
    // the write half of the fallback, combined with the read half:
    // graft table -> readStream.table -> writeStream.toTable -> graft
    // table, AvailableNow drains, shared checkpoint. Re-running with
    // no new data must land NOTHING (the sink's epoch dedup), and an
    // incremental source commit must arrive as exactly its rows.
    val srcName = s"streamcatsrc${names.incrementAndGet()}"
    val tgtName = s"streamcattgt${names.incrementAndGet()}"
    val src = SegmentedTable.create(spark,
      s"${graft.TestSpark.store}/$srcName", docs.schema, Map.empty)
    SegmentedTable.create(spark,
      s"${graft.TestSpark.store}/$tgtName", docs.schema, Map.empty)
    src.load(docs.filter(col("doc_id") < 40))
    val ckpt = Files.createTempDirectory("graft_cat_sink_ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.table(s"graft.default.$srcName")
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"graft.default.$tgtName")
      assert(q.awaitTermination(120000), "AvailableNow run must self-terminate")
    }
    def tgt = spark.table(s"graft.default.$tgtName")
    drain()
    assert(tgt.count() == 40)
    drain() // nothing new: the replayed epoch must be skipped
    assert(tgt.count() == 40, "an idle re-drain must land nothing")
    src.load(docs.filter(col("doc_id") >= 40 && col("doc_id") < 90))
    drain()
    assert(tgt.count() == 90)
    assert(tgt.select(col("doc_id")).distinct().count() == 90,
      "exactly-once per row through catalog read+write")
  }

  test("streaming a time-travel snapshot refuses loudly") {
    val name = s"streamcatttr${names.incrementAndGet()}"
    val t = SegmentedTable.create(spark,
      s"${graft.TestSpark.store}/$name", docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 5))
    val snap = new graft.sql.GraftCatalogPlugin()
    snap.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val table = snap.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("default"), name),
      "2")
    val e = intercept[IllegalArgumentException] {
      table.asInstanceOf[org.apache.spark.sql.graftbridge.GraftV1FallbackTable].v1Table
    }
    assert(e.getMessage.contains("time-travel"),
      s"snapshot streaming must refuse, got: ${e.getMessage}")
  }

  test("readChangeFeed with a caller-supplied FULL CDF schema does not duplicate columns") {
    // a caller may hand the reader a schema captured from a previous
    // CDF read (already carrying _change_type/_commit_version);
    // sourceSchema must append only what is missing
    val root = fresh("cdfschema")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val fullCdfSchema = docs.schema
      .add("_change_type", org.apache.spark.sql.types.StringType)
      .add("_commit_version", org.apache.spark.sql.types.LongType)
    val stream = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .schema(fullCdfSchema)
      .load(root)
    assert(stream.schema.fieldNames.count(_ == "_change_type") == 1)
    assert(stream.schema.fieldNames.count(_ == "_commit_version") == 1)
    assert(stream.schema == fullCdfSchema)
    // and the stream actually runs with that schema
    val sink = s"graft_ss_mem_${names.incrementAndGet()}"
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == 10)
    } finally q.stop()
  }
}
