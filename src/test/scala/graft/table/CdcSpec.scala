package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Change-data feed ([[SegmentedTable.readChanges]]): the g14 gate
  * proves value-exactness against the DuckDB oracle; this spec pins
  * the lifecycle semantics the gate's single scenario cannot —
  * compaction invisibility on its own, transient segments emitting
  * both events, empty ranges, version validation, and the retention
  * failure mode.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_cdc_$name").resolve("t").toString

  test("appends emit inserts tagged with their commit version") {
    val t = SegmentedTable.create(spark, fresh("append"), docs.schema, Map.empty)
    val v0 = t.currentVersion
    t.load(docs.filter(col("doc_id") < 100))
    val v1 = t.currentVersion
    t.load(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
    val feed = t.readChanges(v0, t.currentVersion)
    assert(feed.filter(col("_change_type") === "delete").count() == 0)
    val byVersion = feed.groupBy(col("_commit_version"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byVersion.keySet == Set(v1, t.currentVersion))
    assert(byVersion.values.sum == docs.filter(col("doc_id") < 200).count())
  }

  test("compaction alone produces an empty feed") {
    val t = SegmentedTable.create(spark, fresh("compact"), docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 100))
    t.load(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
    val before = t.currentVersion
    assert(t.compact().isDefined)
    val feed = t.readChanges(before, t.currentVersion)
    assert(feed.count() == 0)
    // and the feed's schema still carries the change columns
    assert(feed.columns.takeRight(2).toSeq == Seq("_change_type", "_commit_version"))
  }

  test("a segment loaded then deleted inside the range emits both events") {
    val t = SegmentedTable.create(spark, fresh("transient"), docs.schema, Map.empty)
    val v0 = t.currentVersion
    val id = t.load(docs.filter(col("doc_id") < 50))
    t.deleteSegments(Seq(id))
    val feed = t.readChanges(v0, t.currentVersion)
    val n = docs.filter(col("doc_id") < 50).count()
    assert(feed.filter(col("_change_type") === "insert").count() == n)
    assert(feed.filter(col("_change_type") === "delete").count() == n)
  }

  test("row-level DELETE emits file-granularity delete+insert, exact rows") {
    val t = SegmentedTable.create(spark, fresh("dml"), docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 100))
    val v1 = t.currentVersion
    t.delete(col("doc_id") % 10 === 3)
    val feed = t.readChanges(v1, t.currentVersion)
    val deleted = feed.filter(col("_change_type") === "delete")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val inserted = feed.filter(col("_change_type") === "insert")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(deleted == (0L until 100L).toSet)
    assert(inserted == (0L until 100L).filterNot(_ % 10 == 3).toSet)
  }

  test("RESTORE is CDC-visible: revived segments insert, retired ones delete") {
    val t = SegmentedTable.create(spark, fresh("restore"), docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 50))
    val snap = t.currentVersion
    t.load(docs.filter(col("doc_id") >= 50 && col("doc_id") < 80))
    val beforeRestore = t.currentVersion
    t.restoreTo(snap)
    assert(t.read().count() == 50) // rolled back, metadata only
    val feed = t.readChanges(beforeRestore, t.currentVersion)
    // the restore retired the second load's 30 rows; nothing inserted
    // (the first segment never left the live set)
    assert(feed.filter(col("_change_type") === "delete").count() == 30)
    assert(feed.filter(col("_change_type") === "insert").count() == 0)
    // a restore across a DML rewrite also re-INSERTS the revived segment
    t.delete(col("doc_id") % 10 === 1)
    val afterDelete = t.currentVersion
    t.restoreTo(snap)
    val feed2 = t.readChanges(afterDelete, t.currentVersion)
    assert(feed2.filter(col("_change_type") === "insert").count() == 50)
    assert(feed2.filter(col("_change_type") === "delete").count() == 45)
  }

  test("restoring a compaction output is still CDC-visible") {
    // the revived segment was BORN dataChange=false (a compaction
    // output); the restore must stamp it dataChange=true in its own
    // commit or the feed would classify the rollback as a pure
    // reorganization and hide a real content change
    val t = SegmentedTable.create(spark, fresh("restoredc"), docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 30))
    t.load(docs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
    assert(t.compact().isDefined) // live = one dc=false segment
    val snap = t.currentVersion
    t.delete(col("doc_id") % 10 === 4) // rewrites the compacted segment
    val beforeRestore = t.currentVersion
    t.restoreTo(snap)
    assert(t.read().count() == 60)
    val feed = t.readChanges(beforeRestore, t.currentVersion)
    assert(feed.filter(col("_change_type") === "insert").count() == 60,
      "revived compaction output must emit its rows as inserts")
    assert(feed.filter(col("_change_type") === "delete").count() == 54)
  }

  test("same-version range is empty; unknown versions fail loudly") {
    val t = SegmentedTable.create(spark, fresh("edges"), docs.schema, Map.empty)
    t.load(docs.filter(col("doc_id") < 10))
    val v = t.currentVersion
    assert(t.readChanges(v, v).count() == 0)
    val e = intercept[IllegalArgumentException](t.readChanges(v, v + 99))
    assert(e.getMessage.contains("no catalog version"))
  }

  test("a crash that lost the newest log entry heals from status.json") {
    // the commit protocol writes status.json (the commit point) and
    // THEN the history-log entry; simulate a crash between the two by
    // deleting the newest log file — the current version must stay
    // resolvable to the feed, time travel, and SHOW HISTORY, or a
    // streaming source (whose offsets are current versions) would
    // wedge until the next commit
    val root = fresh("crashheal")
    val t = SegmentedTable.create(spark, root, docs.schema, Map.empty)
    val v0 = t.currentVersion
    t.load(docs.filter(col("doc_id") < 40))
    val vN = t.currentVersion
    val lost = java.nio.file.Paths.get(root, "_meta", "log", s"$vN.json")
    assert(java.nio.file.Files.deleteIfExists(lost))
    assert(t.versions.contains(vN))
    assert(t.statusAt(vN).segments.count(_.status == "SUCCESS") == 1)
    assert(t.readAsOf(vN).count() == 40)
    val feed = t.readChanges(v0, vN)
    assert(feed.filter(col("_change_type") === "insert").count() == 40)
    // older versions without a log entry still fail loudly
    val e = intercept[IllegalArgumentException](t.statusAt(vN + 7))
    assert(e.getMessage.contains("no catalog version"))
  }

  test("feed fails loudly when cleanFiles removed a needed segment") {
    val t = SegmentedTable.create(spark, fresh("cleaned"), docs.schema, Map.empty)
    val v0 = t.currentVersion
    val id = t.load(docs.filter(col("doc_id") < 50))
    t.deleteSegments(Seq(id))
    t.cleanFiles() // physically removes the deleted segment's files
    val e = intercept[IllegalArgumentException](
      t.readChanges(v0, t.currentVersion).count())
    assert(e.getMessage.contains("removed by cleanFiles"))
  }
}
