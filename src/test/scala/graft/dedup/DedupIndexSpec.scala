package graft.dedup

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.SegmentedTable

/** The band-signature index behind Dedup.ingestNovel: steady-state
  * deliveries must cost O(index + batch) — no job may rescan the
  * existing DOCUMENT segments — and concurrent duplicate deliveries
  * must net exactly one segment.
  */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(id: Long, text: String) = (id, text)
  private def toDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ≥3 words so every doc carries shingles/bands
  private def text(seed: String): String =
    (1 to 10).map(i => s"${seed}word$i").mkString(" ")

  test("steady-state delivery reads the index, never the document segments") {
    val root = Files.createTempDirectory("graft_bandsidx").resolve("t").toString
    val batch1 = toDocs(Seq(doc(1, text("a")), doc(2, text("b")), doc(3, text("c"))))
    val t = SegmentedTable.create(spark, root, batch1.schema,
      Map("sort_columns" -> "doc_id"))
    assert(Dedup.ingestNovel(t, batch1, "doc_id", "text").contains(0))
    assert(t.read().count() == 3)

    // second delivery: 1 re-delivered id, 4 near-dups doc 2's content
    // (same text, new id), 5 is genuinely novel
    val batch2 = toDocs(Seq(doc(1, text("a")), doc(4, text("b")), doc(5, text("z"))))
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val seg2 =
      try {
        val r = Dedup.ingestNovel(t, batch2, "doc_id", "text")
        org.apache.spark.sql.graftbridge.ColumnExpr.waitForListeners(spark)
        r
      } finally spark.listenerManager.unregister(listener)
    assert(seg2.nonEmpty)
    assert(t.read().count() == 4, "only doc 5 is novel")
    assert(t.read().filter(col("doc_id") === 5L).count() == 1)
    assert(t.read().filter(col("doc_id") === 4L).count() == 0,
      "near-dup content must be dropped by the index semi-join")
    // THE scale contract: no job in the second delivery scanned the
    // main table's document segments (root/segment_N); the index lives
    // at root/_bands/segment_N which does not match this prefix
    import scala.jdk.CollectionConverters._
    val docScans = plans.asScala.filter(_.contains(s"$root/segment_")).toSeq
    assert(docScans.isEmpty,
      s"steady-state ingest rescanned document segments:\n${docScans.headOption.getOrElse("")}")
    assert(plans.asScala.exists(_.contains("_bands")),
      "the delivery must have consulted the band index")
  }

  test("out-of-band load invalidates the marker; rebuild keeps dedup exact") {
    val root = Files.createTempDirectory("graft_bandsrb").resolve("t").toString
    val batch1 = toDocs(Seq(doc(1, text("p")), doc(2, text("q"))))
    val t = SegmentedTable.create(spark, root, batch1.schema, Map.empty)
    assert(Dedup.ingestNovel(t, batch1, "doc_id", "text").nonEmpty)
    // a plain load bypasses index maintenance — the index is now stale
    t.load(toDocs(Seq(doc(7, text("r")))))
    // near-dup of the out-of-band doc 7: only a rebuild can know it
    val r = Dedup.ingestNovel(t, toDocs(Seq(doc(8, text("r")))), "doc_id", "text")
    assert(r.isEmpty, "rebuilt index must carry the out-of-band doc's bands")
    assert(t.read().count() == 3)
    // and the rebuilt index serves the next delivery without doc scans
    assert(Dedup.ingestNovel(t, toDocs(Seq(doc(9, text("s")))), "doc_id", "text").nonEmpty)
    assert(t.read().count() == 4)
  }

  test("concurrent duplicate deliveries net exactly one segment, index consistent") {
    val root = Files.createTempDirectory("graft_bandsconc").resolve("t").toString
    val seed = toDocs(Seq(doc(1, text("m"))))
    val t = SegmentedTable.create(spark, root, seed.schema, Map.empty)
    assert(Dedup.ingestNovel(t, seed, "doc_id", "text").nonEmpty)
    val batch = toDocs((10L to 15L).map(i => doc(i, text(s"n$i"))))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val a = Future(Dedup.ingestNovel(t, batch, "doc_id", "text"))
    val b = Future(Dedup.ingestNovel(t, batch, "doc_id", "text"))
    val results = Seq(Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    pool.shutdown()
    assert(results.count(_.nonEmpty) == 1,
      s"exactly one delivery must land, got $results")
    assert(t.read().count() == 7, "duplicate delivery must not double-insert")
    assert(t.read().select("doc_id").distinct().count() == 7)
    // index covers the final state: the next identical delivery is a no-op
    assert(Dedup.ingestNovel(t, batch, "doc_id", "text").isEmpty)
    val index = SegmentedTable.open(spark, s"$root/_bands")
    val indexedIds = index.read().filter(col("band_idx") === -1)
      .select(col("id")).distinct().count()
    assert(indexedIds == 7, s"index must register every doc id, got $indexedIds")
  }
}
