package graft.table

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("concurrent loads both commit (lock serializes the status flip)") {
    val root = Files.createTempDirectory("graft_conc").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, root, n.schema, Map.empty)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val loads = (1 to 4).map(_ => Future(t.load(n)))
    val ids = Await.result(Future.sequence(loads), 120.seconds)
    pool.shutdown()
    assert(ids.toSet.size == 4, s"segment ids must be distinct: $ids")
    assert(t.read().count() == 100)
    assert(t.showSegments().count(_.status == "SUCCESS") == 4)
  }

  test("concurrent loads commit under the lease lock too") {
    val root = Files.createTempDirectory("graft_lease").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, root, n.schema,
      Map("lock.impl" -> "lease"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val loads = (1 to 4).map(_ => Future(t.load(n)))
    val ids = Await.result(Future.sequence(loads), 120.seconds)
    pool.shutdown()
    assert(ids.toSet.size == 4, s"segment ids must be distinct: $ids")
    assert(t.showSegments().count(_.status == "SUCCESS") == 4)
  }

  test("lease lock: mutual exclusion, expiry steal, and owner-only release over a file: URI") {
    val dir = Files.createTempDirectory("graft_leaseunit")
    // explicit file: URI — the lock now speaks Hadoop Paths, the same
    // API an hdfs:// lease would arrive on
    val lockPath = new org.apache.hadoop.fs.Path(s"file:$dir/.lock")
    val lock = new LeaseLock(ttlMs = 60000, pollMs = 5)
    // mutual exclusion: a critical-section counter never interleaves
    @volatile var inside = 0
    @volatile var maxInside = 0
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = (1 to 8).map(_ => Future {
      lock.withExclusive(lockPath) {
        inside += 1
        maxInside = math.max(maxInside, inside)
        Thread.sleep(10)
        inside -= 1
      }
    })
    Await.result(Future.sequence(fs), 60.seconds)
    pool.shutdown()
    assert(maxInside == 1, s"lease lock admitted $maxInside holders at once")

    // a crashed holder's expired lease is stolen, not waited on forever
    val lease = dir.resolve(".lock.lease")
    Files.write(lease,
      s"dead-owner:${System.currentTimeMillis() - 1}".getBytes("UTF-8"))
    var ran = false
    lock.withExclusive(lockPath) { ran = true }
    assert(ran, "expired lease must be stolen")
    assert(!Files.exists(lease), "owned lease must be released")

    // an unexpired foreign lease is respected: acquisition times out
    val strict = new LeaseLock(ttlMs = 60000, pollMs = 5, acquireTimeoutMs = 200)
    Files.write(lease,
      s"live-owner:${System.currentTimeMillis() + 60000}".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      strict.withExclusive(lockPath) { () }
    }
    assert(new String(Files.readAllBytes(lease), "UTF-8")
      .startsWith("live-owner:"), "a live foreign lease must not be deleted")
  }

  test("lease lock excludes writers when the table root is an explicit file: URI") {
    // the DFS-shaped path end to end: table root and lock both carry a
    // scheme, lock.impl defaults to lease by scheme (MetadataLock.forPath)
    val dir = Files.createTempDirectory("graft_leaseuri")
    val root = s"file:$dir/t"
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, root, n.schema,
      Map("lock.impl" -> "lease"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val loads = (1 to 4).map(_ => Future(t.load(n)))
    val ids = Await.result(Future.sequence(loads), 120.seconds)
    pool.shutdown()
    assert(ids.toSet.size == 4, s"segment ids must be distinct: $ids")
    assert(t.read().count() == 100)
    assert(t.showSegments().count(_.status == "SUCCESS") == 4)
  }

  test("a load's distributed write does not block other loads (write outside the lock)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_overlap").resolve("t").toString
    val fast = (1L to 20L).map(k => (k, s"f$k")).toDF("k", "v")
    // ~2s of executor time for the slow load's write: a per-row sleep
    // evaluated during the parquet write of a single-partition input
    val slowFilter = udf((k: Long) => { Thread.sleep(100); true })
    val slow = (100L to 119L).map(k => (k, s"s$k")).toDF("k", "v")
      .repartition(1).filter(slowFilter(col("k")))
    val t = SegmentedTable.create(spark, root, fast.schema, Map.empty)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val slowF = Future { val id = t.load(slow); (id, System.nanoTime()) }
    Thread.sleep(300) // the slow write is now in flight
    val t0 = System.nanoTime()
    val fastId = t.load(fast)
    val fastDone = System.nanoTime()
    val (slowId, slowDone) = Await.result(slowF, 120.seconds)
    pool.shutdown()
    // the fast load must commit DURING the slow load's write — with the
    // old write-inside-the-lock protocol it would queue ≥2s behind it
    assert(fastDone < slowDone,
      "fast load must finish while the slow load's write is still running")
    assert((fastDone - t0) / 1e9 < 1.5,
      s"fast load blocked ${(fastDone - t0) / 1e9}s — write is serializing on the lock")
    assert(Set(fastId, slowId) == Set(0, 1))
    assert(t.read().count() == 40)
  }

  test("concurrent duplicate deliveries through loadUnique net exactly one segment") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dupdeliv").resolve("t").toString
    val batch = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = SegmentedTable.create(spark, root, batch.schema, Map.empty)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // the at-least-once failure mode: the SAME batch delivered twice,
    // concurrently. Both pass the snapshot anti-join (empty table), so
    // only the commit-time re-verification can stop the double insert.
    val a = Future(t.loadUnique(batch, Seq("k")))
    val b = Future(t.loadUnique(batch, Seq("k")))
    val results = Seq(Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    pool.shutdown()
    assert(results.count(_.nonEmpty) == 1,
      s"exactly one delivery must land, got $results")
    assert(t.read().count() == 200, "double delivery must not double-insert")
    assert(t.read().select("k").distinct().count() == 200)
    assert(t.showSegments().count(_.status == "SUCCESS") == 1)
  }

  test("conflicted loadUnique retries lock-free and yields to an interleaved load") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dupretry").resolve("t").toString
    val rows = (1L to 20L).map(k => (k, s"v$k"))
    val fast = rows.toDF("k", "v")
    // A's staged write takes ~2s, giving B time to commit the SAME
    // rows mid-stage: A's commit check must see the moved version,
    // RELEASE the lock, re-verify against the new snapshot, and land
    // None — with the staged dir cleaned up, not double-inserted
    val slowFilter = udf((k: Long) => { Thread.sleep(100); true })
    val slow = rows.toDF("k", "v").repartition(1).filter(slowFilter(col("k")))
    val t = SegmentedTable.create(spark, root, fast.schema, Map.empty)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val a = Future(t.loadUnique(slow, Seq("k")))
    Thread.sleep(400) // A's snapshot is taken and its stage is in flight
    t.load(fast)      // B commits the same rows through a plain load
    val aResult = Await.result(a, 120.seconds)
    pool.shutdown()
    assert(aResult.isEmpty, s"A must detect B's rows on retry, got $aResult")
    assert(t.read().count() == 20, "retry must not double-insert")
    assert(t.showSegments().count(_.status == "SUCCESS") == 1)
    // the abandoned staging dir was cleaned, not leaked
    import scala.jdk.CollectionConverters._
    val listing = Files.list(java.nio.file.Paths.get(root))
    val leftovers =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("loading_")).toList
      finally listing.close()
    assert(leftovers.isEmpty, s"staged dirs leaked: $leftovers")
  }

  test("concurrent disjoint row-deletes both commit, losing nothing else") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dmlc").resolve("t").toString
    val lo = (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
    val hi = (100L to 150L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = SegmentedTable.create(spark, root, lo.schema,
      Map("sort_columns" -> "k"))
    t.load(lo); t.load(hi)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // pruning confines each delete to a different segment, so the
    // commit-time re-verification never sees its inputs retired and
    // both DMLs land; a shared-segment race would abort one instead
    val a = Future(t.delete(col("k") <= 10L))
    val b = Future(t.delete(col("k") >= 140L))
    val (da, db) = (Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    pool.shutdown()
    assert(da == 10 && db == 11)
    assert(t.read().count() == 101 - 21)
    assert(t.read().agg(min(col("k")), max(col("k"))).head() ==
      org.apache.spark.sql.Row(11L, 139L))
  }

  test("paged catalog stays consistent under concurrent commits and reads") {
    // fuzz the manifest fold path: a tiny threshold forces a fold every
    // few commits while 4 writers append and 2 readers snapshot —
    // every snapshot must be a consistent prefix-complete catalog
    // (merged manifest + tail, never a torn list), and the end state
    // must hold every committed segment exactly once
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pagedconc").resolve("t").toString
    val df = (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = SegmentedTable.create(spark, root, df.schema,
      Map("manifest.fold.threshold" -> "3"))
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var readerFailure: Option[String] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 2).map(_ => Future {
      while (!stop.get()) {
        val st = t.status
        // ids unique and statuses well-formed in every snapshot
        val ids = st.segments.map(_.id)
        if (ids.distinct.size != ids.size)
          readerFailure = Some(s"duplicate ids in snapshot: $ids")
        if (st.segments.exists(s => s.id >= st.nextId))
          readerFailure = Some(s"segment id beyond nextId in snapshot")
      }
    })
    val writers = (1 to 4).map(_ => Future { (1 to 5).foreach(_ => t.load(df)) })
    Await.result(Future.sequence(writers), 300.seconds)
    stop.set(true)
    Await.result(Future.sequence(readers), 60.seconds)
    pool.shutdown()
    assert(readerFailure.isEmpty, readerFailure.getOrElse(""))
    assert(t.status.manifest.isDefined, "20 segments over threshold 3 must page")
    assert(t.showSegments().count(_.status == "SUCCESS") == 20)
    assert(t.read().count() == 200)
    // cleanFiles GC keeps the referenced pages intact
    t.cleanFiles()
    assert(t.read().count() == 200)
  }

  test("overwrite is ONE atomic commit: a polling reader never observes an empty or partial table") {
    // the r15 shape was two commits (retire-all, then load): a reader
    // between them — or a crash after the first — saw an EMPTY table,
    // a snapshot state that never logically existed. Now the
    // replacement stages first and a single status commit swaps the
    // live set, so every observable state is either the old table or
    // the new one.
    val root = Files.createTempDirectory("graft_ovw").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, root, n.schema, Map.empty)
    t.load(n) // 100 rows live
    val reader = SegmentedTable.open(spark, root) // independent handle
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val badCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val poll = Future {
      while (!stop.get()) {
        val c = reader.read().count()
        // 100 = pre-overwrite, 25 = post-overwrite; anything else
        // (especially 0) is the torn intermediate the swap forbids
        if (c != 100L && c != 25L) badCounts.add(c)
      }
    }
    val writes = Future {
      (1 to 5).foreach(_ => t.overwrite(n.limit(25)))
    }
    Await.result(writes, 300.seconds)
    stop.set(true)
    Await.result(poll, 60.seconds)
    pool.shutdown()
    assert(badCounts.isEmpty,
      s"reader observed torn overwrite states: ${badCounts}")
    assert(t.read().count() == 25)
    // each overwrite was exactly ONE catalog commit (retire + add
    // fused): create(1) + load(1) + 5 overwrites = version 7
    assert(t.currentVersion == 7L,
      s"overwrite must commit once, version = ${t.currentVersion}")
    // the crash-window check: EVERY committed snapshot in the history
    // from the first load on has at least one live segment — so a
    // crash at ANY instant (the on-disk state is always one of these
    // versions) can never leave the table readable-but-empty
    (2L to t.currentVersion).foreach { v =>
      assert(t.statusAt(v).segments.exists(_.status == SegmentedTable.SUCCESS),
        s"version $v has no live segment — a crash there strands an empty table")
    }
  }

  test("name-map fuzz: concurrent rename/drop/create never leave a name mapped to a missing dir") {
    // r16 verdict: an UNLOCKED rename racing a dropTable could re-write
    // the dropped entry from its pre-drop read — a logical name mapped
    // to a deleted directory, silently shadowing the dir name for
    // future CREATEs. The mutators now share one store-root lock and
    // rename re-verifies source liveness inside it; this fuzz drives
    // the exact interleave 40 rounds × 3 tables and checks the
    // invariant after every round.
    val store = Files.createTempDirectory("graft_namefuzz").toString
    val cat = "fuzzcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$cat.root", store)
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 40).foreach { round =>
      val names = (0 until 3).map(i => s"t${round}_$i")
      names.foreach(n =>
        spark.sql(s"CREATE TABLE $cat.default.$n (k INT) USING graft"))
      // per table: one renamer and one dropper race; either outcome
      // (rename-then-drop of the new name is a no-op drop of the old
      // name; drop-then-rename fails the liveness check) is legal —
      // a DANGLING MAP ENTRY is not
      val ops = names.flatMap { n =>
        Seq(
          Future {
            try spark.sql(
              s"ALTER TABLE $cat.default.$n RENAME TO default.${n}_r")
            catch { case _: Exception => () }
          },
          Future {
            try spark.sql(s"DROP TABLE IF EXISTS $cat.default.$n")
            catch { case _: Exception => () }
          })
      }
      Await.result(Future.sequence(ops), 120.seconds)
      // invariant: every surviving mapping resolves to a live dir
      // (nameMap is private[sql]; the on-disk _names.json IS the map)
      val namesFile = java.nio.file.Paths.get(store, "_names.json")
      val mapped: Map[String, String] =
        if (!java.nio.file.Files.exists(namesFile)) Map.empty
        else org.json4s.jackson.JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(namesFile))) match {
          case org.json4s.JObject(fields) =>
            fields.collect { case (k, org.json4s.JString(v)) => k -> v }.toMap
          case _ => Map.empty
        }
      mapped.foreach { case (name, dir) =>
        assert(SegmentedTable.exists(s"$store/$dir"),
          s"round $round: '$name' maps to missing dir '$dir'")
      }
      // and every listed table actually loads
      spark.sql(s"SHOW TABLES IN $cat.default").collect().map(_.getString(1))
        .foreach(n => spark.table(s"$cat.default.$n").schema)
      // cleanup survivors so the store stays small
      spark.sql(s"SHOW TABLES IN $cat.default").collect().map(_.getString(1))
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $cat.default.$n"))
    }
    pool.shutdown()
  }

  test("partitioned load co-locates keys per file") {
    val root = Files.createTempDirectory("graft_part").resolve("t").toString
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val t = SegmentedTable.create(spark, root, li.schema,
      Map("partition_columns" -> "l_suppkey", "sort_columns" -> "l_orderkey"))
    t.load(li)
    assert(t.read().count() == li.count())
    // each l_suppkey appears in exactly one file
    val filesPerKey = t.read()
      .select(col("l_suppkey"), input_file_name().as("f"))
      .groupBy("l_suppkey")
      .agg(countDistinct("f").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(filesPerKey == 1, s"keys must be co-located, max files/key = $filesPerKey")
  }
}
