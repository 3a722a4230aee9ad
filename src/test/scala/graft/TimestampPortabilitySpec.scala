package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Event-time portability: the engine must accept event data whose
  * `ts` column is EITHER epoch-nano longs (legacy parquet
  * TIMESTAMP(NANOS) surfaces as LongType via `nanosAsLong`) OR a real
  * parquet TIMESTAMP(MICROS) (Spark: TIMESTAMP_NTZ — what real-world
  * writers overwhelmingly emit), and produce identical results through
  * the same pipelines. Reference analogue: storage encoding is an
  * internal detail behind a pluggable generator
  * (core/src/main/java/org/carbondata/core/keygenerator/
  * directdictionary/timestamp/TimeStampDirectDictionaryGenerator.java).
  *
  * Also pins the regeneration contract: the SAME path re-written under
  * a different encoding within one JVM must be re-adapted, never read
  * through a stale cached schema.
  */
class TimestampPortabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** µs-aligned epoch-nano fixture (ns below µs would be truncated by
    * the micros encoding, so alignment keeps the two variants the same
    * instants): 3 users, 40 events spanning several hours.
    */
  private def fixtureNs: DataFrame = {
    val base = 1700000000000000000L // µs-aligned epoch ns
    val rows = (0 until 40).map { i =>
      (i.toLong, (i % 3).toLong,
        base + i.toLong * 7L * 60L * 1000000000L + i.toLong * 1000L, // µs steps
        if (i % 4 == 0) "purchase" else "view", i * 1.5)
    }
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  /** The same instants carried as TIMESTAMP_NTZ (parquet micros). */
  private def fixtureMicros: DataFrame =
    fixtureNs.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))

  /** Write `df` as a single `events.parquet` FILE under a fresh dir
    * (the testdata layout the event readers expect).
    */
  private def stageEvents(df: DataFrame, into: Option[Path] = None): String = {
    val dir = into.getOrElse(Files.createTempDirectory("graft_tsport"))
    val stage = dir.resolve("stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val listing = Files.list(stage)
    val part =
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally listing.close()
    Files.move(part, dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def hourBuckets(ev: DataFrame): Array[(Long, Long)] =
    ev.groupBy(expr("ts div 3600000000000").as("hour_bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("hour_bucket")
      .as[(Long, Long)].collect()

  test("normalizeEventTs yields identical epoch-nanos for long and micros encodings") {
    val dLong = stageEvents(fixtureNs)
    val dMicros = stageEvents(fixtureMicros)
    val evLong = Tables.events(spark, dLong)
    val evMicros = Tables.events(spark, dMicros)
    assert(evLong.schema("ts").dataType == LongType)
    assert(evMicros.schema("ts").dataType == LongType)
    val a = evLong.select("event_id", "ts").orderBy("event_id").collect()
    val b = evMicros.select("event_id", "ts").orderBy("event_id").collect()
    assert(a.sameElements(b))
    assert(hourBuckets(evLong).sameElements(hourBuckets(evMicros)))
    assert(hourBuckets(evLong).nonEmpty)
  }

  test("streaming hourly agg is encoding-independent") {
    val dLong = stageEvents(fixtureNs)
    val dMicros = stageEvents(fixtureMicros)
    def run(d: String): Array[(Long, String, Long, Double)] =
      EventStreams.runToCompletion(spark,
        EventStreams.hourlyAgg(EventStreams.eventStream(spark, d)),
        statePartitions = 2)
        .orderBy("hour_bucket", "event_type")
        .as[(Long, String, Long, Double)].collect()
    val a = run(dLong)
    val b = run(dMicros)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("regenerating the same path under a new encoding re-adapts (no stale schema)") {
    val dir = Files.createTempDirectory("graft_tsport_regen")
    val d = stageEvents(fixtureNs, Some(dir))
    val before = EventStreams.runToCompletion(spark,
      EventStreams.hourlyAgg(EventStreams.eventStream(spark, d)),
      statePartitions = 2)
      .orderBy("hour_bucket", "event_type")
      .as[(Long, String, Long, Double)].collect()
    // the file is regenerated IN PLACE as timestamp-micros — a schema
    // cached per path would now plan `ts div` against TIMESTAMP_NTZ
    stageEvents(fixtureMicros, Some(dir))
    val after = EventStreams.runToCompletion(spark,
      EventStreams.hourlyAgg(EventStreams.eventStream(spark, d)),
      statePartitions = 2)
      .orderBy("hour_bucket", "event_type")
      .as[(Long, String, Long, Double)].collect()
    assert(before.sameElements(after))
    // batch path re-adapts too
    assert(Tables.events(spark, d).schema("ts").dataType == LongType)
  }

  test("TIMESTAMP_NTZ round-trips the segmented store (load → stats → prune → read)") {
    val root = Files.createTempDirectory("graft_tsport_seg").resolve("t").toString
    val df = fixtureMicros // ts: TIMESTAMP_NTZ straight into the store
    val t = graft.table.SegmentedTable.create(spark, root, df.schema,
      Map("sort_columns" -> "ts"))
    t.load(df.filter(col("event_id") < 20))
    t.load(df.filter(col("event_id") >= 20))
    assert(t.showSegments().size == 2)
    val back = t.read()
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(back.count() == 40)
    // value-level equality through the store
    val a = df.select("event_id", "ts").orderBy("event_id").collect()
    val b = back.select("event_id", "ts").orderBy("event_id").collect()
    assert(a.sameElements(b))
    // a ts predicate over the segmented read stays exact
    val cut = df.orderBy("event_id").limit(30)
      .agg(max(col("ts"))).collect()(0).get(0)
    val expected = df.filter(col("ts") <= lit(cut)).count()
    assert(back.filter(col("ts") <= lit(cut)).count() == expected)
    // and the catalog's min/max stats PRUNE on NTZ: the fixture's ts
    // grows with event_id, so the two segments are time-disjoint and a
    // predicate inside the first segment's range must eliminate the
    // second driver-side (the 100 TB time-range scan shape)
    val firstSegMax = df.filter(col("event_id") < 20)
      .agg(max(col("ts"))).collect()(0).get(0)
    assert(t.pruneSegments(col("ts") <= lit(firstSegMax)).size == 1)
    assert(t.scan(col("ts") <= lit(firstSegMax)).count() == 20)
    // mixed-type comparison: an INSTANT literal makes analysis wrap
    // the NTZ column in a widening cast — pruning must strip it (UTC
    // session: order-isomorphic) and still eliminate the segment
    val instant = firstSegMax.asInstanceOf[java.time.LocalDateTime]
      .toInstant(java.time.ZoneOffset.UTC)
    assert(t.pruneSegments(col("ts") <= lit(java.sql.Timestamp.from(instant))).size == 1)
  }
}
