package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Streaming-native operators routed through the DuckDB gate: st01
  * genuinely executes a Structured Streaming query (AvailableNow →
  * memory sink) and must produce the identical result to the batch
  * oracle; st02 exercises session windows (gaps-and-islands SQL is the
  * oracle).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st01_stream_hourly" -> ((s, d) => {
      val agg = EventStreams.hourlyAgg(EventStreams.eventStream(s, d))
      EventStreams.runToCompletion(s, agg)
    }),

    "st02_session_window" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = Tables.events(s, d)
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      EventStreams.sessionStats(ev, "30 minutes")
    }),

    // near-realtime ingest through the gate: the stream lands in a
    // segmented table (one segment per micro-batch via the real commit
    // protocol, auto-compacted), and the ORACLE-CHECKED read is over
    // the TABLE — so load atomicity, compaction, and clean must all be
    // exactly row-preserving for the hash to match the source events
    "st03_stream_ingest" -> ((s, d) => {
      val root = s"/tmp/graft_tables/${d.replace('/', '_')}/events_ingest"
      val t = ingested.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
        val schema = {
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          Tables.events(s, d).schema
        }
        val tbl =
          if (graft.table.SegmentedTable.exists(root)) {
            val x = graft.table.SegmentedTable.open(s, root)
            x.deleteSegments(x.showSegments().map(_.id)); x.cleanFiles(); x
          } else graft.table.SegmentedTable.create(s, root, schema, Map.empty)
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .option("maxFilesPerTrigger", "1")
          .parquet(d)
        EventStreams.streamIntoTable(stream, tbl, autoCompactEvery = 2)
          .awaitTermination()
        tbl
      })
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          Tables.dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("users"))
    }),

    // streaming content dedup: documents stream through dropDuplicates
    // on md5(text) (stateful, append mode — not an aggregation); the
    // gated read aggregates ONLY columns that are functions of the
    // dedup key (fp prefix; n_chars == len(text) in this corpus), so
    // the result is arrival-order independent and hash-checkable
    "st04_stream_dedup" -> ((s, d) => {
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val deduped = EventStreams.dedupStream(
        stream.withColumn("fp", md5(col("text"))), "fp")
      val landed = EventStreams.runToCompletion(s, deduped, mode = "append")
      landed
        .groupBy(substring(col("fp"), 1, 1).as("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
    }),

    // streaming dedup with WATERMARK-BOUNDED state — the production
    // form (dropDuplicatesWithinWatermark): state expires by event
    // time, so distinct-key cardinality no longer bounds memory. The
    // event time is a FUNCTION OF THE KEY (n_chars == len(text)), so
    // duplicate texts share one event time — always inside the delay,
    // and whichever arrives first carries identical gated columns.
    // The documented trade (NOT exercised here, proven in
    // StreamingMultimodalSpec): a duplicate arriving after its key's
    // state expired would be re-emitted.
    "st05_stream_dedup_watermark" -> ((s, d) => {
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
        .withColumn("fp", md5(col("text")))
        .withColumn("ts_utc",
          timestamp_micros(col("n_chars").cast("long") * 1000000L))
      val deduped =
        EventStreams.dedupStreamBounded(stream, "fp", "ts_utc", "10 minutes")
      val landed = EventStreams.runToCompletion(s, deduped, mode = "append")
      landed
        .groupBy(substring(col("fp"), 1, 1).as("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
    })
  )

  /** Ingested-table cache: stream-load once per (dataset, session). */
  private val ingested =
    scala.collection.concurrent.TrieMap[String, graft.table.SegmentedTable]()

  val oracles: Map[String, String] = Map(
    // hour_bucket from window.start == epoch-micros div 3600e6 == the
    // q30 bucketing; value sum in exact decimal
    "st01_stream_hourly" ->
      """SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_bucket, event_type,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    // session_window semantics: a new session starts when the gap to
    // the previous event is >= 30 min (strictly-less extends)
    "st02_session_window" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
         marked AS (
           SELECT user_id, tus,
             CASE WHEN LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                    OR tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus)
                       >= 1800000000
                  THEN 1 ELSE 0 END AS brk
           FROM e),
         numbered AS (
           SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
               ROWS UNBOUNDED PRECEDING) AS sess
           FROM marked),
         per_session AS (
           SELECT user_id, sess, COUNT(*) AS n_events
           FROM numbered GROUP BY user_id, sess)
         SELECT user_id, COUNT(*) AS n_sessions,
           MAX(n_events) AS max_session_events
         FROM per_session GROUP BY user_id""",

    // the ingested table must hold exactly the source events
    "st03_stream_ingest" ->
      """SELECT event_type, COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         COUNT(DISTINCT user_id) AS users
         FROM events GROUP BY event_type""",

    // one survivor per distinct text; n_chars is a function of text,
    // so MIN() == the survivor's value whatever arrived first
    "st04_stream_dedup" ->
      """WITH u AS (SELECT md5(text) AS fp, MIN(n_chars) AS nc
                    FROM documents GROUP BY 1)
         SELECT substr(fp, 1, 1) AS bucket, COUNT(*) AS docs,
                CAST(SUM(nc) AS BIGINT) AS chars
         FROM u GROUP BY 1""",

    // same survivors as st04: duplicate texts share one event time
    // (n_chars is a function of text), so every duplicate lands within
    // the watermark delay and exactly one emission survives per key
    "st05_stream_dedup_watermark" ->
      """WITH u AS (SELECT md5(text) AS fp, MIN(n_chars) AS nc
                    FROM documents GROUP BY 1)
         SELECT substr(fp, 1, 1) AS bucket, COUNT(*) AS docs,
                CAST(SUM(nc) AS BIGINT) AS chars
         FROM u GROUP BY 1"""
  )
}
