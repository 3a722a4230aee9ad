package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.streaming.EventStreams

/** Streaming-native operators routed through the DuckDB gate: st01
  * genuinely executes a Structured Streaming query (AvailableNow →
  * memory sink) and must produce the identical result to the batch
  * oracle; st02 exercises session windows (gaps-and-islands SQL is the
  * oracle).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Staging dir for a gate's per-row drain landing (see
    * [[EventStreams.runToCompletionStaged]] — reset per drain).
    */
  private def landDir(d: String, gate: String): String =
    graft.util.RunRoot.under(s"graft_stream_src/${d.replace('/', '_')}/${gate}_landed")

  val queries: Map[String, Q] = Map(
    "st01_stream_hourly" -> ((s, d) => {
      val agg = EventStreams.hourlyAgg(EventStreams.eventStream(s, d))
      // state cardinality = hours-in-corpus × event types (tiny), so a
      // handful of state-store partitions is the right-sized setting —
      // see runToCompletion's scaling note
      EventStreams.runToCompletion(s, agg, statePartitions = 4)
    }),

    "st15_sliding_window" -> ((s, d) => {
      val agg = EventStreams.slidingAgg(EventStreams.eventStream(s, d))
      // state = in-flight windows × event types — one extra window vs
      // st01 (the overlap factor), still tiny
      EventStreams.runToCompletion(s, agg, statePartitions = 4)
    }),

    "st02_session_window" -> ((s, d) => {
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
      val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_ingest")
      val t = ingested.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
        // table schema = NORMALIZED (ts epoch-ns long); the stream scan
        // needs the raw footer schema, normalized as a projection after
        // (one relation build: the normalized schema derives from it)
        val raw = Tables.rawEvents(s, d)
        val schema = Tables.normalizeEventTs(raw).schema
        val tbl = graft.table.SegmentedTable.fresh(s, root, schema)
        val stream = Tables.normalizeEventTs(s.readStream.schema(raw.schema)
          .option("pathGlobFilter", "events.parquet")
          .option("maxFilesPerTrigger", "1")
          .parquet(d))
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
      // per-row drain → parquet staging (survivors are corpus-scale;
      // the memory sink is for state-bounded aggregates only), with
      // the landing projected to the two columns the gate reads
      val landed = EventStreams.runToCompletionStaged(s,
        deduped.select(col("fp"), col("n_chars")),
        landDir(d, "st04"), eagerEmission = true)
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
      val landed = EventStreams.runToCompletionStaged(s,
        deduped.select(col("fp"), col("n_chars")),
        landDir(d, "st05"), eagerEmission = true)
      landed
        .groupBy(substring(col("fp"), 1, 1).as("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
    }),

    // streaming near-dup-aware ingest: the corpus arrives as TWO
    // deterministic micro-batches (even doc_ids, then odd) and every
    // batch lands through Dedup.ingestNovel — batch 1 is all-novel,
    // batch 2 drops odds sharing a MinHash band with any even. The
    // gated read is over the TABLE, so the band-index consistency,
    // novelty anti-joins, and per-batch dual commits must reconstruct
    // exactly g12's state from a stream instead of one API delivery
    // the segmented table as a STREAMING SOURCE (the downstream half
    // of st03's ingest): events land in a graft table as two loads —
    // the FIRST arrives as the initial snapshot batch, the SECOND
    // commits while the stream is live and arrives as an incremental
    // batch (catalog-version offsets). The stream flows source → graft
    // SINK (append mode, exactly-once epochs), so the landed TABLE
    // must reproduce exactly the source events for the gate's
    // aggregation to hash-match — and the bench's timed runs scan the
    // landed parquet and re-do the same aggregation work as the batch
    // baseline, not a driver-memory-sink or cached-result read
    "st07_table_stream_source" -> ((s, d) => {
      val landed = streamedFromTable.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val ev = Tables.events(s, d)
          val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_stream_src")
          val t = graft.table.SegmentedTable.fresh(s, root, ev.schema)
          t.load(ev.filter(col("event_id") % 2 === 0))
          val landedRoot =
            graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_stream_landed")
          val lt = graft.table.SegmentedTable.fresh(s, landedRoot, ev.schema)
          // fresh checkpoint per run: the landed table was just
          // cleared, so the sink's epoch lineage must restart with it
          val ckpt = java.nio.file.Files
            .createTempDirectory("graft_st07_ckpt").toString
          // incremental-batch drains: one AvailableNow run per phase
          // over a SHARED checkpoint — each run terminates at the
          // version pinned when it starts (the source's admission
          // control), and the next resumes from the committed offset.
          // The production "run the stream as a scheduled job" shape.
          def drain(): Unit = {
            val q = s.readStream.format("graft").load(root)
              .writeStream.outputMode("append").format("graft")
              .option("path", landedRoot)
              .option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          drain() // initial snapshot: the even half
          t.load(ev.filter(col("event_id") % 2 === 1))
          drain() // incremental: the odd half's segment
          lt.read()
        })
      landed
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // the st07 round trip spelled ENTIRELY catalog-side: the source
    // table streams out via `readStream.table("<cat>.default.ev_src")`
    // and lands via `writeStream.toTable(...)` — the
    // V2TableWithV1Fallback bridge resolving BOTH identifiers to the
    // same V1 graft stream source/sink the path spelling uses, so
    // catalog-version offsets, AvailableNow admission and exactly-once
    // sink epochs must all survive the catalog indirection for the
    // landed table to reproduce the events. The catalog registers at
    // RUNTIME with its own `root` option (the per-catalog store), so
    // the gate never mutates the session-wide spark.graft.store.
    "st22_catalog_stream" -> ((s, d) => {
      val landed = catalogStreamed.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val cat = s"gstream${(d + s.sparkContext.applicationId).hashCode.abs}"
          val root = graft.util.RunRoot.under(
            s"graft_catalog_stream/${d.replace('/', '_')}")
          s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalogPlugin")
          s.conf.set(s"spark.sql.catalog.$cat.root", root)
          val ev = Tables.events(s, d)
          val src = graft.table.SegmentedTable.fresh(s, s"$root/ev_src", ev.schema)
          graft.table.SegmentedTable.fresh(s, s"$root/ev_landed", ev.schema)
          val ckpt = java.nio.file.Files
            .createTempDirectory("graft_st22_ckpt").toString
          def drain(): Unit = {
            val q = s.readStream.table(s"$cat.default.ev_src")
              .writeStream.format("graft")
              .option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .toTable(s"$cat.default.ev_landed")
            q.awaitTermination()
          }
          src.load(ev.filter(col("event_id") % 2 === 0))
          drain() // initial snapshot: the even half
          src.load(ev.filter(col("event_id") % 2 === 1))
          drain() // incremental: the odd half's segment
          s.table(s"$cat.default.ev_landed")
        })
      landed
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // STREAM-STATIC JOIN through the table source: error events
    // stream out of the graft table and join (stateless, broadcast)
    // a static per-user spend profile computed from the batch side —
    // the enrichment shape every streaming pipeline needs. The landed
    // rows are gated against the equivalent batch join, so the
    // streamed join must lose/duplicate nothing. Scale: the static
    // side broadcasts once; stream batches join map-side with no
    // shuffle and no state store.
    "st08_stream_static_join" -> ((s, d) => {
      val landed = streamStaticJoined.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val ev = Tables.events(s, d)
          val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_stream_join")
          val t = graft.table.SegmentedTable.fresh(s, root, ev.schema)
          t.load(ev)
          val spend = ev.filter(col("event_type") === "purchase")
            .groupBy(col("user_id"))
            .agg(Tables.dsum(col("value")).as("spend"))
          val joined = s.readStream.format("graft").load(root)
            .filter(col("event_type") === "error")
            .join(broadcast(spend), "user_id")
            .filter(col("spend") > 600.0)
          // per-row join output lands via the staged drain, NARROW
          // (the two gated columns) — a stream-static join's output is
          // corpus-fraction-scale, so the memory sink is off-limits
          // (the r13 audit discipline). AvailableNow drain: the graft
          // source implements admission control (r15).
          val f = EventStreams.runToCompletionStaged(s,
            joined.select(col("user_id"), col("spend")),
            landDir(d, "st08"), eagerEmission = true).persist()
          f.count()
          f
        })
      landed.groupBy(col("user_id"))
        .agg(count(lit(1)).as("errors"), max(col("spend")).as("spend"))
    }),

    // the streaming SINK half (writeStream.format("graft")): events
    // stream through the sink into a segmented table — one segment
    // per micro-batch, the batch epoch recorded in the same atomic
    // catalog commit (exactly-once under replay, spec-pinned) — and
    // the gated read is over the TABLE, so the sink's commit protocol
    // must be exactly row-preserving
    "st09_sink_ingest" -> ((s, d) => {
      val t = sinkIngested.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val raw = Tables.rawEvents(s, d)
          val schema = Tables.normalizeEventTs(raw).schema
          val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_sink")
          val tbl = graft.table.SegmentedTable.fresh(s, root, schema)
          val ckpt = java.nio.file.Files
            .createTempDirectory("graft_st09_ckpt").toString
          val q = Tables.normalizeEventTs(s.readStream.schema(raw.schema)
            .option("pathGlobFilter", "events.parquet").parquet(d))
            .writeStream.format("graft")
            .option("checkpointLocation", ckpt)
            .start(root)
          try q.processAllAvailable() finally q.stop()
          tbl
        })
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          Tables.dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("users"))
    }),

    "st06_stream_neardup_ingest" -> ((s, d) => {
      val t = nearIngested.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
        val docs = Tables.documents(s, d)
        val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/documents_stream_near")
        val tbl = graft.table.SegmentedTable.fresh(s, root, docs.schema,
          Map("sort_columns" -> "doc_id"))
        val src = stageTwoBatchSource(s, d, docs, "neardup", "doc_id")
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
        EventStreams.streamIntoTableNovel(stream, tbl, "doc_id", "text")
          .awaitTermination()
        tbl
      })
      t.read()
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // streaming ingest with MV AUTO-REFRESH on commit (st09's sink +
    // q40's aggregate table, composed end-to-end): events arrive as
    // two ordered micro-batches through the graft SINK into a
    // refresh_on_commit table whose MV was registered while the table
    // was EMPTY — each sink epoch's commit must fold its delta into
    // the rollup incrementally. The gate reads the ROLLUP PARQUET
    // directly, never the rewrite path (which would silently fall
    // back to a base scan on a stale MV and mask a broken refresh):
    // the materialized partials themselves must equal the full
    // aggregate of every event that streamed through. Float
    // discipline: integer SUM (user_id) + MIN/MAX only — q40's
    // order-independent measure set.
    "st10_stream_mv_refresh" -> ((s, d) => {
      val rollup = streamMvRollup.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val ev = Tables.events(s, d)
          val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_stream_mv")
          graft.table.SegmentedTable.fresh(s, root, ev.schema,
            Map("refresh_on_commit" -> "true"))
          val mvName = s"events_stream_mv_${math.abs(d.hashCode)}"
          graft.mv.AggTables.create(s, mvName, root, Seq("event_type"),
            Seq(("sum", "user_id"), ("min", "value"), ("max", "value")))
          val src = stageTwoBatchSource(s, d, ev, "mv_events", "event_id")
          val ckpt = java.nio.file.Files
            .createTempDirectory("graft_st10_ckpt").toString
          val q = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .writeStream.format("graft")
            .option("checkpointLocation", ckpt)
            .start(root)
          try q.processAllAvailable() finally q.stop()
          val meta = graft.mv.AggTables.registered(s)
            .find(_.name == mvName)
            .getOrElse(sys.error(s"MV $mvName vanished from the catalog"))
          s.read.parquet(meta.mvPath)
        })
      rollup.select(col("event_type"), col("sum_user_id"),
        col("min_value"), col("max_value"), col("cnt_rows"))
    }),

    // CUSTOM-STATE streaming operator (flatMapGroupsWithState — the
    // KeyValueGroupedDataset surface the windowed built-ins can't
    // express): per-user running-mean anomaly detection, state =
    // (count, sum) per key, bounded and tiny. Values are floored to
    // integer cents BEFORE streaming so the running sums are exact in
    // double on both engines and the 3×-mean boundary can never flip
    // on summation order; (user_id, ts) is collision-free in this
    // corpus, so the per-group ts sort makes emission deterministic.
    // The oracle replays the state machine as a prefix-window scan.
    "st14_custom_state_anomaly" -> ((s, d) => {
      val raw = Tables.rawEvents(s, d)
      val stream = Tables.normalizeEventTs(s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))
        .withColumn("value", floor(col("value") * 100).cast("double"))
      val anomalies = EventStreams.runningMeanAnomalies(stream, 3.0)
      val landed = EventStreams.runToCompletionStaged(s,
        anomalies.select(col("user_id"), col("ts_ns"), col("value")),
        landDir(d, "st14"), eagerEmission = true)
      // DuckDB reads TIMESTAMP(NANOS) at µs resolution — emit µs on
      // both engines (the ns tail is sub-oracle-visible)
      landed.select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("value"))
    }),

    // STREAMING FUNNEL (flatMapGroupsWithState) — e06's strict
    // first-occurrence view→click→purchase conversion, incrementally:
    // per-user state is three scalars (first view ts, first
    // qualifying click ts, converted flag), bounded forever with no
    // watermark, and each stage hit emits exactly once per user
    // across any micro-batch split. The landed hits aggregate to the
    // SAME stage table as the batch operator, so the oracle is e06's.
    // STREAMING PII SCRUB — the release-side redaction stage applied
    // IN-FLIGHT: documents stream in, spans (planted on the t44
    // schedule — the corpus carries no real PII) are detected and
    // clipped per micro-batch as pure in-row work (the scrub adds NO
    // state — the one streaming stage that is free at any scale), the
    // scrubbed narrow rows land via the staged drain, and the gate
    // aggregates residue-free totals per shard. The t44 oracle
    // machinery replays the same regexes batch-side.
    "st17_stream_redact" -> ((s, d) => {
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val planted = PipelineQueries.plantPii(stream)
      val scrubbed = planted.select(col("doc_id"),
        TextFunctions.piiCount(col("text"), TextFunctions.EmailPattern)
          .as("ne"),
        TextFunctions.piiCount(col("text"), TextFunctions.PhonePattern)
          .as("np"),
        TextFunctions.piiCount(col("text"), TextFunctions.Ipv4Pattern)
          .as("ni"),
        length(TextFunctions.redactPii(col("text"))).cast("long")
          .as("red_len"))
      val landed = EventStreams.runToCompletionStaged(s, scrubbed,
        landDir(d, "st17"), eagerEmission = true)
      landed.groupBy((col("doc_id") % 10).as("shard"))
        .agg(count(lit(1)).as("docs"), sum(col("ne")).as("tot_emails"),
          sum(col("np")).as("tot_phones"), sum(col("ni")).as("tot_ips"),
          sum(col("red_len")).as("red_chars"))
    }),

    // STREAMING CHUNKING — the retrieval-unit stage in-flight:
    // documents stream in and each micro-batch explodes into its
    // 64/48 token-window chunks (pure in-row work — like the scrub,
    // the stage carries NO state at any scale), the narrow chunk rows
    // land via the staged drain, and the gate folds per-shard chunk
    // counts, token totals, and distinct fingerprints. The oracle
    // replays the t50 window rule batch-side, so the streamed
    // tokenize → window → fingerprint must match the batch path
    // exactly across any micro-batch split.
    "st19_stream_chunks" -> ((s, d) => {
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val chunks = graft.text.Chunker.chunk(stream, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("chunk_h"))
      val landed = EventStreams.runToCompletionStaged(s, chunks,
        landDir(d, "st19"), eagerEmission = true)
      landed.groupBy((col("doc_id") % 10).as("shard"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("tot_tokens"),
          countDistinct(col("chunk_h")).as("distinct_chunks"))
    }),

    // STREAMING IMAGE FINGERPRINTING — the multimodal family's
    // streaming leg: documents stream in, each micro-batch
    // synthesizes its real PNGs and dHashes the decoded rasters
    // (both stages are stateless mapPartitions at the JVM codec
    // boundary — streaming-legal, no state), and the landed
    // fingerprints aggregate to per-band-prefix counts. The oracle
    // replays the m11 hash rule batch-side, so the stream must
    // decode byte-identically to the batch path.
    "st18_stream_phash" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val hashes = Multimodal.perceptualHashes(
        Multimodal.withPngPayload(stream, "doc_id", "text", "n_chars"))
        .toDF()
        .select(col("id"), col("dh_hi"), col("dh_lo"))
      val landed = EventStreams.runToCompletionStaged(s, hashes,
        landDir(d, "st18"), eagerEmission = true)
      landed
        .groupBy(shiftright(col("dh_hi"), 24).as("band"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("dh_lo")).as("lo_sum"),
          countDistinct(col("dh_hi"), col("dh_lo")).as("distinct_hashes"))
    }),

    // STREAMING AUDIO FINGERPRINTING — the audio twin of st18: each
    // micro-batch synthesizes its real WAVs and envelope-hashes the
    // decoded PCM (both stages stateless mapPartitions at the JVM
    // codec boundary — streaming-legal, no state), and the landed
    // fingerprints aggregate per band prefix. The oracle replays the
    // m12 hash rule batch-side, so the streamed decode must be
    // byte-identical to the batch path across any micro-batch split.
    "st20_stream_audio_fp" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val fps = Multimodal.audioFingerprints(
        Multimodal.withWavPayload(stream, "doc_id", "text", "n_chars"))
        .toDF()
        .select(col("id"), col("af_hi"), col("af_lo"))
      val landed = EventStreams.runToCompletionStaged(s, fps,
        landDir(d, "st20"), eagerEmission = true)
      landed
        .groupBy(shiftright(col("af_hi"), 24).as("band"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("af_lo")).as("lo_sum"),
          countDistinct(col("af_hi"), col("af_lo")).as("distinct_hashes"))
    }),

    // streaming MP4 metadata (the m14 operator in-flight — the
    // container twin of st18/st20): per micro-batch each doc becomes
    // a real ISO-BMFF container and the genuine box walk runs as
    // stateless mapPartitions at the codec boundary; narrow parsed
    // rows land through the staged drain. The batch m14 oracle forces
    // the streamed synth→walk byte-identical across any split.
    "st21_stream_mp4" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val schema = Tables.documents(s, d).schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val metas = Multimodal.mp4Metadata(
        Multimodal.withMp4Payload(stream, "doc_id", "text", "n_chars"))
        .toDF()
        .select(col("id"), col("timescale"), col("duration_ms"),
          col("mdat_bytes"))
      val landed = EventStreams.runToCompletionStaged(s, metas,
        landDir(d, "st21"), eagerEmission = true)
      landed.groupBy(col("timescale"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("duration_ms")).as("ms_sum"),
          sum(col("mdat_bytes")).as("bytes_sum"))
    }),

    "st16_stream_funnel" -> ((s, d) => {
      val raw = Tables.rawEvents(s, d)
      val stream = s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val hits = EventStreams.funnelStages(stream, "view", "click", "purchase")
      val landed = EventStreams.runToCompletionStaged(s, hits,
        landDir(d, "st16"), eagerEmission = true)
      val counts = landed.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      // the batch twin (e06) and the oracle ALWAYS emit 3 rows — a
      // stage no user reached reports n_users = 0, it doesn't vanish.
      // Landed hits only carry reached stages, so left-join the counts
      // onto a literal 3-row stage frame; tot rides the joined frame
      // (stage-1's coalesced count), so a zero-view corpus yields
      // (0, 0, 0) counts with NULL conv_ppm on both engines (Spark
      // DIV 0 and DuckDB // 0 are both NULL) instead of zero rows.
      val stages = s.range(1, 4).select(col("id").cast("int").as("stage"),
        when(col("id") === 1, "view").when(col("id") === 2, "click")
          .otherwise("purchase").as("step"))
      val full = stages.join(counts, Seq("stage"), "left")
        .select(col("stage"), col("step"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
      val tot = full.filter(col("stage") === 1)
        .select(col("n_users").as("tot"))
      full.crossJoin(broadcast(tot))
        .select(col("stage"), col("step"), col("n_users"),
          expr("CAST(n_users * 1000000 DIV tot AS BIGINT)").as("conv_ppm"))
    }),

    // STREAMING UPSERT (foreachBatch + MERGE — the canonical Spark
    // recipe for update-mode sinks over an append-only segment
    // store): events arrive as two ordered micro-batches and the
    // graft table maintains ONE row per user — the latest by
    // (ts, event_id) — through g09's merge machinery. Latest-wins is
    // enforced ACROSS batches: each batch reduces itself, pulls the
    // incumbents for just its keys (one key-pruned semi-join — at
    // 100 TB the merge only ever touches segments whose key envelope
    // overlaps the batch), re-reduces, and merges the winners, so a
    // stale row arriving late can never overwrite a newer incumbent.
    // The gate reads the TABLE: the final per-user rows must equal
    // the oracle's global argmax, whatever the batch split was.
    "st13_stream_upsert" -> ((s, d) => {
      val t = upserted.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
        val ev = Tables.events(s, d)
        val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/events_upsert")
        val tbl = graft.table.SegmentedTable.fresh(s, root, ev.schema,
          Map("sort_columns" -> "user_id"))
        val src = stageTwoBatchSource(s, d, ev, "upsert", "event_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        def latest(df: DataFrame): DataFrame =
          df.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val incoming = latest(batch)
            val keys = incoming.select(col("user_id")).distinct()
            val incumbents =
              tbl.read().join(keys, Seq("user_id"), "left_semi")
            tbl.merge(latest(incoming.unionByName(incumbents)),
              Seq("user_id"))
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        tbl
      })
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("users"),
          Tables.dsum(col("value")).as("total_value"))
    }),

    // STREAM-STREAM interval join (the two-live-sides upgrade of
    // st08's stream-static join): errors and purchases arrive as two
    // live streams over the same event feed, watermarked on both
    // sides, inner-joined per user under a one-hour time-range
    // condition — q44's correlation computed by the streaming state
    // machine instead of a batch bucket join. Matched pairs land in
    // append mode as they meet (inner-join emission needs no
    // watermark finalization; the watermarks bound STATE, which is
    // what survives 100 TB: each side keeps only rows newer than the
    // other side's watermark minus the range, never the whole
    // stream). The gate aggregates the landed pairs and must equal
    // the batch oracle exactly. Timestamps are µs-floored on BOTH
    // engines (ts div 1000) so the range boundary can't flip on a
    // sub-µs component.
    "st12_stream_stream_join" -> ((s, d) => {
      val rawSchema = Tables.rawEvents(s, d).schema
      def side = Tables.normalizeEventTs(s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))
        .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      val err = side.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
          col("ts_utc").as("e_ts"))
        .withWatermark("e_ts", "2 hours")
      val pur = side.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_utc").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val pairs = err.join(pur,
        col("e_user") === col("p_user") &&
          col("p_ts") > col("e_ts") - expr("INTERVAL 1 HOUR") &&
          col("p_ts") <= col("e_ts"))
        .select(col("e_user").as("user_id"), col("err_id"))
      val landed = EventStreams.runToCompletionStaged(s, pairs,
        landDir(d, "st12"), statePartitions = 8,
        eagerEmission = true)
      landed.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("err_id")).as("errors_with_purchase"))
    }),

    // STREAMING change-data-feed (g17's batch apply, live): the
    // source runs with readChangeFeed=true while the table takes
    // real DML under it — load evens (snapshot), load odds,
    // row-DELETE (a rewrite: whole-segment deletes + kept-row
    // inserts), compact (dataChange=false: must emit NOTHING) —
    // and the replica nets the landed feed (insert = +1, delete =
    // −1 per row value). The netted multiset must equal the
    // table's final contents: the CDC events crossing the stream
    // must be exactly the commit log's, in consumable form. Scale:
    // each micro-batch scans only the changed segments; the apply
    // is one keyed shuffle on the row value.
    "st11_stream_cdc_apply" -> ((s, d) => {
      val feed = streamCdcFeed.getOrElseUpdate(
        s"$d|${s.sparkContext.applicationId}", {
          val li = Tables.lineitem(s, d)
          val root = graft.util.RunRoot.under(s"graft_tables/${d.replace('/', '_')}/lineitem_cdc_stream")
          val t = graft.table.SegmentedTable.fresh(s, root, li.schema,
            Map("sort_columns" -> "l_orderkey"))
          t.load(li.filter(col("l_orderkey") % 2 === 0))
          // land the feed through foreachBatch into a parquet staging
          // dir as the NARROW netting projection (delta + two row
          // fingerprints + the consumed columns) — NEVER a memory
          // sink: a CDC feed is corpus-scale, and collecting it to
          // the driver is exactly the anti-pattern the r13 sf1
          // scaling run caught (memory-sink form OOM'd the driver at
          // 6M lineitem rows). Each micro-batch writes its own
          // files; the driver holds nothing.
          val stage = java.nio.file.Paths.get(
            graft.util.RunRoot.under(s"graft_stream_src/${d.replace('/', '_')}/cdc_feed_stage"))
          if (java.nio.file.Files.exists(stage)) {
            val walk = java.nio.file.Files.walk(stage)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.delete(f))
            finally walk.close()
          }
          val dataCols = li.columns
          // phase drains: one AvailableNow run per DML step over a
          // shared checkpoint — batchIds continue across restarts, so
          // the batchId-subdir idempotent landing carries over
          // unchanged (a retried micro-batch replaces its own landing
          // instead of double-appending the feed)
          val ckpt = java.nio.file.Files
            .createTempDirectory("graft_st11_ckpt").toString
          def drain(): Unit = {
            val q = s.readStream.format("graft")
              .option("readChangeFeed", "true").load(root)
              .writeStream.outputMode("append")
              .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
                b.withColumn("__delta",
                      when(col("_change_type") === "insert", 1L)
                        .otherwise(-1L))
                    .withColumn("__fp", xxhash64(dataCols.map(col): _*))
                    .withColumn("__fp2", hash(dataCols.map(col): _*))
                    .select(col("__delta"), col("__fp"), col("__fp2"),
                      col("l_returnflag"), col("l_orderkey"))
                    .write.mode("overwrite").parquet(s"$stage/batch-$batchId")
              }
              .option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          drain() // snapshot: evens as inserts
          t.load(li.filter(col("l_orderkey") % 2 === 1 &&
            col("l_orderkey") % 10 =!= 3))
          drain() // incremental inserts
          t.delete(col("l_orderkey") % 10 === 7)
          drain() // rewrite: deletes + kept inserts
          t.compact()
          drain() // dataChange=false: nothing
          // pin the staged narrow feed once per session so every
          // timed apply nets in parallel without re-listing files
          val f = s.read.option("recursiveFileLookup", "true")
            .parquet(stage.toString).persist()
          f.count()
          f
        })
      // g17's fingerprint netting over the staged narrow feed: the
      // shuffle carries 4 narrow columns, not the full landed rows
      feed
        .groupBy(col("__fp"), col("__fp2"), col("l_returnflag"),
          col("l_orderkey"))
        .agg(sum(col("__delta")).as("__net"))
        .filter(col("__net") =!= 0L)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("__net")).as("cnt"),
          sum(col("__net") * col("l_orderkey")).as("key_sum"))
    })
  )

  /** Stage a corpus as two single-file parquet batches (even keys
    * then odd) with strictly increasing mtimes, so the file stream
    * source delivers them as two ordered micro-batches.
    */
  private def stageTwoBatchSource(s: SparkSession, d: String,
      docs: DataFrame, sub: String, keyCol: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val srcDir = Paths.get(
      graft.util.RunRoot.under(s"graft_stream_src/${d.replace('/', '_')}/$sub"))
    if (Files.exists(srcDir)) {
      val walk = Files.walk(srcDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
    Files.createDirectories(srcDir)
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = srcDir.resolve(s".tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val listing = Files.list(tmp)
        try listing.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      }
      val dest = srcDir.resolve(name)
      Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
    val t0 = System.currentTimeMillis() - 120000L
    stage(docs.filter(col(keyCol) % 2 === 0), "a_even.parquet", t0)
    stage(docs.filter(col(keyCol) % 2 === 1), "b_odd.parquet", t0 + 60000L)
    srcDir.toString
  }

  /** Near-dup stream-ingested table cache, one per (dataset, session). */
  private val nearIngested =
    new graft.util.BuildOnce[graft.table.SegmentedTable]

  /** Ingested-table cache: stream-load once per (dataset, session). */
  private val ingested =
    new graft.util.BuildOnce[graft.table.SegmentedTable]

  /** st07's drained result, one stream run per (dataset, session). */
  private val streamedFromTable =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  /** st08's landed stream-static join, one run per (dataset, session). */
  private val streamStaticJoined =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  /** st22's catalog-landed table, one stream run per (dataset, session). */
  private val catalogStreamed =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  /** st09's sink-ingested table, one stream run per (dataset, session). */
  private val sinkIngested =
    new graft.util.BuildOnce[graft.table.SegmentedTable]

  /** st13's upserted table, one stream run per (dataset, session). */
  private val upserted =
    new graft.util.BuildOnce[graft.table.SegmentedTable]

  /** st10's auto-refreshed MV rollup, one stream run per (dataset, session). */
  private val streamMvRollup =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  /** st11's landed change feed, one stream run per (dataset, session). */
  private val streamCdcFeed =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  val oracles: Map[String, String] = Map(
    // hour_bucket from window.start == epoch-micros div 3600e6 == the
    // q30 bucketing; value sum in exact decimal
    "st01_stream_hourly" ->
      """SELECT (epoch_ns(ts) // 1000) // 3600000000 AS hour_bucket, event_type,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    // sliding windows replayed by expansion: a 2h-window/1h-slide
    // assigns each event to exactly the two epoch-hour-aligned
    // windows starting at its hour and the hour before — UNION ALL
    // the two memberships, then the same counts as st01
    "st15_sliding_window" ->
      """WITH e AS (SELECT (epoch_ns(ts) // 1000) // 3600000000 AS h,
           event_type, value FROM events),
         x AS (SELECT h - 1 AS win_hour, event_type, value FROM e
               UNION ALL
               SELECT h AS win_hour, event_type, value FROM e)
         SELECT win_hour, event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM x GROUP BY 1, 2""",

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

    // the streamed join must equal the batch join exactly
    "st08_stream_static_join" ->
      """WITH spend AS (
           SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT e.user_id, COUNT(*) AS errors, MAX(s.spend) AS spend
         FROM events e JOIN spend s USING (user_id)
         WHERE e.event_type = 'error' AND s.spend > 600.0
         GROUP BY 1""",

    // the landed stream must hold exactly the source events — the
    // same hourly aggregate over either is identical
    "st07_table_stream_source" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    // the catalog round trip must land exactly the source events —
    // identical replay to st07's, over a different physical journey
    "st22_catalog_stream" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",

    // the sink-ingested table must hold exactly the source events
    "st09_sink_ingest" ->
      """SELECT event_type, COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         COUNT(DISTINCT user_id) AS users
         FROM events GROUP BY event_type""",

    // the MV's materialized partials must equal the full aggregate of
    // everything that streamed through the sink
    "st10_stream_mv_refresh" ->
      """SELECT event_type,
         CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
         MIN(value) AS min_value, MAX(value) AS max_value,
         COUNT(*) AS cnt_rows
         FROM events GROUP BY event_type""",

    // the streamed-and-netted replica must equal the table's final
    // contents (g17's oracle: evens all kept, odds ending in neither
    // 3 nor 7)
    "st11_stream_cdc_apply" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
         CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
         FROM lineitem
         WHERE (l_orderkey % 2 = 0
                OR (l_orderkey % 2 = 1 AND l_orderkey % 10 <> 3))
           AND l_orderkey % 10 <> 7
         GROUP BY l_returnflag""",

    // the state machine replayed as a prefix window: an event is
    // anomalous when at least 3 prior events exist and its cent value
    // exceeds 3× their mean (exact-integer sums; identical IEEE ops)
    "st14_custom_state_anomaly" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             COUNT(*) OVER w AS nb,
             SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS sb
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, ts_ns // 1000 AS ts_us, CAST(v AS DOUBLE) AS value
         FROM e
         WHERE nb >= 3
           AND CAST(v AS DOUBLE) >
             3.0 * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))""",

    // the t50 window rule replayed batch-side, folded per shard —
    // the streamed tokenize → window → fingerprint must agree across
    // any micro-batch split
    "st19_stream_chunks" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS words
           FROM documents),
         n AS (SELECT doc_id, words, len(words) AS n FROM t
           WHERE len(words) > 0 AND words[1] <> ''),
         k AS (SELECT doc_id, words, n,
           unnest(range(0, CASE WHEN n <= 64 THEN 1
             ELSE (n - 17) // 48 + 1 END)) AS ck FROM n),
         c AS (SELECT doc_id,
           CAST(least(64, n - ck * 48) AS INT) AS n_tokens,
           CAST('0x' || substr(md5(array_to_string(
             words[CAST(ck * 48 + 1 AS INT) :
                   CAST(least(ck * 48 + 64, n) AS INT)], ' ')), 1, 15)
             AS BIGINT) % 1000000007 AS chunk_h
         FROM k)
         SELECT doc_id % 10 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
           CAST(COUNT(DISTINCT chunk_h) AS BIGINT) AS distinct_chunks
         FROM c GROUP BY 1""",

    // the m12 envelope-hash rule replayed batch-side (WAV PCM
    // lossless ⇒ the streamed decode must be byte-identical), folded
    // per band prefix
    "st20_stream_audio_fp" ->
      s"""WITH ${PipelineQueries.audioFpSql()}
         SELECT CAST(af_hi >> 24 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(SUM(af_lo) AS BIGINT) AS lo_sum,
           CAST(COUNT(DISTINCT (af_hi, af_lo)) AS BIGINT) AS distinct_hashes
         FROM af GROUP BY 1""",

    // the m14 synthesis rule replayed and rolled up per timescale —
    // matching proves the streamed container synth + box walk equal
    // the batch path across any micro-batch split
    "st21_stream_mp4" ->
      """SELECT CAST(600 + (n_chars % 10) * 60 AS INT) AS timescale,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM((1000 + n_chars % 5000) * 1000 //
             (600 + (n_chars % 10) * 60)) AS BIGINT) AS ms_sum,
           CAST(SUM(strlen(text)) AS BIGINT) AS bytes_sum
         FROM documents GROUP BY 1""",

    // the m11 dHash rule replayed batch-side (PNG lossless ⇒ the
    // streamed decode must be byte-identical), folded per band prefix
    "st18_stream_phash" ->
      s"""WITH ${PipelineQueries.PhashSql}
         SELECT CAST(dh_hi >> 24 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(dh_lo) AS BIGINT) AS lo_sum,
           CAST(COUNT(DISTINCT (dh_hi, dh_lo)) AS BIGINT) AS distinct_hashes
         FROM ph GROUP BY 1""",

    // the in-flight scrub replayed batch-side with the identical
    // planting + regexes (t44's machinery), aggregated per shard
    "st17_stream_redact" -> {
      val em = TextFunctions.EmailPattern
      val ph = TextFunctions.PhonePattern
      val ip = TextFunctions.Ipv4Pattern
      s"""WITH p AS (${PipelineQueries.plantPiiSql()}),
         sc AS (SELECT doc_id,
           len(regexp_extract_all(text, '$em')) AS ne,
           len(regexp_extract_all(text, '$ph')) AS np,
           len(regexp_extract_all(text, '$ip')) AS ni,
           length(regexp_replace(regexp_replace(regexp_replace(text,
             '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'),
             '$ip', '[IP]', 'g')) AS red_len
         FROM p)
         SELECT doc_id % 10 AS shard, CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(ne) AS BIGINT) AS tot_emails,
           CAST(SUM(np) AS BIGINT) AS tot_phones,
           CAST(SUM(ni) AS BIGINT) AS tot_ips,
           CAST(SUM(red_len) AS BIGINT) AS red_chars
         FROM sc GROUP BY 1"""
    },

    // the batch e06 replay: the streamed state machine must land the
    // identical strict first-occurrence funnel
    "st16_stream_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type
           FROM events),
         a AS (SELECT user_id, MIN(t) AS ta FROM e
           WHERE event_type = 'view' GROUP BY user_id),
         b AS (SELECT e.user_id, MIN(t) AS tb FROM e JOIN a USING (user_id)
           WHERE event_type = 'click' AND t > ta GROUP BY e.user_id),
         c AS (SELECT e.user_id, MIN(t) AS tc FROM e JOIN b USING (user_id)
           WHERE event_type = 'purchase' AND t > tb GROUP BY e.user_id),
         s AS (SELECT 1 AS stage, 'view' AS step,
             (SELECT COUNT(*) FROM a) AS n
           UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM b)
           UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM c))
         SELECT CAST(stage AS INT) AS stage, step,
           CAST(n AS BIGINT) AS n_users,
           CAST(n * 1000000 // (SELECT COUNT(*) FROM a) AS BIGINT)
             AS conv_ppm
         FROM s""",

    // the upserted table holds the global per-user argmax by
    // (ts, event_id), whatever the batch split was
    "st13_stream_upsert" ->
      """WITH latest AS (
           SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT event_type, COUNT(*) AS users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM latest WHERE rn = 1 GROUP BY event_type""",

    // q44's correlation with µs-floored timestamps on both engines:
    // the streamed join's landed pairs must reproduce the batch join
    "st12_stream_stream_join" ->
      """SELECT e.user_id, COUNT(*) AS n_pairs,
         COUNT(DISTINCT e.event_id) AS errors_with_purchase
         FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ets
               FROM events WHERE event_type = 'error') e
         JOIN (SELECT user_id, epoch_ns(ts) // 1000 AS pts
               FROM events WHERE event_type = 'purchase') p
         ON e.user_id = p.user_id
         AND p.pts > e.ets - 3600000000 AND p.pts <= e.ets
         GROUP BY e.user_id""",

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
         FROM u GROUP BY 1""",

    // identical reconstruction to g12's oracle: evens all land (batch
    // 1 is all-novel), odds land unless they share a MinHash band with
    // any even — the streaming delivery must not change the outcome
    "st06_stream_neardup_ingest" ->
      s"""WITH t AS (SELECT doc_id, ${PipelineQueries.W} AS words FROM documents),
          sh AS (SELECT doc_id, ${PipelineQueries.SH} AS s FROM t),
          sig AS (SELECT doc_id,
            ${(0 until 4).map(b => s"${PipelineQueries.band(b, 4)} AS band$b").mkString(", ")}
          FROM sh WHERE len(s) > 0),
          ev AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
          od AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
          hits AS (SELECT DISTINCT od.doc_id FROM od JOIN ev
            ON od.band0 = ev.band0 OR od.band1 = ev.band1
            OR od.band2 = ev.band2 OR od.band3 = ev.band3),
          final AS (
            SELECT doc_id FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id FROM documents WHERE doc_id % 2 = 1
              AND doc_id NOT IN (SELECT doc_id FROM hits))
          SELECT lang, COUNT(*) AS cnt,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM final JOIN documents USING (doc_id) GROUP BY lang"""
  )
}
