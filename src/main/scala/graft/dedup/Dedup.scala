package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.TextFunctions._

/** Document deduplication operators for 100 TB-scale corpora.
  *
  * Scale design notes:
  *  - Exact dedup is one hash-aggregate: map-side partial on the
  *    fingerprint, one shuffle on the 16-byte key, no full-text shuffle.
  *  - MinHash-LSH candidate generation is the standard
  *    shingle → signature → band → bucket-join pipeline: cost is
  *    O(docs × shingles × k) map-side work plus one shuffle keyed by
  *    (band_idx, band_key). No quadratic stage ever materializes; the
  *    pair join only touches docs sharing a band bucket, and hot
  *    buckets (boilerplate-heavy corpora) split into id-hashed block
  *    pairs so no single task pays a bucket's n² pairing.
  *  - Verification (exact Jaccard) runs only on LSH candidates, or on
  *    explicit blocking keys, never all-pairs.
  */
object Dedup {

  /** Guarded task-parallelism lift for CPU-bound text stages — the
    * shared [[graft.util.Spread]] implementation.
    */
  private def spread(df: DataFrame): DataFrame =
    graft.util.Spread.toCpuParallelism(df)

  /** Exact dedup groups: one row per distinct normalized text with the
    * representative (min id) and the duplicate count.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_cnt"))

  /** Per-document MinHash LSH band keys, exploded for the bucket join:
    * (id, band_idx, band_key). Empty/short docs yield null keys which
    * are dropped (they cannot be near-dup candidates).
    *
    * Tokens → shingles → signature → bands are STAGED columns so each
    * evaluates once per row (inlining them into one expression
    * re-evaluates earlier stages per seed/band — the quadratic trap).
    */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    import graft.functions.MinHashExpressions._
    spread(docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .withColumn("__words", tokens(col("__text")))
      .withColumn("__sh", wordShingles3(col("__words")))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), k))
      .select(col("id"),
        posexplode(lshBands(col("__sig"), k, rowsPerBand)).as(Seq("band_idx", "band_key")))
      .filter(col("band_key").isNotNull)
  }

  /** MinHash-LSH near-duplicate candidate pairs (id_a < id_b), distinct.
    * The join is keyed by (band_idx, band_key) so it shuffles only
    * band-key rows — never the corpus text.
    *
    * Hot-bucket skew guard (the [[semanticDupes]] hot-cell split,
    * ported): band-bucket population is corpus/band-space on average
    * but UNBOUNDED on a boilerplate-heavy corpus — templated pages or
    * shared license headers concentrate millions of docs into one
    * (band_idx, band_key) bucket, and a plain self-join would hand
    * that bucket's n² pairs to a single straggler task. So each bucket
    * with n > `maxBucketSide` rows is split into S = ⌈n /
    * maxBucketSide⌉ blocks by an id hash and the join runs per block
    * PAIR: row u joins key (bucket, b_u, j) for j ≥ b_u, row v joins
    * key (bucket, i, b_v) for i ≤ b_v, so an unordered pair meets at
    * exactly (bucket, min(b,b'), max(b,b')) in an arbitrary
    * orientation — least/greatest normalizes it and the closing
    * distinct absorbs same-block double hits. Total comparison count is unchanged (the
    * within-bucket quadratic term is inherent to LSH banding) but no
    * task handles more than maxBucketSide² of it. Buckets at or under
    * maxBucketSide pay nothing: S = 1 reduces to the plain bucket join
    * on key (bucket, 0, 0). Bucket sizes come from a count window over
    * the bucket key — fully keyed, no driver or broadcast state. A
    * probed-broadcast variant (detect hot buckets by aggregation,
    * broadcast-join the small hot list, skip the window) was measured
    * and REJECTED: its two extra job barriers (probe + broadcast
    * build) cost more at bench scale than the window's extra keyed
    * shuffle of narrow (id, band_idx, band_key) rows, and the window
    * form also never risks an unbounded hot list — the distinct-bucket
    * count table is corpus-scale (unlike semanticDupes' nlist cells)
    * and must never land on the driver. See BENCH_NOTES r12.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, rowsPerBand: Int = 4,
                        maxBucketSide: Int = 4096): DataFrame = {
    // persist the SALTED banded signatures: both sides of the
    // self-join read them, and without the cache the whole
    // shingle→signature pipeline plus the bucket-count window (the
    // expensive parts) evaluate twice — double the hashing cost over
    // a 100 TB corpus. The candidate list is materialized eagerly
    // (localCheckpoint) so the cache can be released before returning
    // instead of leaking executor memory into the caller's session;
    // candidates are orders of magnitude smaller than signatures.
    val salted = saltedBands(docs, idCol, textCol, k, rowsPerBand,
      maxBucketSide).persist()
    try bandPairs(salted).localCheckpoint()
    finally salted.unpersist()
  }

  /** Banded signatures with the hot-bucket salt columns: `__s` (the
    * bucket's block count, 1 for buckets ≤ maxBucketSide) and `__b`
    * (this row's id-hash block within its bucket). One count window
    * over the bucket key — fully keyed, no driver/broadcast state.
    */
  private[graft] def saltedBands(docs: DataFrame, idCol: String,
                                 textCol: String, k: Int, rowsPerBand: Int,
                                 maxBucketSide: Int): DataFrame =
    saltBuckets(bandedSignatures(docs, idCol, textCol, k, rowsPerBand),
      maxBucketSide)

  /** The hot-bucket salt applied to ANY (id, band_idx, band_key)
    * frame — shared by the MinHash text leg and the perceptual-hash
    * image leg, so the guard and its orientation lessons live once.
    */
  private[graft] def saltBuckets(banded: DataFrame,
                                 maxBucketSide: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_idx"), col("band_key"))
    banded
      .withColumn("__s",
        ceil(count(lit(1)).over(w).cast("double") / maxBucketSide).cast("int"))
      .withColumn("__b", pmod(xxhash64(col("id")), col("__s")).cast("int"))
  }

  /** The block-pair self-join over salted bands: distinct candidate
    * pairs (id_a < id_b). Each side's contribution at any join key
    * (band_idx, band_key, __i, __j) is one id-hash block — at most
    * ~maxBucketSide rows — so no task ever receives a whole hot
    * bucket's quadratic pairing.
    */
  private[graft] def bandPairs(salted: DataFrame): DataFrame = {
    val a = salted
      .select(col("band_idx"), col("band_key"), col("id").as("id_a"),
        col("__b"), col("__s"))
      .withColumn("__i", col("__b"))
      .withColumn("__j", explode(sequence(col("__b"), col("__s") - 1)))
      .drop("__b", "__s")
    val b = salted
      .select(col("band_idx"), col("band_key"), col("id").as("id_b"),
        col("__b"))
      .withColumn("__i", explode(sequence(lit(0), col("__b"))))
      .withColumn("__j", col("__b"))
      .drop("__b")
    // a pair meets at key (min(b,b'), max(b,b')) with whichever member
    // hashed to the lower block on the a-side — normalize orientation
    // with least/greatest (an id_a < id_b filter would drop pairs that
    // happen to meet reversed), exactly as semanticDupes does
    a.join(b, Seq("band_idx", "band_key", "__i", "__j"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** Incoming docs that are NOT near-duplicates of the existing
    * corpus: drops every incoming row sharing at least one MinHash
    * LSH band bucket with an existing row — the content-level
    * "seen it before" test that exact keys cannot express. Rows with
    * no shingles (too short) carry no bands and always pass; dedupe
    * within the batch is the caller's job, as with exact-key ingest.
    *
    * Scale: both sides reduce to banded-signature projections (never
    * the text), the collision test is one semi-join keyed by
    * (band_idx, band_key), and the final anti-join moves only ids.
    * This is the STATELESS form (both sides recomputed); steady-state
    * ingest should go through [[ingestNovel]], whose band-signature
    * index makes the existing side incremental.
    */
  def nearNovel(incoming: DataFrame, existing: DataFrame, idCol: String,
                textCol: String, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val in = bandedSignatures(incoming, idCol, textCol, k, rowsPerBand)
    val ex = bandedSignatures(existing, idCol, textCol, k, rowsPerBand)
      .select(col("band_idx"), col("band_key")).distinct()
    val hitIds = in.join(ex, Seq("band_idx", "band_key"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    incoming.join(hitIds, Seq(idCol), "left_anti")
  }

  // ---- incrementally-maintained band-signature index ----
  //
  // ingestNovel's steady-state cost must be O(index + batch), never
  // O(corpus): recomputing the existing corpus's MinHash signatures on
  // every delivery is the one ingest-path operation that grows with
  // table size instead of batch size. The index is a companion
  // SegmentedTable at `<root>/_bands` holding (id, band_idx, band_key)
  // — exploded band keys plus one band_idx = -1 sentinel row per doc,
  // so shingle-less docs still register their id. A `main_version`
  // marker records the main-catalog version the index covers; any
  // out-of-band change (plain load, DML, compact… compact bumps the
  // version too, though its content is unchanged — conservative)
  // invalidates it and the next ingest rebuilds in one amortized
  // corpus pass.

  private def bandsRoot(table: graft.table.SegmentedTable): String =
    new org.apache.hadoop.fs.Path(table.root, "_bands").toString

  private def markerFile(table: graft.table.SegmentedTable): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(table.root, "_bands/_meta/main_version")

  private def readMarker(table: graft.table.SegmentedTable): Option[Long] =
    try Some(graft.table.TableIO.readString(markerFile(table)).trim.toLong)
    catch { case _: Exception => None }

  private def writeMarker(table: graft.table.SegmentedTable, v: Long): Unit =
    graft.table.TableIO.writeStringAtomic(markerFile(table), v.toString)

  /** Index rows for a document batch: exploded band keys plus the
    * per-doc id sentinel (band_idx = -1, null key).
    */
  private def indexRows(df: DataFrame, idCol: String, textCol: String,
                        k: Int, rowsPerBand: Int): DataFrame =
    bandedSignatures(df, idCol, textCol, k, rowsPerBand)
      .select(col("id"), col("band_idx"), col("band_key"))
      .unionByName(df.select(col(idCol).as("id"),
        lit(-1).as("band_idx"), lit(null).cast("string").as("band_key")))

  /** Rebuild the band index from the current corpus — the bootstrap /
    * recovery path after out-of-band main-table changes. One O(corpus)
    * signature pass, amortized over every subsequent index-served
    * delivery. Not safe concurrently with an in-flight ingestNovel on
    * another driver (the overwrite window would read as an empty
    * index); run it from the ingest owner, as ingestNovel itself does.
    */
  def rebuildBandIndex(table: graft.table.SegmentedTable, idCol: String,
                       textCol: String, k: Int = 16,
                       rowsPerBand: Int = 4): Unit = {
    import graft.table.SegmentedTable
    val mainV = table.currentVersion
    val rows = indexRows(table.read(), idCol, textCol, k, rowsPerBand)
    val root = bandsRoot(table)
    val index =
      if (SegmentedTable.exists(root)) SegmentedTable.open(table.spark, root)
      else SegmentedTable.create(table.spark, root, rows.schema,
        Map("sort_columns" -> "band_key"))
    index.overwrite(rows)
    index.cleanFiles() // retired index segments have no time-travel contract
    writeMarker(table, mainV)
  }

  /** Near-duplicate-aware idempotent ingest: re-delivered rows drop by
    * exact id, new rows drop when their content shares a MinHash band
    * with anything the corpus already holds. The fuzzy complement of
    * `SegmentedTable.loadUnique`. Returns the new segment id, None
    * when nothing novel landed.
    *
    * Scale: the id anti-join and the band semi-join both run against
    * the INDEX (never the document segments), so a delivery costs
    * O(index + batch) — the index is the bands projection of the
    * corpus, orders of magnitude narrower than the text.
    *
    * Concurrency: optimistic dual commit. The docs segment and its
    * index rows are staged with no lock held, then committed together
    * under the INDEX table's metadata lock after re-checking that
    * neither catalog moved since the snapshot (both commits inside are
    * driver-side millisecond work; lock order index→main is unique to
    * this path). Two concurrent deliveries of the same batch therefore
    * net one segment: the loser's version check fails and its retry
    * sees the winner's ids/bands. A crash between the two commits
    * leaves docs without index rows — the marker then mismatches and
    * the next delivery rebuilds; near-dups of those docs are
    * CONSERVATIVELY re-admitted, never silently dropped.
    */
  def ingestNovel(table: graft.table.SegmentedTable, df: DataFrame,
                  idCol: String, textCol: String,
                  k: Int = 16, rowsPerBand: Int = 4): Option[Int] = {
    import graft.table.SegmentedTable
    val spark = df.sparkSession
    val root = bandsRoot(table)
    var attempts = 0
    while (attempts < 6) {
      attempts += 1
      val mainV = table.currentVersion
      if (!SegmentedTable.exists(root) || !readMarker(table).contains(mainV)) {
        rebuildBandIndex(table, idCol, textCol, k, rowsPerBand)
      } else {
        val index = SegmentedTable.open(spark, root)
        val idxV = index.currentVersion
        val idx = index.read()
        val knownIds = idx.select(col("id").as(idCol)).distinct()
        val newRows = df.join(knownIds, Seq(idCol), "left_anti")
        val knownBands = idx.filter(col("band_idx") >= 0)
          .select(col("band_idx"), col("band_key")).distinct()
        val hitIds = bandedSignatures(newRows, idCol, textCol, k, rowsPerBand)
          .join(knownBands, Seq("band_idx", "band_key"), "left_semi")
          .select(col("id").as(idCol)).distinct()
        val fresh = newRows.join(hitIds, Seq(idCol), "left_anti")
        // stage FIRST: the staged write is the one evaluation of the
        // novelty joins, and its row count answers "anything novel?"
        // for free (a separate isEmpty probe would run the whole
        // pipeline a second time)
        val stagedDocs = table.stage(fresh)
        if (stagedDocs.rows == 0) { table.discardStaged(stagedDocs); return None }
        // index rows derive from the staged parquet, not the `fresh`
        // plan, so the index is byte-consistent with what the docs
        // segment actually holds
        val stagedDf = spark.read.schema(table.schema)
          .parquet(stagedDocs.tmp.toString)
        val stagedBands =
          index.stage(indexRows(stagedDf, idCol, textCol, k, rowsPerBand))
        val committed = index.withMetaLock {
          if (index.currentVersion == idxV) {
            // the main-version re-check and the docs commit are ONE
            // atomic step under the main lock (lock order index→main):
            // a foreign load racing this window makes the commit
            // return None instead of slipping a segment between an
            // unlocked check and the commit. Success bumps the main
            // catalog to exactly mainV + 1, and stamping that exact
            // version (not a re-read of currentVersion, which a
            // foreign commit may already have advanced) guarantees
            // any concurrent out-of-band segment leaves the marker
            // mismatched → conservative rebuild, never a silently
            // index-uncovered segment
            table.commitStagedIfVersion(stagedDocs, mainV) match {
              case Some(segId) =>
                index.commitStagedHoldingLock(stagedBands)
                writeMarker(table, mainV + 1)
                Some(segId)
              case None => None
            }
          } else None
        }
        committed match {
          case Some(id) =>
            // outside both locks: load-time MV maintenance, as load()
            table.maybeAutoRefresh()
            return Some(id)
          case None =>
            table.discardStaged(stagedDocs)
            index.discardStaged(stagedBands)
          // a catalog moved mid-flight: loop re-validates the marker
          // (rebuilding only on out-of-band changes) and re-runs the
          // novelty joins against the new index snapshot
        }
      }
    }
    throw new IllegalStateException(
      "ingestNovel: catalog moved on every attempt — persistent contention " +
        "or an out-of-band writer racing the ingest owner")
  }

  /** Duplicated n-gram span inventory — the exact-substring dedup
    * signal (after Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": duplicated ≥n-token spans, found there
    * with a suffix array, surface here as n-gram fingerprints shared
    * across documents). Every window of `n` consecutive tokens is
    * rolling-hash fingerprinted ([[TextFunctions.gramFingerprints]]);
    * a span is "duplicated" when its fingerprint occurs in ≥2 distinct
    * documents. Returns (doc_id, dup_spans, dup_grams): total
    * duplicated-span occurrences and distinct duplicated fingerprints
    * per affected document.
    *
    * Scale shape: the gram table is token-count-sized but only
    * (doc_id, int64) wide, and the text column is TOKENIZED ONCE —
    * "duplicated" (≥2 distinct docs) is decided by a window over the
    * fingerprint (min(doc_id) ≠ max(doc_id) within the g-partition),
    * not by an inventory aggregate joined back to a second gram pass.
    * Two keyed shuffles total (by g for the window, by doc_id for the
    * per-doc counts), no join, no all-pairs stage, and no per-gram
    * row buffering beyond the window's spillable sort. At 100 TB the
    * tokenize+fingerprint map stage is the dominant cost, so running
    * it once instead of twice halves the scan bill.
    */
  def dupSpanInventory(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = spread(docs).select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.gramFingerprints(
        tokens(col(textCol)), n)).as("g"))
    val w = Window.partitionBy(col("g"))
    grams
      .withColumn("__dup", min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
      .filter(col("__dup"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_spans"), countDistinct(col("g")).as("dup_grams"))
  }

  /** Exact-substring span REMOVAL — the "remove" half of Lee et al.
    * 2022 and the apply-twin of [[dupSpanInventory]]: every n-token
    * span whose fingerprint occurs in ≥2 distinct documents is
    * clipped out of each document, and the kept tokens are rejoined
    * (single-space tokenized reconstruction — the contract of a real
    * removal pipeline). Coverage is the merged-interval union as a
    * distinct-position set, so overlapping spans clip once. Returns
    * (doc_id, n_tokens, removed_tokens, clean_text) for EVERY doc —
    * unaffected docs pass through with removed_tokens = 0.
    *
    * Scale shape: the span side is [[dupSpanInventory]]'s two keyed
    * shuffles (fingerprint window, doc_id agg); the clip is one
    * doc_id-keyed join of a per-doc int array bounded by n_tokens,
    * then pure in-row array math (array_except keeps the kept
    * positions in order, hash-set semantics — no per-token linear
    * scans). No all-pairs stage, no driver loops.
    */
  def clipDupSpans(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = spread(docs)
      .withColumn("__w", tokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.gramFingerprints(
          col("__w"), n)).as(Seq("pos", "g")))
    val w = Window.partitionBy(col("g"))
    val covered = grams
      .withColumn("__dup",
        min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
      .filter(col("__dup"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("tok")).as("__cov"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("__w", tokens(col("__text")))
      .withColumn("__keep",
        array_except(sequence(lit(0), size(col("__w")) - 1),
          coalesce(col("__cov"), array().cast("array<int>"))))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        (size(col("__w")) - size(col("__keep"))).cast("long")
          .as("removed_tokens"),
        array_join(transform(col("__keep"),
          p => element_at(col("__w"), p + 1)), " ").as("clean_text"))
  }

  /** Semantic dedup over an embedding column (after SemDeDup, Abbas
    * et al. 2023): vectors land in IVF coarse cells (nearest centroid
    * by cosine), and a vector is a semantic duplicate when an
    * earlier-id vector in the SAME cell has cosine ≥ `minCos`.
    * Returns (dup_id, kept_id = the smallest such earlier id).
    *
    * Scale shape: the only shuffles are keyed by cell (the count pass)
    * and by cell-block-pair (the pairing join); pairs form within
    * cells only (the SemDeDup approximation — the centroids partition
    * the space, so near-identical points share a cell and cross-cell
    * pairs are never materialized). Cell population is corpus/nlist on
    * average, but a skewed embedding space can concentrate mass in one
    * cell, whose single join task would then do |cell|² cosine work —
    * the hot-cell guard below bounds that straggler:
    *
    * Hot-cell skew guard: each cell with n > `maxCellSide` rows is
    * split into S = ⌈n / maxCellSide⌉ blocks by an id hash, and the
    * self-join runs per block PAIR — row u joins key (cell, b_u, j)
    * for j ≥ b_u, row v joins key (cell, i, b_v) for i ≤ b_v, so an
    * unordered pair meets at exactly the key (cell, min(b,b'),
    * max(b,b')) (same-block pairs meet in both orientations; the
    * closing aggregate absorbs the double hit). Total comparison count
    * is unchanged — the within-cell quadratic term is inherent to the
    * operator — but no task handles more than maxCellSide² of it, so
    * the hot cell spreads over ~S²/2 tasks instead of one straggler.
    * Cells at or under maxCellSide pay nothing: S = 1 reduces to the
    * plain per-cell join on key (cell, 0, 0).
    */
  def semanticDupes(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[(Int, Array[Float])],
                    minCos: Double, maxCellSide: Int = 4096): DataFrame = {
    import graft.similarity.Similarity
    // persist the CELL ASSIGNMENT itself: the nlist-cosine scoring
    // projection is the dominant map cost, and counts, a-side, and
    // b-side all derive from it — caching any later frame would still
    // re-score through the uncached lineage. The result is
    // materialized eagerly (localCheckpoint) so the cache is released
    // before returning (minhashCandidates' pattern).
    val c = Similarity.assignCells(
      spread(corpus.select(col(idCol).as("id"), col(vecCol).as("v"))),
      "v", centroids, 1)
      .persist()
    val counts = c.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
    val salted = c.join(broadcast(counts), Seq("cell"))
      .withColumn("__s",
        ceil(col("__n").cast("double") / maxCellSide).cast("int"))
      .withColumn("__b", pmod(xxhash64(col("id")), col("__s")).cast("int"))
    try {
      val a = salted
        .select(col("cell"), col("id").as("id_a"), col("v").as("va"),
          col("__b"), col("__s"))
        .withColumn("__i", col("__b"))
        .withColumn("__j", explode(sequence(col("__b"), col("__s") - 1)))
        .drop("__b", "__s")
      val b = salted
        .select(col("cell"), col("id").as("id_b"), col("v").as("vb"), col("__b"))
        .withColumn("__i", explode(sequence(lit(0), col("__b"))))
        .withColumn("__j", col("__b"))
        .drop("__b")
      a.join(b, Seq("cell", "__i", "__j"))
        .filter(col("id_a") =!= col("id_b"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= minCos)
        .select(least(col("id_a"), col("id_b")).as("kept_id"),
          greatest(col("id_a"), col("id_b")).as("dup_id"))
        .groupBy(col("dup_id")).agg(min(col("kept_id")).as("kept_id"))
        .localCheckpoint()
    } finally c.unpersist()
  }

  /** Exact word-shingle Jaccard for pairs sharing a blocking key.
    * Returns (id_a, id_b, jaccard) for pairs ≥ minJaccard.
    *
    * Scale: within-block pairing is inherently quadratic in block
    * size, and real corpora are DOMINATED by one block (("web","en")
    * at 100 TB) — so the self-join rides the same id-hash sub-block
    * salt as [[bandPairs]]: each block splits into
    * ⌈|block|/maxBlockSide⌉ hash blocks and a task only ever pairs
    * one sub-block against one sub-block, never a whole hot block.
    * The block COUNTS come from a narrow groupBy on the blocking
    * columns broadcast back onto the shingle frame (|distinct
    * blocks| rows) — not a count window, which would drag the wide
    * shingle arrays through an extra full shuffle. The quadratic
    * WORK remains (that is this operator's semantics — use LSH
    * candidates when an approximate pair source is acceptable, see
    * [[minhashCandidates]]/d11); the guard bounds per-task input so
    * the work distributes instead of straggling. Run
    * `graft_block_stats` (the pre-flight TVF) to see the block
    * histogram before launching this on a new corpus.
    *
    * EAGER at call time: the automatic pair-space pre-flight below
    * runs one real Spark aggregation (the per-block counts) BEFORE
    * the pair DataFrame is returned — constructing the frame is not
    * free even if never acted on, and repeated construction repeats
    * the pass. Disable via `spark.graft.maxCandidatePairs <= 0` to
    * make construction lazy again.
    */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], minJaccard: Double,
                          maxBlockSide: Int = 4096): DataFrame = {
    val withSh = spread(docs)
      .withColumn("__words", tokens(col(textCol)))
      .select(
        (col(idCol).as("id") +: blockCols.map(col)) :+
          array_distinct(graft.functions.MinHashExpressions.wordShingles3(
            col("__words"))).as("sh"): _*)
    val cnts = docs.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // pair-space pre-flight (same budget as the similarity audits):
    // sub-block salting bounds PER-TASK pairs at maxBlockSide², not
    // the TOTAL pair space, which grows quadratically in block
    // population — at sf10 of the dev corpus a single execution ran
    // 45+ min inside the pair space. blockStats (the d22 gate) is the
    // MANUAL pre-flight; this is its automatic teeth. One 1-row agg
    // over the already-needed per-block counts; actionable error,
    // conf-overridable.
    locally {
      val budget = docs.sparkSession.conf
        .get(graft.similarity.Similarity.MaxCandidatePairsKey,
          graft.similarity.Similarity.MaxCandidatePairsDefault).toLong
      if (budget > 0) {
        // Σn² in DOUBLE — a long product wraps for a ~3.04e9-doc
        // block, bypassing the guard at exactly the scale it protects
        val r = cnts.agg(
          sum(col("__n").cast("double") * col("__n").cast("double")).as("p"),
          max(col("__n")).as("m")).head()
        val pairs = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
        if (pairs > budget.toDouble) throw new IllegalStateException(
          s"blockedJaccardPairs: estimated in-block candidate pairs ${pairs.toLong} " +
          s"(largest block ${r.getLong(1)} docs) exceed " +
          s"${graft.similarity.Similarity.MaxCandidatePairsKey}=$budget. " +
          "Exact blocked Jaccard is for corpora where the full pair " +
          "space is affordable; at this size, block on finer columns, " +
          "run blockStats first to see the distribution, or route to " +
          "minhashCandidates (banded LSH — sub-linear, the corpus-scale " +
          "path). Set the conf <= 0 to disable this guard.")
      }
    }
    val salted = withSh.join(broadcast(cnts), blockCols)
      .withColumn("__s",
        ceil(col("__n").cast("double") / maxBlockSide).cast("int"))
      .withColumn("__b", pmod(xxhash64(col("id")), col("__s")).cast("int"))
      .drop("__n")
    val a = salted
      .select((col("id").as("id_a") +: col("sh").as("sh_a") +:
        blockCols.map(col)) :+ col("__b") :+ col("__s"): _*)
      .withColumn("__i", col("__b"))
      .withColumn("__j", explode(sequence(col("__b"), col("__s") - 1)))
      .drop("__b", "__s")
    val b = salted
      .select((col("id").as("id_b") +: col("sh").as("sh_b") +:
        blockCols.map(col)) :+ col("__b"): _*)
      .withColumn("__i", explode(sequence(lit(0), col("__b"))))
      .withColumn("__j", col("__b"))
      .drop("__b")
    // threshold on the UNROUNDED similarity (matching the oracle);
    // rounding only the REPORTED column — a round-then-filter would
    // admit pairs genuinely below the caller's cutoff
    val j = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b")))
    // a pair meets ONCE at (min(b,b'), max(b,b')) when its members
    // hash to different sub-blocks, and TWICE (both orientations)
    // when they share one — so same-sub-block matches keep only
    // id_a < id_b, BEFORE the jaccard evaluation: a post-hoc
    // distinct would pay the intersect/union (the operator's
    // dominant cost) twice per same-block pair, measured 0.55 →
    // 0.95 s at sf0.1 where every block is one sub-block. A bare
    // id_a < id_b filter across ALL matches would drop cross-block
    // pairs meeting reversed (the bandPairs orientation lesson) —
    // cross-block matches are unique already and only need
    // least/greatest normalization
    a.join(b, blockCols ++ Seq("__i", "__j"))
      .filter(col("__i") =!= col("__j") || col("id_a") < col("id_b"))
      .filter(j >= minJaccard)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(j, 6).as("jaccard"))
  }

  /** Pre-flight block histogram for [[blockedJaccardPairs]] (the
    * `graft_block_stats` TVF): one row per blocking-key combination
    * with its size, corpus share (integer ppm — long arithmetic, the
    * t-family overflow lesson), the sub-block fan-out the id-hash
    * salt will apply at `maxBlockSide`, and the exact pair-comparison
    * work the block implies (n·(n-1)/2). Run this BEFORE a blocked
    * quadratic verify on a new corpus: a block with `pair_work`
    * dominating the sum is the straggler the salt distributes — and
    * if even distributed work is too much, the histogram is the
    * evidence to switch to [[minhashCandidates]].
    *
    * Scale: one narrow groupBy on the blocking columns (|distinct
    * blocks| rows) plus a 1-row broadcast total — no wide column
    * ever shuffles.
    */
  def blockStats(docs: DataFrame, blockCols: Seq[String],
                 maxBlockSide: Int = 4096): DataFrame = {
    require(blockCols.nonEmpty, "blockStats needs at least one blocking column")
    val cnts = docs.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
    val total = docs.select(count(lit(1)).as("__total"))
    cnts.crossJoin(broadcast(total))
      .select(blockCols.map(col) ++ Seq(
        col("n_docs"),
        expr("(n_docs * 1000000L) div __total").as("share_ppm"),
        ceil(col("n_docs").cast("double") / maxBlockSide).cast("int")
          .as("sub_blocks"),
        expr("(n_docs * (n_docs - 1L)) div 2").as("pair_work")): _*)
  }

  /** Exact-duplicate PAIRS: canonical (id_a < id_b) pairs of documents
    * with identical normalized text — [[exactGroups]] emitted at pair
    * granularity so it can feed a pair-level consumer (the d21
    * cross-modality verdict). The self-join keys on the 16-byte text
    * fingerprint, so work is bounded by duplicate-GROUP sizes: the
    * corpus's unique texts never pair, and the wide text column never
    * rides the shuffle. A pathological corpus where one text repeats
    * millions of times would make its group quadratic — run
    * [[blockStats]] on the fingerprint if that is plausible.
    */
  def exactPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.select(col(idCol).cast("long").as("id"),
      fingerprint(col(textCol)).as("fp"))
    fp.select(col("id").as("id_a"), col("fp"))
      .join(fp.select(col("id").as("id_b"), col("fp")), "fp")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** Cross-modality duplicate verdict (d21): a pair of documents is
    * flagged when it is near-dup in AT LEAST TWO of the three modality
    * spaces — text, image, audio. Each leg is the pair list its own
    * bounded candidate generator produced ([[exactPairs]] /
    * [[blockedJaccardPairs]] for text, [[phashPairs]] over dHash for
    * images, [[phashPairs]] over the envelope hash for audio), so this
    * stage never generates candidates itself: it unions three NARROW
    * (id_a, id_b) lists, normalizes orientation, and aggregates per
    * pair — one shuffle on the pair key, input bounded by the sum of
    * the legs' outputs. The two-modality threshold is the point: a
    * text-only or image-only collision is routine, but independent
    * agreement between two modality spaces is strong evidence the
    * underlying DOCUMENT is the same asset re-uploaded.
    *
    * Emits (id_a, id_b, in_text, in_image, in_audio, n_modalities)
    * for pairs with n_modalities >= 2.
    */
  def crossModalDupes(textPairs: DataFrame, imagePairs: DataFrame,
                      audioPairs: DataFrame): DataFrame = {
    def leg(df: DataFrame, name: String) =
      df.select(least(col("id_a"), col("id_b")).cast("long").as("id_a"),
        greatest(col("id_a"), col("id_b")).cast("long").as("id_b"),
        lit(name).as("__leg"))
    leg(textPairs, "text")
      .unionByName(leg(imagePairs, "image"))
      .unionByName(leg(audioPairs, "audio"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        max(when(col("__leg") === "text", 1).otherwise(0)).cast("int")
          .as("in_text"),
        max(when(col("__leg") === "image", 1).otherwise(0)).cast("int")
          .as("in_image"),
        max(when(col("__leg") === "audio", 1).otherwise(0)).cast("int")
          .as("in_audio"))
      .withColumn("n_modalities",
        (col("in_text") + col("in_image") + col("in_audio")).cast("int"))
      .filter(col("n_modalities") >= 2)
  }

  /** Edit-distance-VERIFIED near-dup pairs: candidates come from
    * MinHash band collisions (never all-pairs), and each candidate is
    * confirmed by Levenshtein distance normalized by the longer text
    * (lev · denom ≤ max(len) ⇔ ratio ≤ 1/denom). The complement of
    * [[blockedJaccardPairs]]' set-overlap verify: edit distance is
    * order-sensitive — it catches in-place edits and typo chains that
    * bag-of-shingles similarity over- or under-credits, the classic
    * fuzzy-match confirmation.
    *
    * Scale: the only corpus-sized stage is the banded-signature
    * pipeline inside [[minhashCandidates]]; full texts join back to
    * the candidate PAIRS only, and the length-quadratic Levenshtein
    * runs once per candidate — bounded by the LSH collision rate,
    * never |docs|². For very long documents cap the compared prefix
    * (or use Spark's thresholded levenshtein) — at ratio ≤ 1/denom a
    * prefix bound is sound because lev ≥ length difference.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        denom: Int = 10, k: Int = 16,
                        rowsPerBand: Int = 4): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol, k, rowsPerBand)
    val texts = docs.select(col(idCol), col(textCol))
    val a = texts.toDF("id_a", "__ta")
    val b = texts.toDF("id_b", "__tb")
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")))
      .filter(col("lev") * denom <=
        greatest(length(col("__ta")), length(col("__tb"))))
      .select(col("id_a"), col("id_b"), col("lev"))
  }

  /** Connected components over near-duplicate candidate pairs: every
    * doc that appears in a pair is labeled with the minimum doc id of
    * its component (the canonical dedup representative). Iterative
    * min-label propagation — each round one join + one aggregation,
    * converging in O(diameter) rounds (components from near-dup pairs
    * are tiny, so 2-3 rounds in practice; the same scheme GraphX CC
    * uses, shuffle-bound and skew-free at any corpus size).
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // SMALL-GRAPH FAST PATH: near-dup pair graphs are pair-bounded (a
    // tiny fraction of the corpus), and the iterative propagation
    // below pays ~6 stages + one count action PER ROUND — pure fixed
    // cost when the whole edge list fits in a driver array. Probe up
    // to budget+1 edges with one incremental executeTake: if the
    // graph fits, a min-rooted union-find gives the identical
    // converged labeling in microseconds (one job instead of
    // 3 rounds x 6 stages). Budget default 2M edges (= 32 MB of
    // longs, far under any driver heap); above it — or for non-long
    // ids — the distributed loop below runs unchanged, so the path
    // never caps what the operator can handle, it only removes the
    // per-round scheduling tax the 100 TB regime amortizes anyway.
    val spark = pairs.sparkSession
    val longIds = pairs.schema("id_a").dataType == LongType &&
      pairs.schema("id_b").dataType == LongType
    val edgeBudget =
      try spark.conf.get("spark.graft.maxDriverCcEdges", "2000000").toLong
      catch { case scala.util.control.NonFatal(_) => 2000000L }
    if (longIds && edgeBudget > 0) {
      val probe = pairs.select(col("id_a"), col("id_b"))
        .limit(math.min(edgeBudget, Int.MaxValue - 8L).toInt + 1).collect()
      if (probe.length <= edgeBudget) {
        // min-rooted union-find: attach the larger root under the
        // smaller, so find(x) IS the component minimum — exactly the
        // fixed point min-label propagation converges to
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        probe.foreach { e =>
          val (a, b) = (e.getLong(0), e.getLong(1))
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        import scala.jdk.CollectionConverters._
        val rows = parent.keySet().asScala.toSeq.map(id =>
          org.apache.spark.sql.Row(id, find(id)))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          // nullable like the loop's join-derived labels, so the two
          // paths' output schemas are indistinguishable to consumers
          org.apache.spark.sql.types.StructField("doc_id", LongType, nullable = true),
          org.apache.spark.sql.types.StructField("rep", LongType, nullable = true)))
        return spark.createDataFrame(rows.asJava, schema)
      }
      // graph exceeds the budget: fall through to the distributed
      // loop (the probe cost is one bounded read of a list the loop
      // would materialize anyway)
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // candidate label per node: min of own and neighbors' labels
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("rep", "nrep"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nrep")).as("minNeighbor"))
      val next0 = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("minNeighbor"), col("rep"))).as("rep"))
      // cache each round's labels; every 5th round localCheckpoint
      // instead so the lineage DAG is truncated (otherwise each round
      // stacks a join+agg on the previous plan and both the plan and
      // a cache-eviction recompute grow without bound).
      // localCheckpoint trade-off, accepted deliberately: checkpointed
      // blocks are NOT recomputable after executor loss (a real risk
      // under dynamic allocation) — but a lost round here only fails
      // the job, never corrupts it, and rerunning CC is cheap relative
      // to a reliable spark.checkpoint() HDFS round-trip every 5 rounds.
      val next = if (iter % 5 == 4) next0.localCheckpoint() else next0.cache()
      val prev = labels
      changed = next.join(prev.withColumnRenamed("rep", "old"), "id")
        .filter(col("rep") =!= col("old")).count()
      // the convergence count above materialized `next`; release the
      // superseded round. unpersist() frees cache()d rounds immediately
      // but is a no-op for localCheckpoint()ed ones (checkpoint RDDs
      // are not in the CacheManager) — those are reclaimed by the
      // ContextCleaner once `prev` drops out of scope, so at most one
      // checkpointed label set lingers until GC, bounded, not 20.
      if (iter > 0) prev.unpersist()
      labels = next
      iter += 1
    }
    if (changed > 0) {
      labels.unpersist(); edges.unpersist()
      // min-label propagation moves the component minimum one hop per
      // round, so the cap bounds DIAMETER; returning the unconverged
      // labels would silently dedup against wrong representatives —
      // fail by name instead (the repo-wide fail-fast discipline)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIters rounds " +
          s"($changed labels still moving) — a component's diameter " +
          s"exceeds the cap; raise maxIters (e.g. ${maxIters * 2})")
    }
    val out = labels.select(col("id").as("doc_id"), col("rep"))
      .localCheckpoint()
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** Perceptual-hash near-duplicate IMAGE pairs — the image leg of
    * the dedup family over
    * [[graft.multimodal.Multimodal.perceptualHashes]] output: pairs
    * whose 64-bit dHash (as hi/lo unsigned 32-bit halves) differs in
    * at most `maxHamming` bits.
    *
    * Scale shape (the d02/d04 discipline): the 64-bit hash splits
    * into four 16-bit bands — pigeonhole: ≤ 3 differing bits leave at
    * least one band identical — and candidates form by a band-keyed
    * self-join, never all-pairs. Flat/synthetic corpora concentrate
    * identical hashes into hot buckets (an all-gray corpus puts the
    * WHOLE corpus at dh = 0), so the join rides the same
    * [[saltBuckets]]/[[bandPairs]] guard as the MinHash leg: hot
    * buckets split into id-hash blocks, pairs form per block-pair
    * key, one fully-keyed COUNT window, no driver state. Quarantined
    * rows (dh_hi < 0) are excluded up front — undecodable images
    * must not pair with each other. Exact Hamming distance is then
    * verified on the pair list (band collision is necessary, not
    * sufficient).
    */
  def phashPairs(hashes: DataFrame, idCol: String,
                 hiCol: String, loCol: String, maxHamming: Int,
                 maxBucketSide: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding is complete only for maxHamming <= 3, got $maxHamming")
    val h = hashes
      .select(col(idCol).cast("long").as("id"),
        col(hiCol).cast("long").as("hi"), col(loCol).cast("long").as("lo"))
      .filter(col("hi") >= 0 && col("lo") >= 0)
      .persist()
    try {
      val banded = h.select(col("id"), posexplode(array(
          shiftright(col("hi"), 16).bitwiseAND(lit(0xffffL)),
          col("hi").bitwiseAND(lit(0xffffL)),
          shiftright(col("lo"), 16).bitwiseAND(lit(0xffffL)),
          col("lo").bitwiseAND(lit(0xffffL)))))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
      val pairs = bandPairs(saltBuckets(banded, maxBucketSide))
      pairs
        .join(h.select(col("id").as("id_a"), col("hi").as("hi_a"),
          col("lo").as("lo_a")), "id_a")
        .join(h.select(col("id").as("id_b"), col("hi").as("hi_b"),
          col("lo").as("lo_b")), "id_b")
        .withColumn("hamming",
          (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
            bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
        .filter(col("hamming") <= maxHamming)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .localCheckpoint()
    } finally h.unpersist()
  }

  /** SimHash near-duplicate candidates: pairs whose 32-bit md5-SimHash
    * differs in at most `maxHamming` bits, within blocks. At scale,
    * block on simhash byte-prefixes (pigeonhole: a ≤3-bit difference
    * leaves at least one of 4 bytes identical) instead of columns.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], maxHamming: Int): DataFrame = {
    val withH = spread(docs).select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        simhash32(col(textCol)).as("sh"): _*)
    val a = withH.select(col("id").as("id_a") +: col("sh").as("sh_a") +:
      blockCols.map(col): _*)
    val b = withH.select(col("id").as("id_b") +: col("sh").as("sh_b") +:
      blockCols.map(col): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
