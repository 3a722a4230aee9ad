package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.multimodal.Multimodal

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly agg equals batch computation") {
    val streamed = EventStreams.runToCompletion(spark,
      EventStreams.hourlyAgg(EventStreams.eventStream(spark, TestSpark.sf)))
      .orderBy("hour_bucket", "event_type")
      .collect()
    val batch = Tables.events(spark, TestSpark.sf)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select((col("window.start").cast("long") / 3600).cast("long").as("hour_bucket"),
        col("event_type"), col("cnt"), col("total_value"))
      .orderBy("hour_bucket", "event_type")
      .collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming sliding-window agg equals the batch two-window expansion") {
    val streamed = EventStreams.runToCompletion(spark,
      EventStreams.slidingAgg(EventStreams.eventStream(spark, TestSpark.sf)))
      .orderBy("win_hour", "event_type")
      .collect()
    val e = Tables.events(spark, TestSpark.sf)
      .select(expr("ts div 3600000000000").as("h"), col("event_type"),
        col("value"))
    val batch = e
      .select((col("h") - 1).as("win_hour"), col("event_type"), col("value"))
      .unionAll(e.select(col("h").as("win_hour"), col("event_type"),
        col("value")))
      .groupBy(col("win_hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("win_hour", "event_type")
      .collect()
    assert(streamed.sameElements(batch))
    // overlap invariant: every event counted exactly twice
    val total = streamed.map(_.getAs[Long]("cnt")).sum
    assert(total == 2L * Tables.events(spark, TestSpark.sf).count())
  }

  test("e03: transitions conserve events minus users, ppm shares are exact") {
    val out = graft.SparkEntry.queries("e03_transition_matrix")(
      spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // each user with n events contributes exactly n-1 transitions
    assert(out.map(_.getAs[Long]("cnt")).sum == nEvents - nUsers)
    val byFrom = out.groupBy(_.getAs[String]("from_type"))
    byFrom.values.foreach { rows =>
      val tot = rows.map(_.getAs[Long]("cnt")).sum
      rows.foreach { r =>
        assert(r.getAs[Long]("p_ppm") ==
          r.getAs[Long]("cnt") * 1000000L / tot)
      }
      // shares of one from-state sum to ~1e6 (floor loss < n_to_types)
      val s = rows.map(_.getAs[Long]("p_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length)
    }
  }

  test("m08: audio stats fold the decoded stream exactly (energy, peak, TV)") {
    val df = Seq((1L, "ab", 2L)).toDF("doc_id", "text", "n_chars")
    // 500 + 2 % 1000 = 502 samples cycling 'a'(97), 'b'(98)
    val wav = Multimodal.withWavPayload(df, "doc_id", "text", "n_chars")
    val r = Multimodal.decodeAudioStats(wav).collect().head
    assert(r.n_samples == 502L)
    assert(r.sq_sum == 251L * 97 * 97 + 251L * 98 * 98)
    assert(r.peak == 98L)
    assert(r.tv == 501L) // strictly alternating, |97 − 98| per step
  }

  test("m08: a corrupt container quarantines deterministically, not throws") {
    val bad = Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val out = Multimodal.decodeAudioStats(bad).collect()
    assert(out.length == 1 && out.head.id == 2L)
    // replayable stub: a second decode gives the identical record
    assert(Multimodal.decodeAudioStats(bad).collect().head == out.head)
  }

  test("append-mode windowed aggregation drains non-empty (finalization batch runs)") {
    // append emits a window only when the watermark passes its end —
    // for an AvailableNow drain that happens in the trailing no-data
    // batch, which runToCompletion must NOT skip for append mode
    val landed = EventStreams.runToCompletion(spark,
      EventStreams.hourlyAgg(EventStreams.eventStream(spark, TestSpark.sf),
        watermark = Some("1 hour")),
      mode = "append", statePartitions = 4)
    assert(landed.count() > 0,
      "append windowed agg drained empty — the watermark finalization " +
        "batch was skipped")
  }

  test("sessions partition all events exactly once") {
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    val total = ev.count()
    val sessionTotal = EventStreams.sessions(ev)
      .agg(sum("n_events")).as[Long].head()
    assert(sessionTotal == total)
    // every user has >= 1 session and session counts are sane
    val stats = EventStreams.sessionStats(ev)
    assert(stats.filter(col("n_sessions") < 1).count() == 0)
    assert(stats.count() == ev.select("user_id").distinct().count())
  }

  test("multimodal payload plumbing: schema, determinism, batching") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val withP = Multimodal.withPayload(docs, "doc_id", "text")
    assert(withP.schema("payload").dataType.typeName == "binary")
    assert(withP.schema("meta").dataType.typeName == "struct")

    val feats = Multimodal.decodeFeatures(withP.select("id", "payload"), batchSize = 7)
    assert(feats.count() == docs.count())
    val f = feats.orderBy("id").limit(3).collect()
    val f2 = Multimodal.decodeFeatures(withP.select("id", "payload"), batchSize = 64)
      .orderBy("id").limit(3).collect()
    // batch size must not change results (pure per-record decode)
    assert(f.zip(f2).forall { case (x, y) =>
      x.id == y.id && x.width == y.width && x.embedding.sameElements(y.embedding) })
    assert(f.forall(m => m.width >= 64 && m.width < 256 && m.embedding.length == 8))

    val stats = Multimodal.featureStats(docs)
    assert(stats.count() == docs.select("source").distinct().count())
  }

  test("JPEG payloads are genuinely decoded; corrupt JPEGs quarantine") {
    // a real JPEG written directly through ImageIO with KNOWN dims:
    // the decode path must recover them from the bytes, not a rule
    val img = new java.awt.image.BufferedImage(41, 13,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 13).foreach(y => (0 until 41).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 5 + y) % 256)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpg = out.toByteArray
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "SOI marker")
    // a corrupt JPEG (SOI intact, container truncated mid-header) must
    // quarantine to the stub path, never kill the batch
    val bad = jpg.take(6)
    val df = Seq((1L, jpg), (2L, bad)).toDF("id", "payload")
    val feats = Multimodal.decodeFeatures(df).collect().sortBy(_.id)
    assert(feats(0).width == 41 && feats(0).height == 13,
      s"decoded dims must match the written raster, got ${feats(0)}")
    assert(feats(1).width >= 64,
      "undecodable JPEG takes the deterministic stub path")

    // the pipeline form: documents → generated JPEGs → decoded dims
    // must equal the generation rule (what the m09 oracle replays)
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(50)
    val decoded = Multimodal.decodeFeatures(
      Multimodal.withJpegPayload(docs, "doc_id", "text", "n_chars")).toDF()
    val mismatches = decoded
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      .filter(col("width") =!= (lit(1) + col("n_chars") % 56) ||
        col("height") =!= (lit(1) + (col("n_chars") * 11) % 56))
      .count()
    assert(mismatches == 0, "ImageIO must recover the generated JPEG dims")
  }

  test("PNG payloads are genuinely decoded: dimensions come from the raster") {
    // a real PNG written directly through ImageIO with KNOWN dims: the
    // decode path must recover them from the bytes, not from any rule
    val img = new java.awt.image.BufferedImage(37, 11,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 11).foreach(y => (0 until 37).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 7 + y) % 256)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = out.toByteArray
    // a corrupted PNG (signature intact, body mangled) must fall back
    // to the stub, not kill the batch
    val bad = png.clone(); bad(20) = (bad(20) ^ 0xff).toByte
    val df = Seq((1L, png), (2L, bad), (3L, "not a png".getBytes("UTF-8")))
      .toDF("id", "payload")
    val feats = Multimodal.decodeFeatures(df).collect().sortBy(_.id)
    assert(feats.length == 3)
    assert(feats(0).width == 37 && feats(0).height == 11,
      s"decoded dims must match the written raster, got ${feats(0)}")
    assert(feats(1).width >= 64 && feats(2).width >= 64,
      "undecodable payloads take the deterministic stub path")

    // the pipeline form: documents → generated PNGs → decoded dims
    // must equal the generation rule (what the m02 oracle replays)
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(50)
    val decoded = Multimodal.decodeFeatures(
      Multimodal.withPngPayload(docs, "doc_id", "text", "n_chars")).toDF()
    val mismatches = decoded
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      .filter(col("width") =!= (lit(1) + col("n_chars") % 64) ||
        col("height") =!= (lit(1) + (col("n_chars") * 7) % 64))
      .count()
    assert(mismatches == 0, "ImageIO must recover the generated dimensions")

    // byte_len and the embedding depend on the PNG ENCODER's output,
    // which no SQL oracle can replay — so gate them here instead:
    // recompute both independently from the payload bytes and compare
    // exactly (md5-derived embedding rule, real payload length)
    val payloads = Multimodal.withPngPayload(docs, "doc_id", "text", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val byId = Multimodal.decodeFeatures(
      Multimodal.withPngPayload(docs, "doc_id", "text", "n_chars"))
      .collect().map(m => m.id -> m).toMap
    val mdig = java.security.MessageDigest.getInstance("MD5")
    payloads.foreach { case (id, bytes) =>
      val m = byId(id)
      assert(m.byte_len == bytes.length, s"byte_len mismatch for $id")
      val b = mdig.digest(bytes)
      val wantEmb = Array.tabulate(8)(i => (b(i + 2) & 0xff) / 255.0f)
      assert(m.embedding.sameElements(wantEmb), s"embedding rule drifted for $id")
    }
  }

  test("perceptual hash: near-identical images collide, distinct don't, corrupt quarantines") {
    def pngOf(fill: (Int, Int) => Int, w: Int = 40, h: Int = 24): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, fill(x, y) & 0xff)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // A: a horizontal gradient; B: the same gradient with one pixel
    // nudged (off the 9×8 sample grid it is INVISIBLE to dHash; on
    // the grid it flips at most a couple of gradient signs); C: the
    // reversed gradient — every horizontal sign flips
    val a = pngOf((x, _) => x * 6)
    val b = pngOf((x, y) => if (x == 3 && y == 3) x * 6 + 40 else x * 6)
    val c = pngOf((x, _) => (39 - x) * 6)
    val bad = "not an image".getBytes("UTF-8")
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, bad)).toDF("id", "payload")
    val hashes = Multimodal.perceptualHashes(df).collect().sortBy(_.id).toSeq
    assert(hashes.map(_.id) == Seq(1L, 2L, 3L, 4L))
    val byId = hashes.map(h => h.id -> h).toMap
    // quarantine shape: undecodable → (0, 0, -1, -1)
    assert(byId(4L).dh_hi == -1L && byId(4L).dh_lo == -1L &&
      byId(4L).width == 0)
    // gradient hashes: A ascending → horizontal sign bits mostly set;
    // C descending → mostly clear; hamming(A, C) must be large
    def ham(x: Multimodal.PerceptualHash, y: Multimodal.PerceptualHash) =
      java.lang.Long.bitCount(x.dh_hi ^ y.dh_hi) +
        java.lang.Long.bitCount(x.dh_lo ^ y.dh_lo)
    assert(ham(byId(1L), byId(2L)) <= 2,
      s"near-identical images must collide, hamming=${ham(byId(1L), byId(2L))}")
    assert(ham(byId(1L), byId(3L)) > 20,
      s"reversed gradient must be far, hamming=${ham(byId(1L), byId(3L))}")
    // the pair operator: A–B pairs, C and the quarantined row don't
    val pairs = graft.dedup.Dedup.phashPairs(
      Multimodal.perceptualHashes(df).toDF(), "id", "dh_hi", "dh_lo",
      maxHamming = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      s"expected exactly the (1,2) pair, got ${pairs.mkString(",")}")
    // two quarantined rows never pair with each other
    val quarantined = Seq((7L, bad), (8L, bad)).toDF("id", "payload")
    assert(graft.dedup.Dedup.phashPairs(
      Multimodal.perceptualHashes(quarantined).toDF(), "id", "dh_hi", "dh_lo",
      maxHamming = 2).isEmpty)
  }

  test("perceptual hash is scale-invariant on monotone gradients (resize → same dHash)") {
    // the property that makes dHash a DEDUP key across re-encodes and
    // thumbnails: gradient SIGNS survive downscaling. A monotone
    // horizontal gradient stays monotone under the box-fit resize, so
    // the resized image's dHash must EQUAL the original's — the
    // resize → re-encode → decode → hash chain end to end
    val img = new java.awt.image.BufferedImage(96, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 64).foreach(y => (0 until 96).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 2) & 0xff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val df = Seq((1L, out.toByteArray)).toDF("id", "payload")
    val orig = Multimodal.perceptualHashes(df).collect()(0)
    val small = Multimodal.resizeImages(df, maxEdge = 32).toDF()
      .select(col("id"), col("payload"))
    val resized = Multimodal.perceptualHashes(small).collect()(0)
    assert(resized.width == 32 && resized.height == 21)
    assert((orig.dh_hi, orig.dh_lo) == (resized.dh_hi, resized.dh_lo),
      s"dHash must survive a 3x downscale on a monotone gradient: " +
        s"orig=(${orig.dh_hi},${orig.dh_lo}) " +
        s"resized=(${resized.dh_hi},${resized.dh_lo})")
  }

  test("audio fingerprint: identical clips collide, reversed envelope is far, corrupt quarantines") {
    def wavOf(samples: Array[Int], rate: Float = 8000f): Array[Byte] = {
      val pcm = samples.map(v => (v & 0xff).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // A: rising amplitude ramp (every frame louder than the last →
    // all 64 envelope bits set); B: A with one sample nudged (at most
    // the two comparisons touching that frame can flip); C: the
    // falling ramp (every envelope bit clears — maximally far)
    val rampUp = Array.tabulate(650)(i => i / 10)
    val nudged = rampUp.clone(); nudged(327) += 5
    val rampDown = rampUp.reverse
    val bad = "not audio".getBytes("UTF-8")
    val df = Seq((1L, wavOf(rampUp)), (2L, wavOf(nudged)),
      (3L, wavOf(rampDown)), (4L, bad)).toDF("id", "payload")
    val fps = Multimodal.audioFingerprints(df).collect().sortBy(_.id).toSeq
    val byId = fps.map(f => f.id -> f).toMap
    assert(byId(1L).sample_rate == 8000 && byId(1L).n_samples == 650L)
    assert(byId(1L).af_hi == 0xffffffffL && byId(1L).af_lo == 0xffffffffL,
      s"rising ramp must set every envelope bit, got " +
        s"(${byId(1L).af_hi}, ${byId(1L).af_lo})")
    assert(byId(3L).af_hi == 0L && byId(3L).af_lo == 0L,
      "falling ramp must clear every envelope bit")
    // quarantine shape: undecodable → (0, 0, -1, -1)
    assert(byId(4L).af_hi == -1L && byId(4L).af_lo == -1L &&
      byId(4L).sample_rate == 0)
    def ham(x: Multimodal.AudioFingerprint, y: Multimodal.AudioFingerprint) =
      java.lang.Long.bitCount(x.af_hi ^ y.af_hi) +
        java.lang.Long.bitCount(x.af_lo ^ y.af_lo)
    assert(ham(byId(1L), byId(2L)) <= 2,
      s"near-identical clips must collide, hamming=${ham(byId(1L), byId(2L))}")
    // the pair operator (the SAME guarded band join as the image leg):
    // A–B pairs, the reversed clip and the quarantined row don't
    val pairs = graft.dedup.Dedup.phashPairs(
      Multimodal.audioFingerprints(df).toDF(), "id", "af_hi", "af_lo",
      maxHamming = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      s"expected exactly the (1,2) pair, got ${pairs.mkString(",")}")
  }

  test("audio fingerprint is gain-invariant (the envelope twin of dHash brightness invariance)") {
    // uniform gain scales every frame energy by the same factor, so
    // every energy-gradient SIGN — hence the whole hash — survives:
    // the property that makes the fingerprint a dedup key across
    // re-encodes at different volumes
    def wavOf(samples: Array[Int]): Array[Byte] = {
      val pcm = samples.map(v => (v & 0xff).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // an irregular but smallish signal so the doubled version stays in
    // 8-bit range exactly (no clipping — clipping is a lossy re-encode)
    val sig = Array.tabulate(700)(i => (i * 37 % 97) + (i / 50))
    val loud = sig.map(_ * 2)
    require(loud.forall(_ <= 255))
    val df = Seq((1L, wavOf(sig)), (2L, wavOf(loud))).toDF("id", "payload")
    val fps = Multimodal.audioFingerprints(df).collect().sortBy(_.id)
    assert((fps(0).af_hi, fps(0).af_lo) == (fps(1).af_hi, fps(1).af_lo),
      s"2x gain must not change the envelope hash: " +
        s"(${fps(0).af_hi},${fps(0).af_lo}) vs (${fps(1).af_hi},${fps(1).af_lo})")
  }

  test("audio fingerprint survives 2x decimation on smooth ramps (the audio twin of dHash resize invariance)") {
    // a monotone envelope stays monotone under decimation: every
    // frame of the resampled clip sums squares over the same rising
    // region, so all 64 gradient signs — hence the whole hash —
    // survive the decode → decimate → encode → decode chain. The
    // property that makes the fingerprint a dedup key across clips
    // stored at different sample rates.
    def wavOf(samples: Array[Int], rate: Float): Array[Byte] = {
      val pcm = samples.map(v => (v & 0xff).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val ramp = Array.tabulate(1040)(i => i / 20)
    val df = Seq((1L, wavOf(ramp, 8000f))).toDF("id", "payload")
    val orig = Multimodal.audioFingerprints(df).collect()(0)
    val res = Multimodal.resampleAudio(df, 2).toDF()
    val meta = res.collect()(0)
    assert(meta.getAs[Int]("sample_rate") == 4000 &&
      meta.getAs[Long]("n_samples") == 520L)
    val resampled = Multimodal.audioFingerprints(
      res.select(col("id"), col("payload"))).collect()(0)
    assert((orig.af_hi, orig.af_lo) == (resampled.af_hi, resampled.af_lo),
      s"envelope hash must survive 2x decimation on a monotone ramp: " +
        s"orig=(${orig.af_hi},${orig.af_lo}) " +
        s"resampled=(${resampled.af_hi},${resampled.af_lo})")
    // quarantine shape: a corrupt payload resamples to the empty row
    val bad = Seq((2L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val q = Multimodal.resampleAudio(bad, 2).collect()(0)
    assert(q.payload.isEmpty && q.sample_rate == 0 && q.n_samples == 0L)
  }

  test("frame sampling: n rows per payload, empty payload included") {
    val df = Seq((1L, "some video bytes"), (2L, "")).toDF("doc_id", "text")
    val p = Multimodal.withPayload(df, "doc_id", "text")
    val frames = Multimodal.sampleFrames(p.select("id", "payload"), nFrames = 3)
      .collect()
    assert(frames.length == 6)
    assert(frames.groupBy(_.id).forall { case (_, fs) =>
      fs.map(_.frame_idx).sorted.sameElements(Array(0, 1, 2)) })
    // frames of one payload differ (the index is folded into the stub)
    val of1 = frames.filter(_.id == 1L).map(_.frame_fp).distinct
    assert(of1.length == 3)
    // batch size must not change results
    val again = Multimodal.sampleFrames(p.select("id", "payload"),
      nFrames = 3, batchSize = 1).collect().sortBy(f => (f.id, f.frame_idx))
    assert(frames.sortBy(f => (f.id, f.frame_idx)).zip(again).forall {
      case (a, b) => a == b })
  }

  test("GIF frame sampling genuinely seeks and decodes frames") {
    // synthesize real animated GIFs from documents: known dims
    // (1 + n % 48, 1 + 7n % 48) and 2 + n % 5 frames per payload
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(30)
    val gifs = Multimodal.withGifPayload(docs, "doc_id", "text", "n_chars")
    // sanity: the wire format is a genuine GIF container
    val first = gifs.head().getAs[Array[Byte]](1)
    assert(new String(first, 0, 6, "US-ASCII").startsWith("GIF8"))

    val frames = Multimodal.sampleFrames(gifs, nFrames = 4).toDF()
    // every payload yields exactly 4 sampled frames with REAL decoded
    // dims — the generation rule caps dims at 48, far below the stub
    // path's 64+ range, so a stub fallback would fail loudly here
    val joined = frames
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
    assert(joined.count() == 30 * 4)
    val badDims = joined
      .filter(col("frame_w") =!= (lit(1) + col("n_chars") % 48) ||
        col("frame_h") =!= (lit(1) + (col("n_chars") * 7) % 48))
      .count()
    assert(badDims == 0, "frame dims must come from the decoded raster")

    // fingerprints are content-derived and deterministic
    val a = Multimodal.sampleFrames(gifs, nFrames = 4)
      .collect().sortBy(f => (f.id, f.frame_idx))
    val b = Multimodal.sampleFrames(gifs, nFrames = 4, batchSize = 1)
      .collect().sortBy(f => (f.id, f.frame_idx))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // multi-frame payloads produce differing frames (per-frame pixel
    // shift in the generator → different rasters → different hashes)
    val multi = a.groupBy(_.id).values.filter(_.map(_.frame_fp).distinct.length > 1)
    assert(multi.nonEmpty, "sampled frames must reflect differing content")

    // a corrupt GIF (signature intact, container truncated mid-header)
    // quarantines to the stub path instead of killing the batch
    val bad = java.util.Arrays.copyOfRange(first, 0, 10)
    val out = Multimodal.sampleFrames(
      Seq((9L, bad)).toDF("id", "payload"), nFrames = 2).collect()
    assert(out.length == 2 && out.forall(_.frame_w >= 64))
  }

  test("real WAV decode: genuine containers, faithful PCM read, corrupt quarantine") {
    import graft.multimodal.Multimodal
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(30)
    val wavs = Multimodal.withWavPayload(docs, "doc_id", "text", "n_chars")
    // the wire format is a genuine RIFF/WAVE container
    val first = wavs.head().getAs[Array[Byte]](1)
    assert(new String(first, 0, 4, "US-ASCII") == "RIFF" &&
      new String(first, 8, 4, "US-ASCII") == "WAVE")

    // decoded features match the generation rules exactly — a stub
    // fallback (n_samples ≤ 255) or header misparse would fail here
    val feats = Multimodal.decodeAudioFeatures(wavs).toDF()
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
    assert(feats.count() == 30)
    assert(feats.filter(
      col("sample_rate") =!= (lit(8000) + (col("n_chars") % 8) * 1000) ||
        col("n_samples") =!= (lit(500) + col("n_chars") % 1000)).count() == 0)

    // a corrupt WAV (RIFF/WAVE magic intact, chunks truncated)
    // quarantines to the stub instead of killing the batch
    val bad = java.util.Arrays.copyOfRange(first, 0, 16)
    val out = Multimodal.decodeAudioFeatures(
      Seq((7L, bad)).toDF("id", "payload")).collect()
    assert(out.length == 1 && out.head.n_samples <= 255)

    // a VALID WAV outside the feature profile (16-bit mono) decodes
    // without error but must quarantine too — summing its bytes
    // would emit corrupt features, not wrong-by-a-little ones
    val fmt16 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm16 = Array.tabulate[Byte](600)(i => (i % 127).toByte)
    val ais16 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm16), fmt16, 300L)
    val out16 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais16,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out16)
    val r16 = Multimodal.decodeAudioFeatures(
      Seq((8L, out16.toByteArray)).toDF("id", "payload")).collect()
    assert(r16.length == 1 && r16.head.n_samples <= 255,
      "non-8-bit-mono profiles must take the stub path")
  }

  test("flatMapGroupsWithState running-mean anomaly detector") {
    val ev = Tables.events(spark, TestSpark.sf)
    val anomalies = EventStreams.runningMeanAnomalies(ev, factor = 3.0).collect()
    // recompute expectations driver-side
    val rows = ev.select("user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = rows.toSeq.flatMap { case (u, es) =>
      var n = 0L; var sum = 0.0
      es.sortBy(_._2).toSeq.flatMap { case (_, ts, v) =>
        val hit = if (n >= 3 && v > 3.0 * (sum / n)) Some((u, ts)) else None
        n += 1; sum += v
        hit
      }
    }.toSet
    assert(anomalies.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(expected.nonEmpty, "test data should contain anomalies")
  }

  test("resizeImages: downscale floors, in-box passthrough, corrupt payloads quarantine") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(40)
    val png = Multimodal.withPngPayload(docs, "doc_id", "text", "n_chars")
    val resized = Multimodal.resizeImages(png, maxEdge = 16).collect()
    assert(resized.length == 40)
    // every output fits the box; nothing upscaled beyond its source
    val src = Multimodal.decodeFeatures(png).collect().map(m => m.id -> (m.width, m.height)).toMap
    resized.foreach { r =>
      val (w0, h0) = src(r.id)
      assert(r.width <= 16 && r.height <= 16, s"${r.id}: ${r.width}x${r.height}")
      assert(r.width <= w0 && r.height <= h0, "never upscale")
      if (math.max(w0, h0) <= 16) assert((r.width, r.height) == (w0, h0), "in-box passthrough")
      else {
        val m = math.max(w0, h0)
        assert(r.width == math.max(1, w0 * 16 / m) && r.height == math.max(1, h0 * 16 / m))
      }
      // the payload is a real PNG whose decode matches the claimed dims
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == r.width && img.getHeight == r.height)
    }
    // deterministic: a second run produces identical payload bytes
    val again = Multimodal.resizeImages(png, maxEdge = 16).collect()
      .map(r => r.id -> r.payload.toSeq).toMap
    assert(resized.forall(r => again(r.id) == r.payload.toSeq))
    // corrupt and NULL payloads quarantine (0×0, empty) — never kill
    // the batch (null reaches the decoder as an empty payload via the
    // entry-point coalesce guard shared by every decode stage)
    import spark.implicits._
    val junk = Seq((1L, "notapng".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val q = Multimodal.resizeImages(junk, maxEdge = 16).collect()
    assert(q.length == 2 && q.forall(r => r.width == 0 && r.height == 0 &&
      r.payload.isEmpty))
    assert(Multimodal.decodeFeatures(junk).collect().length == 2)
  }

  test("watermark-bounded dedup: within-delay duplicates drop, expired-state duplicates re-emit") {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_wm_dedup")
    val watched = dir.resolve("in"); Files.createDirectories(watched)
    def at(h: Int, s: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:$s%02d")
    // one file per micro-batch, mod-times forcing the batch order
    def writeBatch(n: Int, rows: Seq[(String, java.sql.Timestamp)]): Unit = {
      val stage = dir.resolve(s"stage_$n")
      rows.toDF("k", "ts").coalesce(1).write.parquet(stage.toString)
      val listing = Files.list(stage)
      val part = try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
      val dest = watched.resolve(f"batch_$n%03d.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + n * 60000L))
    }
    // batch 0: A once, B twice (1s apart — inside the 10s delay)
    writeBatch(0, Seq(("A", at(0, 0)), ("B", at(0, 0)), ("B", at(0, 1))))
    // batch 1: C two hours later — advances the watermark far past
    // A's state expiry. The watermark a batch RUNS with comes from the
    // previous batch's data, and eviction runs at batch end — so one
    // advancing batch and one spacer batch must separate the original
    // from the late duplicate for the state to be provably gone.
    writeBatch(1, Seq(("C", at(2, 0))))
    // batch 2 (spacer): runs with the advanced watermark, evicts A
    writeBatch(2, Seq(("D", at(2, 1))))
    // batch 3: A again, AFTER its state expired
    writeBatch(3, Seq(("A", at(2, 2))))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.StringType)
      .add("ts", org.apache.spark.sql.types.TimestampType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watched.toString)
    val out = EventStreams.runToCompletion(spark,
      EventStreams.dedupStreamBounded(stream, "k", "ts", "10 seconds"),
      mode = "append").collect()
    val counts = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(counts("B") == 1, s"within-delay duplicate must drop: $counts")
    assert(counts("C") == 1 && counts("D") == 1)
    // the honest trade of time-bounded state, asserted: a duplicate
    // arriving after its key's state expired is re-emitted
    assert(counts("A") == 2, s"expired-state duplicate must re-emit: $counts")
  }

  test("streaming funnel: exactly-once stage hits across micro-batch splits") {
    // the state-machine guarantee the batch operator gets for free:
    // a user whose funnel spans TWO micro-batches must emit each
    // stage hit exactly once, and a click landing in a later batch
    // still checks against the first batch's view timestamp
    val watched = java.nio.file.Files.createTempDirectory("graft_funnel")
    def write(idx: Int, rows: Seq[(Long, Long, String)]): Unit = {
      import scala.jdk.CollectionConverters._
      val stage = java.nio.file.Files.createTempDirectory(s"graft_funnel_b$idx")
      rows.toDF("user_id", "ts", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val listing = java.nio.file.Files.list(stage)
      val part = try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
      // flat files at the watched root: nested dirs would read as
      // (non-)partition dirs, not as later files; mtime orders batches
      val dest = watched.resolve(f"batch_$idx%03d.parquet")
      java.nio.file.Files.move(part, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + idx * 60000L))
    }
    // user 1: view in batch 0, click+purchase in batch 1 (converts)
    // user 2: click BEFORE view (batch 0), view in batch 1 → stage 1 only
    // user 3: view twice across batches → ONE stage-1 hit
    write(0, Seq((1L, 100L, "view"), (2L, 100L, "click"), (3L, 100L, "view")))
    write(1, Seq((1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 200L, "view"), (3L, 200L, "view")))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", org.apache.spark.sql.types.LongType)
      .add("ts", org.apache.spark.sql.types.LongType)
      .add("event_type", org.apache.spark.sql.types.StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watched.toString)
    val hits = EventStreams.runToCompletion(spark,
      EventStreams.funnelStages(stream, "view", "click", "purchase"),
      mode = "append")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(hits.length == hits.distinct.length, s"duplicate stage hits: ${hits.toSeq}")
    val byUser = hits.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byUser(1L) == Seq(1, 2, 3), s"user 1 must fully convert: $byUser")
    assert(byUser(2L) == Seq(1), s"user 2's pre-view click must not count: $byUser")
    assert(byUser(3L) == Seq(1), s"repeat views emit one hit: $byUser")
  }

  test("streaming ingest commits micro-batches as segments") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_ingest").resolve("t").toString
    val rawSchema = Tables.rawEvents(spark, TestSpark.sf).schema
    val normSchema = Tables.events(spark, TestSpark.sf).schema
    val t = graft.table.SegmentedTable.create(spark, root, normSchema,
      Map("sort_columns" -> "ts"))
    val stream = Tables.normalizeEventTs(spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(TestSpark.sf))
    val q = EventStreams.streamIntoTable(stream, t)
    q.awaitTermination()
    val expected = spark.read.parquet(s"${TestSpark.sf}/events.parquet").count()
    assert(t.read().count() == expected)
    assert(t.showSegments().nonEmpty)
    assert(t.countFromCatalog == expected)
  }

  test("MP4 box walk: real round-trip fields, corrupt and truncated containers quarantine") {
    val docs = Seq((1L, "hello world", 42L), (2L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
    val metas = Multimodal.mp4Metadata(
      Multimodal.withMp4Payload(docs, "doc_id", "text", "n_chars"))
      .collect().map(m => m.id -> m).toMap
    // n_chars=42: timescale 600+2*60=720, duration 1000+42=1042,
    // width 16+42=58, height 16+294%240=70, mdat = 11 utf-8 bytes
    val m1 = metas(1L)
    assert(m1.timescale == 720 && m1.duration == 1042L)
    assert(m1.duration_ms == 1042L * 1000L / 720L)
    assert(m1.width == 58 && m1.height == 70)
    assert(m1.n_boxes == 3 && m1.mdat_bytes == 11L)
    // empty text: a zero-byte mdat still parses (size-8 payload)
    assert(metas(2L).mdat_bytes == 0L && metas(2L).timescale == 600)
    // corrupt payloads: wrong magic, truncated box, lying box size —
    // every structural violation quarantines to the all--1 row
    val good = Multimodal.withMp4Payload(
      Seq((9L, "x", 5L)).toDF("doc_id", "text", "n_chars"),
      "doc_id", "text", "n_chars").collect()(0).getAs[Array[Byte]]("payload")
    val lying = good.clone()
    lying(3) = 127.toByte // ftyp size claims beyond the file
    val corrupt = Seq(
      (10L, "not an mp4 at all".getBytes("UTF-8")),
      (11L, good.take(20)),        // truncated mid-moov
      (12L, lying),
      (13L, Array.emptyByteArray))
    val bad = Multimodal.mp4Metadata(corrupt.toDF("id", "payload"))
      .collect()
    assert(bad.length == 4 && bad.forall(m =>
      m.timescale == -1 && m.width == -1 && m.n_boxes == -1),
      bad.mkString(", "))
  }
}
