package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media feature record (the output shape a real image/audio
  * decoder stage would produce per document).
  */
case class MediaFeatures(id: Long, byte_len: Int, width: Int, height: Int,
                         embedding: Array[Float])

/** Multimodal-column plumbing: images/audio/video travel as opaque
  * `binary` columns with typed metadata; decode/feature-extraction is
  * a batched per-partition stage.
  *
  * The decode boundary is REAL for PNG and baseline JPEG (still
  * images) and animated GIF (multi-frame video-style containers):
  * payloads carrying the signature go through `javax.imageio` (full
  * zlib/CRC-verified decode for PNG, real DCT decode for JPEG),
  * width/height come from the decoded raster — m02/m09 gate exactly
  * those fields — and GIF frame sampling seeks and decodes actual
  * frames. The feature-EXTRACTION model (the embedding) and
  * codecs the JVM lacks (exotic JPEG colorspaces, MP4/H.264) remain
  * deterministic stubs (no ML / media libraries in this container);
  * the batched mapPartitions shape (amortizing per-batch decoder
  * init, exactly how a JNI/GPU decoder is driven), partitioning, and
  * the typed Dataset output are the production contract either way.
  *
  * Scale: the payload column never shuffles — metadata extraction and
  * decode are narrow map stages; downstream aggregations group on
  * small derived columns only. Size `maxPartitionBytes` so one
  * partition of payloads fits the decoder's memory budget.
  */
object Multimodal {

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), PngSignature)

  /** Synthesize a REAL grayscale PNG per row: dimensions derive from
    * the `nCharsCol` metadata column (width = 1 + n % 64, height =
    * 1 + 7n % 64 — the rule an oracle can replay), pixels fill
    * cyclically from the text's utf-8 bytes. Batched mapPartitions
    * like every codec stage; the encoder runs per-row inside the
    * partition, never materializing it.
    *
    * ASCII-only synth contract (applies to every `with*Payload`
    * synthesizer here): the oracles replay the pixel/sample fill by
    * indexing CHARACTERS while the synth indexes UTF-8 BYTES — the
    * two agree only when every character is one byte, i.e. ASCII
    * text, which the driver-generated documents corpus guarantees.
    * The GEOMETRY rules (width/height/frames/samples from n_chars)
    * are encoding-independent. For a non-ASCII corpus, switch the
    * fill to a byte-count column or make the oracle index bytes.
    */
  def withPngPayload(df: DataFrame, idCol: String, textCol: String,
                     nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val w = (1 + nChars % 64).toInt
        val h = (1 + (nChars * 7) % 64).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          val v = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
          raster.setSample(i % w, i / w, 0, v)
          i += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      }).toDF("id", "payload")
  }

  private def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** Synthesize a REAL baseline JPEG per row (the dominant real-world
    * image codec — `javax.imageio` encodes and decodes it natively):
    * dimensions derive from the `nCharsCol` metadata column
    * (width = 1 + n % 56, height = 1 + 11n % 56 — a rule an oracle
    * can replay), pixels fill cyclically from the text's utf-8 bytes.
    * JPEG is LOSSY, so unlike the PNG path only the GEOMETRY is
    * oracle-replayable — pixel content survives decode only
    * approximately, which is exactly the real-world contract. Batched
    * mapPartitions like every codec stage.
    */
  def withJpegPayload(df: DataFrame, idCol: String, textCol: String,
                      nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val w = (1 + nChars % 56).toInt
        val h = (1 + (nChars * 11) % 56).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          val v = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
          raster.setSample(i % w, i / w, 0, v)
          i += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        (id, out.toByteArray)
      }).toDF("id", "payload")
  }

  /** Attach an opaque binary payload + typed metadata struct.
    * (In production the payload IS the stored bytes; here it is the
    * utf-8 text so the pipeline has real bytes to carry.)
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(textCol)).as("byte_len")).as("meta"))

  /** Decoder for one batch of payloads. PNG and JPEG payloads
    * (signature sniffed: PNG magic / SOI marker) are REALLY decoded
    * via `javax.imageio` — width/height come from the decoded raster;
    * a payload that claims a codec but fails to decode falls back to
    * the stub path (quarantine-lite: real pipelines route these to a
    * reject sink; the row must not kill the batch). Other payloads and
    * the 8-dim embedding remain
    * the deterministic md5 STUB (no media/ML libraries in this
    * container; md5 of zero bytes is well-defined, so empty payloads
    * decode instead of crashing). The per-batch MessageDigest models
    * the decoder-init-per-batch cost this batching amortizes.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      md.reset()
      val b = md.digest(bytes)
      val emb = Array.tabulate(8)(i => (b(i + 2) & 0xff) / 255.0f)
      val decoded: Option[(Int, Int)] =
        if (!isPng(bytes) && !isJpeg(bytes)) None
        else try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
            .map(img => (img.getWidth, img.getHeight))
        } catch {
          // a corrupt body can throw far more than IOException from
          // inside the codec (NegativeArraySize from a crafted IHDR,
          // IllegalArgument from the raster) — any decode failure
          // quarantines to the fallback, it must not kill the batch
          case scala.util.control.NonFatal(_) => None
        }
      val (w, h) = decoded.getOrElse(
        (64 + ((b(0) & 0xff) % 192), 64 + ((b(1) & 0xff) % 192)))
      MediaFeatures(id, bytes.length, w, h, emb)
    }
  }

  /** Batched decode / feature-extraction over the payload column.
    * `batchSize` models the decoder's optimal batch (GPU batch, codec
    * reuse); per-partition iteration never materializes the partition.
    */
  def decodeFeatures(df: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
  }

  /** One perceptual image fingerprint: decoded dims plus the 64-bit
    * difference hash split into two unsigned 32-bit halves (hi = grid
    * rows 0–3, lo = rows 4–7) so neither engine ever needs the sign
    * bit. (-1, -1) marks a quarantined (undecodable) payload.
    */
  case class PerceptualHash(id: Long, width: Int, height: Int,
                            dh_hi: Long, dh_lo: Long)

  /** Perceptual difference-hash (dHash) over the payload column — the
    * image leg of the dedup family (near-identical rasters collide,
    * distinct content does not). The hash is PURE INTEGER over the
    * DECODED raster, so for a lossless codec an oracle replays it
    * from the synthesis rule end-to-end:
    *
    *  - sample a 9×8 point grid: v(gy, gx) = band-0 sample at
    *    (gx·w/9, gy·h/8), integer floor division (multi-band images
    *    fingerprint band 0; the decode stage upstream normalizes) —
    *    point sampling, not box averaging, so the rule is exactly
    *    replayable with no rounding contract;
    *  - bit (gy, gx in 0..7) set iff v(gy, gx+1) > v(gy, gx) — the
    *    horizontal gradient signs, robust to uniform brightness and
    *    scale shifts, the classic dHash property;
    *  - packed row-major: dh_hi = rows 0–3 (32 bits), dh_lo =
    *    rows 4–7.
    *
    * Decode is REAL (javax.imageio, PNG/JPEG sniffed like
    * [[decodeFeatures]]); a payload that fails to decode quarantines
    * to (0, 0, -1, -1) — the reject-sink shape, and
    * [[graft.dedup.Dedup.phashPairs]] excludes quarantined rows so
    * they can never pair with each other. Batched mapPartitions at
    * the JVM codec boundary like every stage here.
    */
  def perceptualHashes(df: DataFrame,
                       batchSize: Int = 64): Dataset[PerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        val decoded =
          if (!isPng(bytes) && !isJpeg(bytes)) None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case None => PerceptualHash(id, 0, 0, -1L, -1L)
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            val v = Array.tabulate(8, 9)((gy, gx) =>
              raster.getSample(gx * w / 9, gy * h / 8, 0))
            var hi = 0L
            var lo = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (v(gy)(gx + 1) > v(gy)(gx)) {
                  if (gy < 4) hi |= 1L << (gy * 8 + gx)
                  else lo |= 1L << ((gy - 4) * 8 + gx)
                }
                gx += 1
              }
              gy += 1
            }
            PerceptualHash(id, w, h, hi, lo)
        }
      }))
  }

  /** One resized image: the re-encoded payload plus its decoded dims. */
  case class ResizedImage(id: Long, payload: Array[Byte],
                          width: Int, height: Int)

  /** Aspect-preserving image RESIZE to fit a `maxEdge` box — the
    * normalization step every vision-training pipeline runs before
    * batching. Target dimensions are pure INTEGER math so an oracle
    * can replay them (`nw = max(1, w·maxEdge / max(w,h))` with floor
    * division; images already inside the box pass through unscaled —
    * never upscale); the resampling itself is real work on the
    * decoded raster (Graphics2D bilinear draw into the target
    * raster), and the output is re-encoded as a genuine PNG, so a
    * downstream decode sees the resized dims only if the whole
    * decode → scale → encode chain held together.
    *
    * Batched mapPartitions at the JVM codec boundary like every stage
    * here; a payload that fails to decode quarantines to a
    * zero-dimension row with an EMPTY payload (the reject-sink shape
    * — it must not kill the batch).
    */
  def resizeImages(df: DataFrame, maxEdge: Int,
                   batchSize: Int = 64): Dataset[ResizedImage] = {
    require(maxEdge >= 1, s"maxEdge must be positive, got $maxEdge")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        val decoded =
          if (bytes == null || !isPng(bytes)) None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case None => ResizedImage(id, Array.emptyByteArray, 0, 0)
          case Some(img) =>
            val (w0, h0) = (img.getWidth, img.getHeight)
            val m = math.max(w0, h0)
            if (m <= maxEdge) ResizedImage(id, bytes, w0, h0)
            else {
              // integer floor division — the oracle-replayable rule
              val nw = math.max(1, w0 * maxEdge / m)
              val nh = math.max(1, h0 * maxEdge / m)
              val out = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedImage(id, bos.toByteArray, nw, nh)
            }
        }
      }))
  }

  /** One sampled frame of a video payload. */
  case class FrameSample(id: Long, frame_idx: Int, frame_w: Int,
                         frame_h: Int, frame_fp: Long)

  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && {
      val h = new String(bytes, 0, 6, "US-ASCII")
      h == "GIF87a" || h == "GIF89a"
    }

  /** REAL frame sampling for one multi-frame container format the JVM
    * decodes natively: animated GIF. The reader seeks `nFrames`
    * evenly-spaced frame indices and fully decodes each one —
    * width/height come from the decoded raster and the fingerprint is
    * a rolling hash over its pixels, so the output is a function of
    * the actual video content, exactly what a seek-and-decode MP4
    * sampler produces. None on any decode failure (quarantine to the
    * stub path — a corrupt container must not kill the batch).
    */
  private def sampleGifFrames(id: Long, bytes: Array[Byte],
                              nFrames: Int): Option[Seq[FrameSample]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val count = reader.getNumImages(true)
            if (count <= 0) None
            else Some((0 until nFrames).map { i =>
              val idx = math.min((i.toLong * count / nFrames).toInt, count - 1)
              val img = reader.read(idx)
              val raster = img.getRaster
              var fp = 1125899906842597L // large prime seed
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  fp = fp * 31 + raster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              FrameSample(id, i, img.getWidth, img.getHeight, fp)
            })
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampler for one batch. GIF payloads (signature sniffed) go
    * through the REAL seek-and-decode path ([[sampleGifFrames]]);
    * other container formats (MP4/H.264 etc. — no codecs in this
    * container) fall back to the deterministic md5 STUB the oracle can
    * replay. Same batched shape as [[decodeBatch]] (decoder init
    * amortized per batch, one output row per frame).
    */
  private def sampleBatch(batch: Seq[(Long, Array[Byte])],
                          nFrames: Int): Seq[FrameSample] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.flatMap { case (id, bytes) =>
      val real =
        if (isGif(bytes)) sampleGifFrames(id, bytes, nFrames) else None
      real.getOrElse((0 until nFrames).map { i =>
        md.reset()
        md.update(bytes)
        md.update(s"#$i".getBytes("UTF-8"))
        val b = md.digest()
        val fp = (0 until 8).map(j => (j + 1).toLong * (b(j + 2) & 0xff)).sum
        FrameSample(id, i, 64 + ((b(0) & 0xff) % 192),
          64 + ((b(1) & 0xff) % 192), fp)
      })
    }
  }

  /** Synthesize a REAL animated GIF per row (the multi-frame companion
    * of [[withPngPayload]]): 2 + n_chars % 5 grayscale frames of
    * (1 + n % 48) × (1 + 7n % 48), pixels cyclically from the text's
    * utf-8 bytes with a per-frame shift so consecutive frames differ.
    * Encoded through ImageIO's GIF sequence writer — a genuine
    * multi-frame container on the wire.
    */
  def withGifPayload(df: DataFrame, idCol: String, textCol: String,
                     nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val w = (1 + nChars % 48).toInt
        val h = (1 + (nChars * 7) % 48).toInt
        val frames = (2 + nChars % 5).toInt
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          (0 until frames).foreach { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var i = 0
            while (i < w * h) {
              val v = if (bytes.isEmpty) (f * 17) % 256
                      else bytes((i + f) % bytes.length) & 0xff
              raster.setSample(i % w, i / w, 0, v)
              i += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
        } finally {
          writer.dispose()
          ios.close()
        }
        (id, out.toByteArray)
      }).toDF("id", "payload")
  }

  /** Frame sampling over a video-payload column: each payload expands
    * to `nFrames` rows. A narrow flatMap — the payload bytes are read
    * once per partition and never shuffle; only the small frame rows
    * flow downstream.
    */
  def sampleFrames(df: DataFrame, nFrames: Int = 4,
                   batchSize: Int = 64): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(sampleBatch(_, nFrames)))
  }

  /** Decoded-audio feature record (what a real audio ingest stage
    * emits per clip): sample rate and frame count from the decoded
    * header, amplitude sum from the decoded PCM stream.
    */
  case class AudioFeatures(id: Long, byte_len: Int, sample_rate: Int,
                           n_samples: Long, amp_sum: Long)

  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** Synthesize a REAL WAV container per row (the audio companion of
    * [[withPngPayload]]): unsigned 8-bit mono PCM, sample rate
    * 8000 + (n % 8)·1000 Hz, 500 + n % 1000 samples filled
    * cyclically from the text's utf-8 bytes — rules an oracle can
    * replay. Encoded through javax.sound's WAVE writer, so a genuine
    * RIFF/WAVE container travels in the binary column.
    */
  def withWavPayload(df: DataFrame, idCol: String, textCol: String,
                     nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val rate = (8000 + (nChars % 8) * 1000).toInt
        val nSamples = (500 + nChars % 1000).toInt
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        val pcm = Array.tabulate[Byte](nSamples)(i =>
          if (bytes.isEmpty) 0 else bytes(i % bytes.length))
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 8, 1, false, false) // 8-bit unsigned mono PCM
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray)
      }).toDF("id", "payload")
  }

  /** Per-channel decoded-audio record for multi-channel PCM (the
    * stereo companion of [[AudioFeatures]]): per-channel amplitude
    * sums prove the decoder deinterleaved frames and assembled
    * little-endian 16-bit samples correctly — a byte-order or
    * channel-offset mistake corrupts one sum without touching the
    * header fields.
    */
  case class StereoAudioFeatures(id: Long, byte_len: Int, sample_rate: Int,
                                 n_frames: Long, amp_l: Long, amp_r: Long)

  /** Synthesize a REAL stereo WAV container per row: SIGNED 16-bit
    * little-endian 2-channel PCM — the profile the mono decode path
    * documents as quarantined — with rate 8000 + (n % 8)·1000 Hz and
    * 300 + n % 500 frames. Channel samples derive from the text's
    * utf-8 bytes by replayable rules (left_i = 3·b_i + 7, right_i =
    * 1000 − 2·b_i, b cyclic, 0 for empty text), so the oracle can
    * recompute both channel sums without decoding anything.
    */
  def withStereoWavPayload(df: DataFrame, idCol: String, textCol: String,
                           nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val rate = (8000 + (nChars % 8) * 1000).toInt
        val nFrames = (300 + nChars % 500).toInt
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        def b(i: Int): Int = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
        val pcm = new Array[Byte](nFrames * 4) // 2 ch × 2 bytes, LE
        var i = 0
        while (i < nFrames) {
          val l = 3 * b(i) + 7
          val r = 1000 - 2 * b(i)
          pcm(4 * i) = (l & 0xff).toByte
          pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
          pcm(4 * i + 2) = (r & 0xff).toByte
          pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 2, true, false) // 16-bit signed stereo LE PCM
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray)
      }).toDF("id", "payload")
  }

  /** Batched stereo decode: signed 16-bit LE 2-channel WAVs through
    * `javax.sound.sampled`, frames deinterleaved into per-channel
    * amplitude sums. Any other profile (or a corrupt container)
    * quarantines to the deterministic md5 stub, mirroring
    * [[decodeAudioBatch]]'s contract.
    */
  private def decodeStereoBatch(
      batch: Seq[(Long, Array[Byte])]): Seq[StereoAudioFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      val real: Option[StereoAudioFeatures] =
        if (!isWav(bytes)) None
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            val supported = fmt.getSampleSizeInBits == 16 &&
              fmt.getChannels == 2 && !fmt.isBigEndian &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            if (!supported) None
            else {
              // read whole frames: 4 bytes = [L lo, L hi, R lo, R hi]
              val buf = new Array[Byte](4096)
              var ampL = 0L
              var ampR = 0L
              var frames = 0L
              var carry = new Array[Byte](0)
              var n = ais.read(buf)
              while (n > 0) {
                val data = carry ++ buf.take(n)
                val whole = data.length - data.length % 4
                var i = 0
                while (i < whole) {
                  ampL += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
                  ampR += ((data(i + 2) & 0xff) | (data(i + 3) << 8)).toShort
                  i += 4
                }
                frames += whole / 4
                carry = data.drop(whole)
                n = ais.read(buf)
              }
              Some(StereoAudioFeatures(id, bytes.length,
                fmt.getSampleRate.toInt, frames, ampL, ampR))
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      real.getOrElse {
        md.reset()
        val b = md.digest(bytes)
        StereoAudioFeatures(id, bytes.length,
          8000 + ((b(0) & 0xff) % 8) * 1000,
          (b(1) & 0xff).toLong, (b(2) & 0xff).toLong, (b(3) & 0xff).toLong)
      }
    }
  }

  /** Batched stereo-audio decode over the payload column — same
    * narrow mapPartitions contract as [[decodeAudioFeatures]].
    */
  def decodeStereoFeatures(df: DataFrame,
                           batchSize: Int = 64): Dataset[StereoAudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeStereoBatch))
  }

  /** One perceptual AUDIO fingerprint (the audio twin of
    * [[PerceptualHash]]): decoded header fields plus the 64-bit
    * energy-envelope sign hash as two unsigned 32-bit halves.
    * (-1, -1) marks a quarantined (undecodable / unsupported-profile)
    * payload.
    */
  case class AudioFingerprint(id: Long, sample_rate: Int, n_samples: Long,
                              af_hi: Long, af_lo: Long)

  /** Perceptual audio fingerprint over the payload column — the audio
    * leg of the dedup family (re-encoded / trivially-shifted copies of
    * a clip collide, distinct content does not). A simplified
    * Chromaprint-shaped envelope hash (PAPERS.md acoustic-fingerprint
    * family), PURE INTEGER over the decoded PCM stream so the
    * lossless-WAV oracle replays it decode→frame→hash end-to-end:
    *
    *  - split the n-sample stream into 65 frames: frame k covers
    *    samples [k·n/65, (k+1)·n/65), integer floor division — the
    *    same replayable boundary rule as the dHash point grid;
    *  - frame energy e_k = Σ s² over the frame (8-bit unsigned
    *    samples, so energies are small exact integers);
    *  - bit b (0..63) set iff e_{b+1} > e_b — the energy-envelope
    *    gradient signs, robust to uniform gain exactly as dHash is to
    *    brightness;
    *  - packed: af_hi = bits 0–31, af_lo = bits 32–63.
    *
    * Decode is REAL (`javax.sound.sampled`, RIFF/WAVE sniffed, 8-bit
    * unsigned mono PCM profile — the [[walkMonoPcm]] contract); any
    * other profile, a corrupt container, or a stream whose actual
    * sample count disagrees with its header quarantines to
    * (0, 0, -1, -1) — the reject-sink shape, and
    * [[graft.dedup.Dedup.phashPairs]] (shared with the image leg)
    * excludes quarantined rows so they can never pair. Batched
    * mapPartitions at the JVM codec boundary like every stage here.
    */
  def audioFingerprints(df: DataFrame,
                        batchSize: Int = 64): Dataset[AudioFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        audioFingerprintOne(bytes) match {
          case None => AudioFingerprint(id, 0, 0L, -1L, -1L)
          case Some((rate, n, hi, lo)) => AudioFingerprint(id, rate, n, hi, lo)
        }
      }))
  }

  private def audioFingerprintOne(
      bytes: Array[Byte]): Option[(Int, Long, Long, Long)] =
    if (!isWav(bytes)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val supported = fmt.getSampleSizeInBits == 8 &&
          fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val n = ais.getFrameLength
        if (!supported || n <= 0) None
        else {
          // frame boundaries from the header length; a stream that
          // yields a different sample count than its header claims
          // would silently shift every boundary — quarantine instead
          val e = new Array[Long](65)
          val buf = new Array[Byte](4096)
          var i = 0L
          var k = 0
          var next = n / 65 // end (exclusive) of frame 0
          var read = ais.read(buf)
          while (read > 0) {
            var j = 0
            while (j < read) {
              while (i >= next && k < 64) { k += 1; next = (k + 1) * n / 65 }
              val v = (buf(j) & 0xff).toLong
              e(k) += v * v
              i += 1
              j += 1
            }
            read = ais.read(buf)
          }
          if (i != n) None
          else {
            var hi = 0L
            var lo = 0L
            var b = 0
            while (b < 64) {
              if (e(b + 1) > e(b)) {
                if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
              }
              b += 1
            }
            Some((fmt.getSampleRate.toInt, n, hi, lo))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One resampled clip: the re-encoded payload plus its decoded
    * header fields. Empty payload + zero fields marks a quarantined
    * input (the [[resizeImages]] reject-sink shape).
    */
  case class ResampledAudio(id: Long, payload: Array[Byte],
                            sample_rate: Int, n_samples: Long)

  /** Audio RESAMPLE by integer decimation — the audio twin of
    * [[resizeImages]]: the normalization step an audio-training
    * pipeline runs to unify sample rates before batching. The output
    * keeps every `factor`-th decoded sample (output j = input
    * j·factor, so n_out = ceil(n/factor) and rate_out = rate/factor —
    * pure integer rules an oracle replays), and is re-encoded as a
    * genuine 8-bit mono WAV, so a downstream decode sees the new
    * header only if the whole decode → decimate → encode chain held.
    * No anti-alias filter — decimation IS the oracle-replayable
    * contract here, exactly as the bilinear resize pins integer
    * target dims; a production resampler swaps the kernel without
    * touching the plumbing.
    *
    * Batched mapPartitions at the JVM codec boundary; a non-WAV /
    * corrupt / profile-mismatched payload quarantines to the empty
    * row (it must not kill the batch).
    */
  def resampleAudio(df: DataFrame, factor: Int,
                    batchSize: Int = 64): Dataset[ResampledAudio] = {
    require(factor >= 1, s"factor must be positive, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        decodeMonoPcmBytes(bytes) match {
          case None => ResampledAudio(id, Array.emptyByteArray, 0, 0L)
          case Some((rate, pcm)) =>
            val nOut = (pcm.length + factor - 1) / factor
            val out = Array.tabulate[Byte](nOut)(j => pcm(j * factor))
            val fmt = new javax.sound.sampled.AudioFormat(
              (rate / factor).toFloat, 8, 1, false, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(out), fmt, nOut.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            ResampledAudio(id, bos.toByteArray, rate / factor, nOut.toLong)
        }
      }))
  }

  /** Fully decode an 8-bit unsigned mono PCM WAV to its raw sample
    * bytes (the profile contract of [[walkMonoPcm]]); None ⇒
    * quarantine. Payload-sized allocation — a clip's samples are
    * bounded by the payload already held in memory.
    */
  private def decodeMonoPcmBytes(
      bytes: Array[Byte]): Option[(Int, Array[Byte])] =
    if (!isWav(bytes)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val supported = fmt.getSampleSizeInBits == 8 &&
          fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!supported) None
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = ais.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = ais.read(buf) }
          Some((fmt.getSampleRate.toInt, bos.toByteArray))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One-pass folds over a decoded 8-bit unsigned mono PCM stream —
    * the SINGLE stream walk behind both m05 (amplitude) and m08
    * (quality stats), so the supported-profile predicate, buffer loop,
    * and quarantine behavior can never drift between the two gates.
    */
  private case class MonoPcmFolds(sampleRate: Int, frames: Long,
                                  ampSum: Long, sqSum: Long, peak: Long,
                                  tv: Long)

  /** WAV payloads (RIFF/WAVE sniffed) go through `javax.sound.sampled`
    * — sample rate and frame count from the parsed header, every fold
    * from reading the decoded PCM stream end to end (with the
    * previous sample carried across read-buffer boundaries for the
    * total-variation term). None ⇒ quarantine: not a WAV, a decode
    * error, or a profile other than 8-bit unsigned mono (a valid WAV
    * in a float or 16-bit-stereo profile — the latter routes through
    * decodeStereoBatch — would decode without error here but fold
    * meaningless byte halves).
    */
  private def walkMonoPcm(bytes: Array[Byte]): Option[MonoPcmFolds] =
    if (!isWav(bytes)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val supported = fmt.getSampleSizeInBits == 8 &&
          fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!supported) None
        else {
          val buf = new Array[Byte](4096)
          var amp = 0L; var sq = 0L; var peak = 0L; var tv = 0L
          var frames = 0L; var prev = -1L
          var n = ais.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) {
              val v = (buf(i) & 0xff).toLong
              amp += v
              sq += v * v
              if (v > peak) peak = v
              if (prev >= 0) tv += math.abs(v - prev)
              prev = v
              i += 1
            }
            frames += n
            n = ais.read(buf)
          }
          Some(MonoPcmFolds(fmt.getSampleRate.toInt, frames, amp, sq, peak, tv))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched REAL audio decode (m05's amplitude view of
    * [[walkMonoPcm]]). A corrupt container quarantines to the
    * deterministic md5 stub (it must not kill the batch), which also
    * covers codecs the JVM lacks (MP3/AAC — no media libraries in
    * this container).
    */
  private def decodeAudioBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      walkMonoPcm(bytes) match {
        case Some(f) =>
          AudioFeatures(id, bytes.length, f.sampleRate, f.frames, f.ampSum)
        case None =>
          md.reset()
          val b = md.digest(bytes)
          AudioFeatures(id, bytes.length, 8000 + ((b(0) & 0xff) % 8) * 1000,
            (b(1) & 0xff).toLong, (b(2) & 0xff).toLong)
      }
    }
  }

  /** Batched audio decode over the payload column — same narrow
    * mapPartitions contract as [[decodeFeatures]].
    */
  def decodeAudioFeatures(df: DataFrame,
                          batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeAudioBatch))
  }

  /** Decoded-audio QUALITY record (the loudness/clipping/roughness
    * screen an audio-curation pipeline runs per clip): energy as the
    * sum of squared samples (the RMS numerator — integer, so exact),
    * peak amplitude, and total variation Σ|s_i − s_{i−1}| (signal
    * roughness; silence and constant DC score 0). All integers over
    * the decoded 8-bit unsigned PCM stream.
    */
  case class AudioStats(id: Long, byte_len: Int, sample_rate: Int,
                        n_samples: Long, sq_sum: Long, peak: Long, tv: Long)

  /** Batched audio-quality decode — m08's energy/peak/total-variation
    * view of the same [[walkMonoPcm]] stream walk (shared profile
    * predicate and quarantine behavior by construction).
    */
  private def decodeAudioStatsBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioStats] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      walkMonoPcm(bytes) match {
        case Some(f) =>
          AudioStats(id, bytes.length, f.sampleRate, f.frames,
            f.sqSum, f.peak, f.tv)
        case None =>
          md.reset()
          val b = md.digest(bytes)
          AudioStats(id, bytes.length, 8000 + ((b(0) & 0xff) % 8) * 1000,
            (b(1) & 0xff).toLong, (b(2) & 0xff).toLong, (b(3) & 0xff).toLong,
            (b(4) & 0xff).toLong)
      }
    }
  }

  /** Batched audio-quality stats over the payload column — same
    * narrow mapPartitions contract as [[decodeAudioFeatures]].
    */
  def decodeAudioStats(df: DataFrame,
                       batchSize: Int = 64): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeAudioStatsBatch))
  }

  // ---- MP4 / ISO-BMFF container metadata (m14) ----------------------

  /** Parsed MP4 container metadata: movie timescale/duration from
    * mvhd, presentation geometry from tkhd (16.16 fixed point),
    * top-level box count, mdat payload size. duration_ms is the
    * integer millisecond conversion a catalog stores.
    */
  case class Mp4Meta(id: Long, timescale: Int, duration: Long,
                     duration_ms: Long, width: Int, height: Int,
                     n_boxes: Int, mdat_bytes: Long)

  private def bmffBox(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length)
    bb.put(tpe.getBytes("US-ASCII"))
    bb.put(payload)
    bb.array()
  }

  private val UnityMatrix: Array[Int] =
    Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

  /** Synthesize a REAL minimal ISO-BMFF (MP4) container per row:
    * `ftyp` + `moov(mvhd, trak(tkhd))` + `mdat`, all fields
    * big-endian per ISO/IEC 14496-12 version-0 boxes. Movie fields
    * derive from n_chars (timescale = 600 + (n%10)·60, duration =
    * 1000 + n%5000, geometry 16+n%320 × 16+7n%240) and the mdat
    * carries the text's UTF-8 bytes — so a correct PARSE of the real
    * container replays the generation rule, the m09/m04 discipline.
    * Frame DATA is not encoded: the JVM has no H.264 codec, and per
    * the multimodal contract the sample decode stays a stub
    * ([[sampleBatch]]); the container walk is the real part.
    */
  def withMp4Payload(df: DataFrame, idCol: String, textCol: String,
                     nCharsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol),
        col(nCharsCol).cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val timescale = (600 + (nChars % 10) * 60).toInt
        val duration = (1000 + nChars % 5000).toInt
        val w = (16 + nChars % 320).toInt
        val h = (16 + (nChars * 7) % 240).toInt
        val ftyp = {
          val bb = java.nio.ByteBuffer.allocate(16)
          bb.put("isom".getBytes("US-ASCII")); bb.putInt(0x200)
          bb.put("isom".getBytes("US-ASCII")); bb.put("mp41".getBytes("US-ASCII"))
          bmffBox("ftyp", bb.array())
        }
        val mvhd = {
          val bb = java.nio.ByteBuffer.allocate(100)
          bb.putInt(0)          // version 0 + flags
          bb.putInt(0); bb.putInt(0) // creation / modification
          bb.putInt(timescale); bb.putInt(duration)
          bb.putInt(0x00010000) // rate 1.0
          bb.putShort(0x0100.toShort) // volume 1.0
          bb.position(bb.position() + 10) // reserved
          UnityMatrix.foreach(bb.putInt)
          bb.position(bb.position() + 24) // pre_defined
          bb.putInt(2)          // next_track_ID
          bmffBox("mvhd", bb.array())
        }
        val tkhd = {
          val bb = java.nio.ByteBuffer.allocate(84)
          bb.putInt(7)          // version 0 + flags: enabled|in-movie|in-preview
          bb.putInt(0); bb.putInt(0)
          bb.putInt(1)          // track_ID
          bb.putInt(0)          // reserved
          bb.putInt(duration)
          bb.position(bb.position() + 8) // reserved
          bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
          UnityMatrix.foreach(bb.putInt)
          bb.putInt(w << 16); bb.putInt(h << 16) // 16.16 fixed
          bmffBox("tkhd", bb.array())
        }
        val moov = bmffBox("moov", mvhd ++ bmffBox("trak", tkhd))
        val mdat = bmffBox("mdat",
          Option(text).getOrElse("").getBytes("UTF-8"))
        (id, ftyp ++ moov ++ mdat)
      }).toDF("id", "payload")
  }

  private def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && new String(bytes, 4, 4, "US-ASCII") == "ftyp"

  /** Real recursive box walk over one container. None on any
    * structural violation (short box, size overrun, missing movie
    * header) — quarantine, never a crash.
    */
  private def parseMp4One(id: Long, bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      if (!isMp4(bytes)) None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        var nTop = 0
        var timescale = -1
        var duration = -1L
        var w = -1
        var h = -1
        var mdat = -1L
        def walk(start: Int, end: Int, depth: Int): Unit = {
          var o = start
          while (o < end) {
            if (o + 8 > end) throw new IllegalStateException("short box header")
            val size = bb.getInt(o)
            if (size < 8 || o + size > end)
              throw new IllegalStateException(s"bad box size $size at $o")
            val tpe = new String(bytes, o + 4, 4, "US-ASCII")
            if (depth == 0) nTop += 1
            tpe match {
              case "moov" | "trak" => walk(o + 8, o + size, depth + 1)
              case "mvhd" =>
                timescale = bb.getInt(o + 8 + 12)
                duration = bb.getInt(o + 8 + 16).toLong & 0xffffffffL
              case "tkhd" =>
                w = bb.getInt(o + 8 + 76) >>> 16
                h = bb.getInt(o + 8 + 80) >>> 16
              case "mdat" => mdat = (size - 8).toLong
              case _ => ()
            }
            o += size
          }
        }
        walk(0, bytes.length, 0)
        if (timescale <= 0 || duration < 0 || w < 0 || h < 0) None
        else Some(Mp4Meta(id, timescale, duration,
          duration * 1000L / timescale, w, h, nTop, mdat))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batched MP4 metadata extraction — the m14 operator: a genuine
    * ISO-BMFF box walk per container (big-endian sizes, nested
    * moov/trak recursion, 16.16 geometry), corrupt containers
    * quarantined to the all--1 row, same batching discipline as
    * [[decodeFeatures]].
    */
  def mp4Metadata(df: DataFrame, batchSize: Int = 64): Dataset[Mp4Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), coalesce(col("payload"),
      lit(Array.emptyByteArray)).as("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        parseMp4One(id, bytes).getOrElse(
          Mp4Meta(id, -1, -1L, -1L, -1, -1, -1, -1L))
      }))
  }

  /** End-to-end: payload attach → batched decode → per-source feature
    * aggregation (the typical training-data curation rollup).
    */
  def featureStats(docs: DataFrame): DataFrame = {
    val withSrc = withPayload(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
    val feats = decodeFeatures(withSrc.select("id", "payload"))
    feats.join(withSrc.select(col("id"), col("source")), "id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len").cast("long")).as("total_bytes"),
        max(col("width")).as("max_width"))
  }
}
