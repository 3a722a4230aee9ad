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
  * The decode itself is a STUB (no image/audio libraries in this
  * container): [[decodeBatch]] derives deterministic fake features
  * from the bytes. Everything around it — the schema contract, the
  * batched mapPartitions shape (amortizing per-batch decoder init,
  * exactly how a JNI/GPU decoder is driven), partitioning, and the
  * typed Dataset output — is real and tested, so swapping in a real
  * decoder changes only the function body.
  *
  * Scale: the payload column never shuffles — metadata extraction and
  * decode are narrow map stages; downstream aggregations group on
  * small derived columns only. Size `maxPartitionBytes` so one
  * partition of payloads fits the decoder's memory budget.
  */
object Multimodal {

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

  /** STUB decoder for one batch of payloads. Deterministic fake:
    * dimensions and an 8-dim embedding derived from the md5 digest of
    * the payload bytes (well-defined for EMPTY payloads too — md5 of
    * zero bytes is the standard d41d8... digest, so a document with
    * empty text decodes instead of crashing). The per-batch
    * MessageDigest instance models the real decoder-init-per-batch
    * cost this batching exists to amortize. Replace the body with a
    * real codec call (e.g. JNI libjpeg / ffmpeg) — the signature is
    * the real contract.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (id, bytes) =>
      md.reset()
      val b = md.digest(bytes)
      val emb = Array.tabulate(8)(i => (b(i + 2) & 0xff) / 255.0f)
      MediaFeatures(id, bytes.length,
        64 + ((b(0) & 0xff) % 192), 64 + ((b(1) & 0xff) % 192), emb)
    }
  }

  /** Batched decode / feature-extraction over the payload column.
    * `batchSize` models the decoder's optimal batch (GPU batch, codec
    * reuse); per-partition iteration never materializes the partition.
    */
  def decodeFeatures(df: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
  }

  /** One sampled frame of a (stub-decoded) video payload. */
  case class FrameSample(id: Long, frame_idx: Int, frame_w: Int,
                         frame_h: Int, frame_fp: Long)

  /** STUB frame sampler for one batch: a real implementation seeks the
    * container to `nFrames` evenly-spaced timestamps and decodes one
    * frame each; the stub derives each frame deterministically from
    * md5(payload ++ "#idx") so the oracle can reproduce it. Same
    * batched shape as [[decodeBatch]] (decoder init amortized per
    * batch, one output row per frame).
    */
  private def sampleBatch(batch: Seq[(Long, Array[Byte])],
                          nFrames: Int): Seq[FrameSample] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.flatMap { case (id, bytes) =>
      (0 until nFrames).map { i =>
        md.reset()
        md.update(bytes)
        md.update(s"#$i".getBytes("UTF-8"))
        val b = md.digest()
        val fp = (0 until 8).map(j => (j + 1).toLong * (b(j + 2) & 0xff)).sum
        FrameSample(id, i, 64 + ((b(0) & 0xff) % 192),
          64 + ((b(1) & 0xff) % 192), fp)
      }
    }
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
    df.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(sampleBatch(_, nFrames)))
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
