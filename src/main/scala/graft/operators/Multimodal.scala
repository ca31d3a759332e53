package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per partition in bounded batches.
  *
  * IMAGES are handled by a REAL codec (`graft.core.ImageCodec` on JDK
  * javax.imageio — PNG decode, channel-mean features, 64-bit perceptual
  * aHash, exact area-average resize re-encoded to PNG). AUDIO/VIDEO codec
  * work remains STUBBED (those libs genuinely are not in this container):
  * `decodeStub` derives deterministic fake features from the payload header
  * bytes. Everything around the stub — schema, partitioning, batch shape,
  * the mapPartitions plumbing a real decoder slots into — is identical to
  * the real image path and tested. */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Deterministic synthetic media table (payload = seeded pseudo-bytes with a
    * parseable fake header: [w:2][h:2][frames:2]...). */
  def synth(spark: SparkSession, n: Long, parallelism: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism).map { i =>
      val r = new java.util.Random(0xBEEF ^ i)
      val w = 16 + r.nextInt(1024)
      val h = 16 + r.nextInt(1024)
      val f = 1 + r.nextInt(64)
      val body = new Array[Byte](32 + r.nextInt(480))
      r.nextBytes(body)
      val header = Array[Byte](
        (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
        (f >> 8).toByte, f.toByte)
      MediaRow(i, Seq("image", "audio", "video")((i % 3).toInt), header ++ body)
    }
  }

  /** ??? in spirit: the stubbed decode. Parses the fake header + rolls a
    * checksum — stands in for a real image/audio decode, same signature. */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val p = m.payload
    def u16(i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
    var cs = 0L
    var i = 0
    while (i < p.length) { cs = cs * 131L + (p(i) & 0xFF); i += 1 }
    MediaFeatures(m.media_id, m.modality, p.length, u16(0), u16(2),
      if (m.modality == "video") u16(4) else 1, cs)
  }

  /** Feature extraction: per-partition batched decode (batch size bounds the
    * decoded-payload working set, the real constraint for codecs). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map(decodeStub)))
  }

  /** "Resize" stage: recomputes metadata for a bounded-edge resize — payload
    * untouched (stub), metadata math real. */
  def resizePlan(features: Dataset[MediaFeatures], maxEdge: Int): DataFrame =
    features.toDF.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxEdge, 1.0)
          .otherwise(lit(maxEdge).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video rows: every `stride`-th frame index. */
  def frameSamplePlan(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF.filter(col("modality") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
      .withColumn("n_sampled", size(col("sampled_frames")))

  // ---- REAL image plane (javax.imageio is in the JDK — no external libs;
  // only audio/video remain stubbed above) ---------------------------------

  case class ImageRow(media_id: Long, payload: Array[Byte])
  case class ImageFeatureRow(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, ahash: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic synthetic table of REAL PNG payloads. Every `dupEvery`-th
    * image is a pixel-identical copy of its predecessor (near-dup fixture). */
  def synthImages(spark: SparkSession, n: Long, dupEvery: Int = 10,
                  parallelism: Int = 8): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism).map { i =>
      val iv: Long = i
      val src: Long = if (dupEvery > 0 && iv % dupEvery == dupEvery - 1) iv - 1 else iv
      val r = new java.util.Random(0xC0FFEEL ^ src)
      ImageRow(iv, graft.core.ImageCodec.synthPng(src, 24 + r.nextInt(200), 24 + r.nextInt(200)))
    }
  }

  /** True decode + feature extraction (dimensions, channel means, 64-bit
    * average hash), batched per partition like the stub path. Undecodable
    * payloads are dropped (corrupt-input policy: skip, count upstream). */
  def extractImageFeatures(images: Dataset[ImageRow], batchSize: Int = 64): Dataset[ImageFeatureRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      graft.core.ImageCodec.features(row.payload).map(f =>
        ImageFeatureRow(row.media_id, f.width, f.height,
          f.meanR, f.meanG, f.meanB, f.aHash, f.sumR, f.sumG, f.sumB))
    }))
  }

  /** True bounded-edge resize: payload bytes out are a real re-encoded PNG. */
  def resizeImages(images: Dataset[ImageRow], maxEdge: Int): Dataset[ImageRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.flatMap { row =>
      graft.core.ImageCodec.resizeMaxEdge(row.payload, maxEdge)
        .map(b => ImageRow(row.media_id, b))
    })
  }

  /** Image near-dup: perceptual aHash + the same pigeonhole Hamming join as
    * SimHash text near-dup (exact recall within maxHamming). */
  def imageNearDup(features: Dataset[ImageFeatureRow], maxHamming: Int = 4): DataFrame =
    Dedup.hammingNearDup(
      features.toDF.select(col("media_id").as("id"), col("ahash").as("sim")),
      maxHamming)
}
