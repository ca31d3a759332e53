package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per partition in bounded batches.
  *
  * ALL THREE modalities have REAL codecs, zero external dependencies:
  * images via `graft.core.ImageCodec` (JDK javax.imageio PNG decode +
  * stored-deflate encoder), audio via `graft.core.AudioCodec` (WAV =
  * RIFF/PCM16, pure byte arithmetic), video via `graft.core.VideoCodec`
  * (Y4M = YUV4MPEG2 C444, ASCII header + raw planes). `decodeStub` below
  * is retained as the generic opaque-payload plumbing exemplar (the shape
  * a black-box third-party codec slots into) and for the fake-header
  * fixture query; the typed planes underneath it do true decode work. */
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

  // ---- REAL audio plane (WAV = RIFF/PCM16, pure byte arithmetic — see
  // graft.core.AudioCodec; nothing stubbed) --------------------------------

  case class AudioRow(media_id: Long, payload: Array[Byte])
  case class AudioFeatureRow(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Int, sum_abs: Long, sum_sq: Long, zero_crossings: Int, peak: Int)

  /** Deterministic synthetic table of REAL WAV payloads (varied rate /
    * length / channel count). */
  def synthAudio(spark: SparkSession, n: Long, parallelism: Int = 8): Dataset[AudioRow] = {
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100)
    spark.range(0, n, 1, parallelism).map { i =>
      val r = new java.util.Random(0xACEDL ^ i)
      AudioRow(i, graft.core.AudioCodec.synthWav(
        seed = 0xACEDL ^ i,
        sampleRate = rates(r.nextInt(rates.length)),
        nFrames = 400 + r.nextInt(2600),
        channels = 1 + r.nextInt(2)))
    }
  }

  /** True WAV decode + all-integer features, batched per partition like the
    * image path. Undecodable payloads dropped (skip-and-count policy). */
  def extractAudioFeatures(audio: Dataset[AudioRow], batchSize: Int = 64): Dataset[AudioFeatureRow] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      graft.core.AudioCodec.features(row.payload).map(f =>
        AudioFeatureRow(row.media_id, f.sampleRate, f.channels, f.nFrames,
          f.sumAbs, f.sumSq, f.zeroCrossings, f.peak))
    }))
  }

  /** Real resample-down (integer decimation): payload bytes out are a real
    * re-encoded WAV at rate/factor. */
  def resampleAudio(audio: Dataset[AudioRow], factor: Int): Dataset[AudioRow] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.flatMap { row =>
      graft.core.AudioCodec.decimate(row.payload, factor).map(b => AudioRow(row.media_id, b))
    })
  }

  // ---- REAL video plane (Y4M = YUV4MPEG2 C444, ASCII header + raw planes —
  // see graft.core.VideoCodec; nothing stubbed) ----------------------------

  case class VideoRow(media_id: Long, payload: Array[Byte])
  case class VideoFeatureRow(media_id: Long, width: Int, height: Int,
      fps_num: Int, fps_den: Int, n_frames: Int, luma_sum: Long, motion_sum: Long)

  /** Deterministic synthetic table of REAL Y4M payloads (scrolling seeded
    * texture, so inter-frame motion is non-trivial). */
  def synthVideos(spark: SparkSession, n: Long, parallelism: Int = 8): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism).map { i =>
      val r = new java.util.Random(0xD1DE0L ^ i)
      VideoRow(i, graft.core.VideoCodec.synthY4m(
        seed = 0xD1DE0L ^ i,
        width = 8 + r.nextInt(17),
        height = 8 + r.nextInt(17),
        nFrames = 2 + r.nextInt(9),
        fpsNum = Seq(24, 25, 30)(r.nextInt(3))))
    }
  }

  /** True Y4M decode + all-integer features (dims, fps, frame count, total
    * luma, inter-frame motion), batched per partition. */
  def extractVideoFeatures(videos: Dataset[VideoRow], batchSize: Int = 16): Dataset[VideoFeatureRow] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { row =>
      graft.core.VideoCodec.features(row.payload).map(f =>
        VideoFeatureRow(row.media_id, f.width, f.height, f.fpsNum, f.fpsDen,
          f.nFrames, f.lumaSum, f.motionSum))
    }))
  }

  /** Real frame sampling: every `stride`-th frame's luma sum, one output row
    * per sampled frame (pixels touched, not just indices planned). */
  def sampleVideoFrames(videos: Dataset[VideoRow], stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos.flatMap { row =>
      graft.core.VideoCodec.sampleFrameLuma(row.payload, stride)
        .map { case (f, s) => (row.media_id, f, s) }
    }.toDF("media_id", "frame_idx", "frame_luma")
  }

  /** Thumbnail extract: frame 0 → grayscale stored-deflate PNG, feeding the
    * image plane (features / aHash near-dup / resize compose directly). */
  def videoThumbnails(videos: Dataset[VideoRow], frameIdx: Int = 0): Dataset[ImageRow] = {
    import videos.sparkSession.implicits._
    videos.mapPartitions(_.flatMap { row =>
      graft.core.VideoCodec.frameToPng(row.payload, frameIdx)
        .map(b => ImageRow(row.media_id, b))
    })
  }

  /** Container sniffing over opaque binary payloads by magic bytes — the
    * routing step in front of the typed decode planes when upstream storage
    * loses (or lies about) the modality column. Pure column expression over
    * the first 12 bytes (binary `substring` + `hex` + a `when` chain, all
    * codegen'd): the payload itself is never copied or shipped, no UDF, no
    * shuffle. Recognizes this engine's three container formats plus
    * PDF/HTML text payloads; everything else is `application/octet-stream`. */
  def sniffMime(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val magic = upper(hex(substring(col(payloadCol), 1, 12)))
    df.select(col(idCol), magic.as("magic24"),
      when(magic.startsWith("89504E47"), "image/png")
        .when(magic.startsWith("52494646") &&
          substring(magic, 17, 8) === "57415645", "audio/x-wav")
        .when(magic.startsWith("595556344D50454732"), "video/x-y4m")
        .when(magic.startsWith("255044462D"), "application/pdf")
        .when(magic.startsWith("3C21444F43") || magic.startsWith("3C68746D6C") ||
          magic.startsWith("3C48544D4C"), "text/html")
        .otherwise("application/octet-stream").as("mime"))
  }
}
