package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per partition in bounded batches.
  *
  * The actual codec work is STUBBED (no image/audio libs in this container):
  * `decodeStub` derives deterministic fake features from the payload header
  * bytes. Everything around it — schema, partitioning, batch shape, the
  * mapPartitions plumbing a real decoder would slot into — is real and tested.
  * On a real cluster the stub body is replaced by the codec call; the Spark
  * side (binary column in, struct column out, per-partition batching, no
  * driver involvement) is unchanged. */
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
}
