package graft.core

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec for the multimodal plane — no external libraries:
  * `javax.imageio` (PNG/BMP/JPEG readers/writers) ships with the JDK and
  * works headless. Audio/video remain stubbed in `Multimodal` (those codecs
  * genuinely are not in this container); images get true decode, feature
  * extraction, perceptual hashing, and resize.
  *
  * Everything is deterministic: pixel generation is seeded, resize is exact
  * integer area-averaging (no Graphics2D interpolation, which can vary by
  * JVM rendering pipeline). */
object ImageCodec {

  case class ImageFeatures(width: Int, height: Int,
                           meanR: Double, meanG: Double, meanB: Double,
                           aHash: Long)

  /** Deterministic synthetic PNG: seeded 8×8-block RGB field + fine noise.
    * Block-structured (not a shared gradient) so DIFFERENT seeds produce
    * genuinely different aHash bit patterns — a global gradient gave every
    * image nearly the same brighter-than-mean layout, which made 85% of all
    * pairs "near-dups" and degenerated the Hamming-join fixture. Planted
    * copies stay pixel-identical, so near-dup recall is still exercised. */
  def synthPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val cell = TextStats.mix64(seed ^ ((x / 8).toLong << 32) ^ (y / 8).toLong)
        val h = TextStats.mix64(seed ^ (x.toLong << 32) ^ y.toLong)
        val r = (((cell >>> 8) & 0xFF) + ((h >>> 8) & 0x0F)).toInt & 0xFF
        val g = (((cell >>> 16) & 0xFF) + ((h >>> 16) & 0x0F)).toInt & 0xFF
        val b = (((cell >>> 24) & 0xFF) + ((h >>> 24) & 0x0F)).toInt & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decode(payload: Array[Byte]): Option[BufferedImage] =
    Option(ImageIO.read(new ByteArrayInputStream(payload)))

  /** Exact integer area-average downsample to (w, h). */
  private def areaAverage(img: BufferedImage, w: Int, h: Int): Array[Array[(Long, Long, Long, Long)]] = {
    val grid = Array.fill(h, w)((0L, 0L, 0L, 0L))
    var y = 0
    while (y < img.getHeight) {
      val gy = math.min(h - 1, y * h / img.getHeight)
      var x = 0
      while (x < img.getWidth) {
        val gx = math.min(w - 1, x * w / img.getWidth)
        val rgb = img.getRGB(x, y)
        val (r, g, b, n) = grid(gy)(gx)
        grid(gy)(gx) = (r + ((rgb >> 16) & 0xFF), g + ((rgb >> 8) & 0xFF),
          b + (rgb & 0xFF), n + 1)
        x += 1
      }
      y += 1
    }
    grid
  }

  /** 64-bit average hash: 8×8 area-averaged luma, bit = cell ≥ mean.
    * Near-identical images land within a few bits — feeds the same
    * pigeonhole Hamming join as SimHash text near-dup. */
  def aHash(img: BufferedImage): Long = {
    val g = areaAverage(img, 8, 8)
    val luma = Array.tabulate(64) { i =>
      val (r, gg, b, n) = g(i / 8)(i % 8)
      if (n == 0) 0.0 else (0.299 * r + 0.587 * gg + 0.114 * b) / n
    }
    val mean = luma.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) { if (luma(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  def features(payload: Array[Byte]): Option[ImageFeatures] =
    decode(payload).map { img =>
      val n = img.getWidth.toLong * img.getHeight
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      ImageFeatures(img.getWidth, img.getHeight,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, aHash(img))
    }

  /** Real bounded-edge resize (area average), re-encoded as PNG.
    * Identity (no re-encode) when already within bounds. */
  def resizeMaxEdge(payload: Array[Byte], maxEdge: Int): Option[Array[Byte]] =
    decode(payload).map { img =>
      val longEdge = math.max(img.getWidth, img.getHeight)
      if (longEdge <= maxEdge) payload
      else {
        val scale = maxEdge.toDouble / longEdge
        val w = math.max(1, math.round(img.getWidth * scale).toInt)
        val h = math.max(1, math.round(img.getHeight * scale).toInt)
        val grid = areaAverage(img, w, h)
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b, n) = grid(y)(x)
            if (n > 0)
              out.setRGB(x, y, (((r / n).toInt & 0xFF) << 16) |
                (((g / n).toInt & 0xFF) << 8) | ((b / n).toInt & 0xFF))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
}
