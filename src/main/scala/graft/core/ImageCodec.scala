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
                           aHash: Long,
                           sumR: Long, sumG: Long, sumB: Long)

  /** Deterministic synthetic PNG: seeded 8×8-block RGB field + fine noise.
    * Block-structured (not a shared gradient) so DIFFERENT seeds produce
    * genuinely different aHash bit patterns — a global gradient gave every
    * image nearly the same brighter-than-mean layout, which made 85% of all
    * pairs "near-dups" and degenerated the Hamming-join fixture. Planted
    * copies stay pixel-identical, so near-dup recall is still exercised. */
  def synthPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val cell = TextStats.mix64(seed ^ ((x / 8).toLong << 32) ^ (y / 8).toLong)
        val h = TextStats.mix64(seed ^ (x.toLong << 32) ^ y.toLong)
        val r = (((cell >>> 8) & 0xFF) + ((h >>> 8) & 0x0F)).toInt & 0xFF
        val g = (((cell >>> 16) & 0xFF) + ((h >>> 16) & 0x0F)).toInt & 0xFF
        val b = (((cell >>> 24) & 0xFF) + ((h >>> 24) & 0x0F)).toInt & 0xFF
        rgb(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    encodePngStored(rgb, width, height)
  }

  /** Minimal PNG encoder with STORED (uncompressed) deflate blocks.
    *
    * Two properties the default `ImageIO.write` path cannot give:
    *  1. byte-determinism across JDK builds — the fixture bytes are a pure
    *     function of the pixels (no encoder-version drift);
    *  2. SQL-parsability — with BTYPE=0 blocks the scanline stream sits at
    *     fixed offsets inside the blob, so the DuckDB oracle can reconstruct
    *     pixels with arithmetic alone and cross-check the DECODE path.
    * Any PNG reader decodes it (stored blocks are core zlib). Layout: 8-byte
    * signature; IHDR (8-bit RGB, no interlace); ONE IDAT = 2-byte zlib
    * header + stored blocks of ≤65535 bytes + Adler-32; IEND. */
  def encodePngStored(rgb: Array[Int], width: Int, height: Int): Array[Byte] = {
    val raw = new Array[Byte](height * (1 + 3 * width))
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width)
      raw(base) = 0 // filter type None
      var x = 0
      while (x < width) {
        val p = rgb(y * width + x)
        raw(base + 1 + 3 * x) = ((p >> 16) & 0xFF).toByte
        raw(base + 2 + 3 * x) = ((p >> 8) & 0xFF).toByte
        raw(base + 3 + 3 * x) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
        ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, 2 /* RGB */, 0, 0, 0))
    val z = new ByteArrayOutputStream()
    z.write(0x78); z.write(0x01) // zlib header, fastest-compression hint
    var off = 0
    while (off < raw.length) {
      val len = math.min(65535, raw.length - off)
      val fin = if (off + len >= raw.length) 1 else 0
      z.write(fin) // BFINAL | BTYPE=00 (stored)
      z.write(len & 0xFF); z.write((len >>> 8) & 0xFF)
      z.write(~len & 0xFF); z.write((~len >>> 8) & 0xFF)
      z.write(raw, off, len)
      off += len
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    z.write(be32(adler.getValue.toInt))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** Corrupt-input contract (web-scale reality: right magic, broken body):
    * returns None instead of throwing, and rejects absurd dimensions via a
    * HEADER-ONLY reader probe (ImageReader.getWidth/getHeight decode no
    * pixels) BEFORE ImageIO.read can attempt the raster allocation a
    * 30-byte payload claiming 10^9×10^9 would trigger. Format-generic:
    * PNG, JPEG, BMP, GIF — whatever ImageIO registers. */
  def decode(payload: Array[Byte]): Option[BufferedImage] = {
    if (payload == null || payload.length == 0) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis)
          val (w, h) = (r.getWidth(0), r.getHeight(0)) // header fields only
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
        } finally r.dispose()
      } finally iis.close()
      Option(ImageIO.read(new ByteArrayInputStream(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact integer area-average downsample to (w, h): four flat long
    * accumulator arrays indexed gy*w+gx (sumR, sumG, sumB, count) — a
    * per-pixel boxed Tuple4 rewrite here allocated millions of objects per
    * decode on the hot mapPartitions path. */
  private final class AvgGrid(val w: Int, val h: Int) {
    val sumR = new Array[Long](w * h)
    val sumG = new Array[Long](w * h)
    val sumB = new Array[Long](w * h)
    val count = new Array[Long](w * h)
  }

  private def areaAverage(img: BufferedImage, w: Int, h: Int): AvgGrid = {
    val g = new AvgGrid(w, h)
    var y = 0
    while (y < img.getHeight) {
      val gy = math.min(h - 1, y * h / img.getHeight)
      var x = 0
      while (x < img.getWidth) {
        val gx = math.min(w - 1, x * w / img.getWidth)
        val rgb = img.getRGB(x, y)
        val i = gy * w + gx
        g.sumR(i) += (rgb >> 16) & 0xFF
        g.sumG(i) += (rgb >> 8) & 0xFF
        g.sumB(i) += rgb & 0xFF
        g.count(i) += 1
        x += 1
      }
      y += 1
    }
    g
  }

  /** 64-bit average hash: 8×8 area-averaged luma, bit = cell ≥ mean.
    * Near-identical images land within a few bits — feeds the same
    * pigeonhole Hamming join as SimHash text near-dup. */
  def aHash(img: BufferedImage): Long = {
    val g = areaAverage(img, 8, 8)
    val luma = Array.tabulate(64) { i =>
      val n = g.count(i)
      if (n == 0) 0.0
      else (0.299 * g.sumR(i) + 0.587 * g.sumG(i) + 0.114 * g.sumB(i)) / n
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
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, aHash(img),
        sr, sg, sb)
    }

  /** Real bounded-edge resize (area average), re-encoded via
    * [[encodePngStored]] — the module's byte-DETERMINISTIC encoder, so
    * resized payloads are stable across JDK builds and re-decodable by the
    * DuckDB stored-block CTE (ImageIO.write would guarantee neither).
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
        val rgb = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val n = grid.count(i)
          if (n > 0)
            rgb(i) = (((grid.sumR(i) / n).toInt & 0xFF) << 16) |
              (((grid.sumG(i) / n).toInt & 0xFF) << 8) |
              ((grid.sumB(i) / n).toInt & 0xFF)
          i += 1
        }
        encodePngStored(rgb, w, h)
      }
    }
}
