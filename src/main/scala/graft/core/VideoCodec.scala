package graft.core

/** REAL video codec for the multimodal plane — zero dependencies: Y4M
  * (YUV4MPEG2) is an uncompressed public container with a plain-ASCII
  * header (`YUV4MPEG2 W.. H.. F..:.. Ip A1:1 C444\n`) followed by
  * `FRAME\n` + raw 8-bit planes per frame. With C444 every plane is
  * width*height bytes, so decode is pure arithmetic — like
  * [[AudioCodec]]'s WAV and [[ImageCodec]]'s stored-deflate PNG, the
  * fixture blobs can be re-decoded by the DuckDB oracle with byte math
  * alone (header scan to first 0x0A, fixed-stride frame blocks).
  *
  * Only C444 is supported (444 keeps plane strides uniform; the synth
  * fixtures and the oracle both use it). Anything else → None. */
object VideoCodec {

  case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                   /** per frame: Y, U, V planes, each width*height bytes */
                   frames: Array[Array[Array[Byte]]])

  /** All-integer decode features: total/per-frame luma sums and the
    * inter-frame motion proxy sum_f sum_px |Y_f - Y_{f-1}|. */
  case class VideoFeatures(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                           nFrames: Int, lumaSum: Long, motionSum: Long)

  private val Magic = "YUV4MPEG2"
  private val FrameMarker = "FRAME\n".getBytes("US-ASCII")

  /** Deterministic synthetic clip: seeded block texture that SCROLLS one
    * pixel per frame (so the motion metric is non-trivial and frames are
    * near- but not exactly-equal), plus seeded chroma fields. */
  def synthY4m(seed: Long, width: Int, height: Int, nFrames: Int,
               fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { f =>
      val y = Array.tabulate(width * height) { i =>
        val px = i % width; val py = i / width
        val cell = TextStats.mix64(seed ^ (((px + f) / 4).toLong << 32) ^ (py / 4).toLong)
        val fine = TextStats.mix64(seed ^ ((px + f).toLong << 32) ^ py.toLong)
        ((((cell >>> 8) & 0xF0) + ((fine >>> 8) & 0x0F)).toInt & 0xFF).toByte
      }
      val u = Array.tabulate(width * height)(i =>
        ((TextStats.mix64(seed ^ 0xAAL ^ (i.toLong << 4) ^ f) >>> 8) & 0xFF).toByte)
      val v = Array.tabulate(width * height)(i =>
        ((TextStats.mix64(seed ^ 0xBBL ^ (i.toLong << 4) ^ f) >>> 8) & 0xFF).toByte)
      Array(y, u, v)
    }
    encodeY4m(Video(width, height, fpsNum, fpsDen, frames))
  }

  def encodeY4m(v: Video): Array[Byte] = {
    val header = s"$Magic W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val planeLen = v.width * v.height
    val out = new java.io.ByteArrayOutputStream(
      header.length + v.frames.length * (FrameMarker.length + 3 * planeLen))
    out.write(header)
    v.frames.foreach { f =>
      out.write(FrameMarker)
      f.foreach(out.write)
    }
    out.toByteArray
  }

  /** Real decoder: ASCII header parse (tagged params in any order, unknown
    * X-tags skipped), then fixed-stride frame walk. Truncated payloads,
    * non-C444 chroma, or bad frame markers → None. */
  def decode(payload: Array[Byte]): Option[Video] = {
    if (payload == null) return None
    val nl = payload.indexOf('\n'.toByte)
    if (nl < Magic.length) return None
    val header = new String(payload, 0, nl, "US-ASCII")
    val parts = header.split(' ')
    if (parts.head != Magic) return None
    var w = -1; var h = -1; var fn = 25; var fd = 1; var chroma = "420"
    parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
        case 'F' => p.drop(1).split(':') match {
          case Array(a, b) =>
            // malformed/non-positive rates REJECT like bad W/H (a silent
            // 25:1 fallback would mask a corrupt header, and fd=0 would
            // divide-by-zero any downstream duration math)
            fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
          case _ => fn = -1; fd = -1
        }
        case 'C' => chroma = p.drop(1)
        case _ => () // I (interlace), A (aspect), X (extensions)
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || chroma != "444") return None
    // overflow guard: crafted W/H headers must not wrap w*h into a zero or
    // negative stride (ArithmeticException / NegativeArraySizeException)
    if (w.toLong * h > Int.MaxValue / 8) return None
    val planeLen = w * h
    val stride = FrameMarker.length + 3 * planeLen
    val bodyLen = payload.length - (nl + 1)
    if (bodyLen < 0 || bodyLen % stride != 0) return None
    val nFrames = bodyLen / stride
    // validate the cheap 6-byte FRAME markers BEFORE materializing any
    // plane copies: garbage with a stride-multiple length must not cost
    // payload-sized allocation just to be rejected
    val markersOk = (0 until nFrames).forall { f =>
      val base = nl + 1 + f * stride
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, base, base + FrameMarker.length),
        FrameMarker)
    }
    if (!markersOk) return None
    val frames = Array.tabulate(nFrames) { f =>
      val base = nl + 1 + f * stride
      Array.tabulate(3)(p => java.util.Arrays.copyOfRange(
        payload, base + FrameMarker.length + p * planeLen,
        base + FrameMarker.length + (p + 1) * planeLen))
    }
    Some(Video(w, h, fn, fd, frames))
  }

  def features(payload: Array[Byte]): Option[VideoFeatures] =
    decode(payload).map { v =>
      var luma = 0L; var motion = 0L
      var f = 0
      while (f < v.frames.length) {
        val y = v.frames(f)(0)
        var i = 0
        while (i < y.length) {
          luma += y(i) & 0xFF
          if (f > 0) motion += math.abs((y(i) & 0xFF) - (v.frames(f - 1)(0)(i) & 0xFF))
          i += 1
        }
        f += 1
      }
      VideoFeatures(v.width, v.height, v.fpsNum, v.fpsDen, v.frames.length, luma, motion)
    }

  /** Per-frame luma sum of every `stride`-th frame — the real frame-sample
    * stage (the stub only planned indices; this touches pixels). */
  def sampleFrameLuma(payload: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    require(stride >= 1, s"frame-sample stride must be >= 1, got $stride")
    decode(payload).toSeq.flatMap { v =>
      (0 until v.frames.length by stride).map { f =>
        val y = v.frames(f)(0)
        var s = 0L; var i = 0
        while (i < y.length) { s += y(i) & 0xFF; i += 1 }
        (f, s)
      }
    }
  }

  /** Real frame extract → grayscale PNG via [[ImageCodec]]'s stored-deflate
    * encoder (thumbnail path: a video frame becomes an image-plane payload,
    * composable with the image near-dup / resize operators). */
  def frameToPng(payload: Array[Byte], frameIdx: Int): Option[Array[Byte]] =
    decode(payload).flatMap { v =>
      if (frameIdx < 0 || frameIdx >= v.frames.length) None
      else {
        val y = v.frames(frameIdx)(0)
        val rgb = Array.tabulate(v.width * v.height) { i =>
          val g = y(i) & 0xFF; (g << 16) | (g << 8) | g
        }
        Some(ImageCodec.encodePngStored(rgb, v.width, v.height))
      }
    }
}
