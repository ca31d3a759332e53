package graft.core

/** REAL audio codec for the multimodal plane — zero dependencies: WAV
  * (RIFF / PCM signed 16-bit little-endian) is a pure byte format, so both
  * encode and decode are plain arithmetic. This upgrades the audio modality
  * from the header-stub to a true decode path, the same way
  * [[ImageCodec]]'s stored-deflate PNGs did for images: the fixture blobs
  * are byte-deterministic and the DuckDB oracle re-decodes the SAME blobs
  * with byte arithmetic alone (fmt-chunk fields, int16 LE samples).
  *
  * Reference tie-in: the reference treats media as opaque files on disk
  * (e.g. the PDF corpus dir walk, `Mutiple_CIS_Pdfs.py:56-75`); the engine
  * treats them as opaque `binary` columns with typed metadata and real
  * per-partition batched decode (SURVEY §2.1 S1 binary-payload plane). */
object AudioCodec {

  /** All-integer features so the cross-engine compare is exact (no float
    * drift): energy is reported as raw sum |s| and sum s², zero crossings
    * are counted on channel 0 (sign change between consecutive frames,
    * zero counted as non-negative). */
  case class AudioFeatures(
      sampleRate: Int, channels: Int, nFrames: Int,
      sumAbs: Long, sumSq: Long, zeroCrossings: Int, peak: Int)

  /** Deterministic synthetic clip: integer triangle wave (seeded period and
    * amplitude) + seeded noise floor, interleaved per channel with a phase
    * offset. Pure function of (seed, params) — byte-identical across runs
    * and partitionings. */
  def synthSamples(seed: Long, nFrames: Int, channels: Int): Array[Short] = {
    val out = new Array[Short](nFrames * channels)
    val amp = 2000 + (TextStats.mix64(seed ^ 0x5EEDL) & 0xFFF).toInt      // 2000..6095
    val period = 40 + (TextStats.mix64(seed ^ 0xF00DL) & 0x3F).toInt     // 40..103
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val ph = (i + c * period / 4) % period
        val tri = math.abs(ph * 4 * amp / period - 2 * amp) - amp
        val noise = ((TextStats.mix64(seed ^ (i.toLong << 8) ^ c) >>> 16) % 401L - 200L).toInt
        out(i * channels + c) = (tri + noise).toShort
        c += 1
      }
      i += 1
    }
    out
  }

  /** Minimal canonical RIFF/WAVE writer: RIFF header, 16-byte PCM fmt
    * chunk, data chunk — nothing else, so the layout (and therefore the
    * oracle's byte offsets) is a pure function of the samples. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def synthWav(seed: Long, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] =
    encodeWavPcm16(synthSamples(seed, nFrames, channels), sampleRate, channels)

  /** Decoded clip: interleaved frames, `samples.length = nFrames * channels`. */
  case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Real decoder: walks RIFF chunks (skipping unknown ones — not just our
    * writer's fixed layout), requires PCM 16-bit. Undecodable → None
    * (corrupt-input policy: skip, count upstream). */
  def decode(payload: Array[Byte]): Option[Clip] = {
    if (payload == null || payload.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag4() != "RIFF") return None
    buf.getInt // riff size (trust actual buffer bounds instead)
    if (tag4() != "WAVE") return None
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[Array[Short]] = None
    while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
      val id = tag4()
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = buf.getShort
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          if (audioFormat != 1 || bits != 16 || channels <= 0 || rate <= 0) return None
          fmt = Some((rate, channels))
        case "data" =>
          val n = len / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = buf.getShort; i += 1 }
          data = Some(s)
        case _ => () // skip LIST/INFO/etc.
      }
      if (next > buf.limit()) return None
      buf.position(next)
    }
    for ((rate, ch) <- fmt; s <- data if s.length % ch == 0)
      yield Clip(rate, ch, s)
  }

  def features(payload: Array[Byte]): Option[AudioFeatures] =
    decode(payload).map { c =>
      var sumAbs = 0L; var sumSq = 0L; var peak = 0; var zc = 0
      var i = 0
      while (i < c.samples.length) {
        val v = c.samples(i).toInt
        val a = math.abs(v)
        sumAbs += a; sumSq += v.toLong * v
        if (a > peak) peak = a
        i += 1
      }
      val nFrames = c.samples.length / c.channels
      var f = 1
      while (f < nFrames) { // channel-0 sign changes; 0 counts as >= 0
        val prev = c.samples((f - 1) * c.channels) < 0
        val cur = c.samples(f * c.channels) < 0
        if (prev != cur) zc += 1
        f += 1
      }
      AudioFeatures(c.sampleRate, c.channels, nFrames, sumAbs, sumSq, zc, peak)
    }

  /** Real resample-down: keep every `factor`-th frame (all channels),
    * re-encode at `rate/factor` — the integer-exact decimation (no
    * interpolation filter, so the result is still oracle-checkable). */
  def decimate(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    // parameter bug ≠ undecodable payload: factor 0 would throw 'step
    // cannot be 0' from inside the range (escaping the None contract) and
    // a negative factor would silently emit empty WAVs
    require(factor >= 1, s"decimate factor must be >= 1, got $factor")
    decode(payload).map { c =>
      val nFrames = c.samples.length / c.channels
      val kept = (0 until nFrames by factor).toArray
      val out = new Array[Short](kept.length * c.channels)
      var j = 0
      while (j < kept.length) {
        var ch = 0
        while (ch < c.channels) {
          out(j * c.channels + ch) = c.samples(kept(j) * c.channels + ch)
          ch += 1
        }
        j += 1
      }
      encodeWavPcm16(out, math.max(1, c.sampleRate / factor), c.channels)
    }
  }
}
