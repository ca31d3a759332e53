package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.{ImageCodec, PyStr, RuleFsm, TextStats}

/** Property-based pins for the hand-rolled kernels the whole engine leans
  * on — each checked against an independent straightforward model over
  * generated (not fixture) inputs. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val anyString: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf('a', 'Z', '0', '\n', '\t', '-', '.', ' ', ' ',
      '', ' ', '中', 'é', ':', '|')).map(_.mkString),
    1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))

  test("RuleFsm.scrub == java.util.regex char-class model on arbitrary strings") {
    check(Prop.forAll(anyString, Gen.oneOf(true, false)) { (s, dot) =>
      val cls = if (dot) "[^a-zA-Z0-9\\n.-]+" else "[^a-zA-Z0-9\\n-]+"
      val viaRegex = java.util.regex.Pattern.compile(cls).matcher(s).replaceAll(" ")
      RuleFsm.scrub(s, dot) == viaRegex
    })
  }

  test("PyStr.strip == drop-ends-while-isPySpace model; idempotent; substring of input") {
    check(Prop.forAll(anyString) { s =>
      val t = PyStr.strip(s)
      // model without .reverse: StringBuilder.reverse is surrogate-PAIR
      // aware, so reverse∘reverse is NOT the identity on ill-formed char
      // sequences (a lone low surrogate followed by a high one gets
      // "repaired" into pair order) — the generator emits arbitrary chars,
      // and the old reverse-based model mutated exactly those inputs
      val noLead = s.dropWhile(PyStr.isPySpace)
      val model = noLead.take(noLead.lastIndexWhere(c => !PyStr.isPySpace(c)) + 1)
      t == model && PyStr.strip(t) == t && s.contains(t)
    })
  }

  test("WordGrams/WordWindows kernels == naive split-slice models on arbitrary strings") {
    import graft.expressions.TextHashExpressions.{WordGrams, WordWindows}
    def strs(a: Array[AnyRef]): Seq[String] = a.toSeq.map(_.toString)
    // generator biased toward space-rich text (the kernels' whole subject).
    // The anyString arm is normalized through a UTF8String round-trip: a
    // Spark STRING column can only hold well-formed UTF-8 (ingestion
    // sanitizes lone surrogates to U+FFFD), and the kernels' output arrays
    // pass through UTF8String — comparing raw ill-formed JVM strings would
    // test a value no column can contain
    val spacey: Gen[String] = Gen.frequency(
      4 -> Gen.listOf(Gen.oneOf("a", "bb", "", " ", "  ", "\t", "\n", "中", "x y"))
        .map(_.mkString(" ")),
      1 -> anyString.map(s =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s).toString))
    check(Prop.forAll(spacey, Gen.choose(1, 6)) { (s, n) =>
      val toks = s.split(" ", -1)
      val model =
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      strs(WordGrams.compute(s, n)) == model
    })
    check(Prop.forAll(spacey, Gen.choose(1, 6), Gen.choose(1, 6)) { (s, a, b) =>
      val (chunk, stride) = (math.max(a, b), math.min(a, b))
      val toks = s.split(" ", -1)
      val nStarts = if (toks.length > chunk)
        ((toks.length - chunk) + stride - 1) / stride + 1 else 1
      val model = (0 until nStarts).map(i =>
        toks.slice(i * stride, math.min(i * stride + chunk, toks.length)).mkString(" "))
      strs(WordWindows.compute(s, chunk, stride)) == model
    })
  }

  test("CmsRankPrefix == sort-by-(estimate, token) model; prefix bound exact-ppm") {
    import graft.expressions.TextHashExpressions.CmsRankPrefix
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val depth = 4; val width = 64
    val stateGen = Gen.listOfN(depth * width, Gen.choose(0L, 1000L)).map(_.toArray)
    val thGen = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    val tppmGen = Gen.oneOf(1L, 350000L, 600000L, 999999L, 1000000L)
    check(Prop.forAll(thGen, tppmGen, stateGen) { (th, tppm, state) =>
      val sz = th.length
      val got = CmsRankPrefix.compute(
        new GenericArrayData(th.toArray), tppm, state, depth, width)
      val plen = math.min(sz.toLong,
        sz - (tppm * sz + 999999L) / 1000000L + 1L).toInt
      def est(t: Long) = TextStats.cmsEstimateFromState(t.toString, state, depth, width)
      val model =
        if (sz == 0) Seq.empty[Long]
        else if (plen >= sz) th
        else th.sortBy(t => (est(t), t)).take(plen)
      got.toSeq == model
    }, n = 200)
  }

  test("encodePngStored round-trips arbitrary pixels through ImageIO decode") {
    val dims = for { w <- Gen.choose(1, 90); h <- Gen.choose(1, 90) } yield (w, h)
    check(Prop.forAll(dims, Gen.long) { case ((w, h), seed) =>
      val rgb = Array.tabulate(w * h)(i => (TextStats.mix64(seed ^ i) & 0xFFFFFF).toInt)
      val img = ImageCodec.decode(ImageCodec.encodePngStored(rgb, w, h)).get
      img.getWidth == w && img.getHeight == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          (img.getRGB(x, y) & 0xFFFFFF) == rgb(y * w + x)))
    }, n = 60)
  }

  test("WAV encode/decode round-trips arbitrary PCM16 payloads") {
    val params = for {
      n <- Gen.choose(1, 400)
      ch <- Gen.choose(1, 4)
      rate <- Gen.oneOf(8000, 11025, 44100, 96000)
    } yield (n, ch, rate)
    check(Prop.forAll(params, Gen.long) { case ((n, ch, rate), seed) =>
      val samples = Array.tabulate(n * ch)(i => TextStats.mix64(seed ^ i).toShort)
      val clip = graft.core.AudioCodec.decode(
        graft.core.AudioCodec.encodeWavPcm16(samples, rate, ch)).get
      clip.sampleRate == rate && clip.channels == ch &&
        clip.samples.toSeq == samples.toSeq
    }, n = 120)
  }

  test("Y4M encode/decode round-trips arbitrary frame planes") {
    val params = for {
      w <- Gen.choose(1, 32); h <- Gen.choose(1, 32); f <- Gen.choose(1, 6)
    } yield (w, h, f)
    check(Prop.forAll(params, Gen.long) { case ((w, h, nf), seed) =>
      val frames = Array.tabulate(nf, 3, w * h)((f, p, i) =>
        TextStats.mix64(seed ^ (f.toLong << 40) ^ (p.toLong << 32) ^ i).toByte)
      val v = graft.core.VideoCodec.Video(w, h, 30, 1, frames)
      val back = graft.core.VideoCodec.decode(graft.core.VideoCodec.encodeY4m(v)).get
      back.width == w && back.height == h && back.frames.length == nf &&
        back.frames.flatten.map(_.toSeq).toSeq == frames.flatten.map(_.toSeq).toSeq
    }, n = 80)
  }

  test("repetitionStats == naive model (token multiset / line char accounting)") {
    val texty = Gen.listOf(Gen.oneOf("a b", "a", "b c d", "\n", " ", "x y x y",
      "l1\nl1", "w w w", "tab\t")).map(_.mkString(" "))
    check(Prop.forAll(texty) { s =>
      def trimSp(x: String) = x.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val lt = trimSp(s.toLowerCase)
      // ONE tokenization convention: Python str.split() semantics — split
      // on \s+ runs, empty tokens dropped (kernel + columns + oracles)
      val toks = if (lt.isEmpty) Array.empty[String]
                 else lt.split("\\s+").filter(_.nonEmpty)
      def dup(n: Int): Long =
        if (toks.length < n) 0L
        else {
          val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
          math.floor((grams.size - grams.distinct.size).toDouble / grams.size * 1e6).toLong
        }
      val lines = s.split("\n", -1).map(trimSp).filter(_.nonEmpty)
      val tot = lines.map(_.length.toLong).sum
      val d = lines.filter(l => lines.count(_ == l) > 1).map(_.length.toLong).sum
      val dl = if (tot == 0) 0L else math.floor(d.toDouble / tot * 1e6).toLong
      TextStats.repetitionStats(s).toSeq == Seq(dup(2), dup(3), dl)
    })
  }

  test("pigeonhole bands: any pair within maxHamming shares at least one band key") {
    val gen = for {
      a <- Gen.long
      maxH <- Gen.choose(1, 7)
      flips <- Gen.choose(0, 7)
      bits <- Gen.listOfN(flips, Gen.choose(0, 63))
    } yield (a, bits.foldLeft(a)((v, b) => v ^ (1L << b)), maxH)
    def bandKeys(sim: Long, maxH: Int): Seq[Long] = {
      val bands = maxH + 1
      val width = 64 / bands
      (0 until bands).map { b =>
        val shifted = sim >>> (b * width)
        if (b == bands - 1) shifted else shifted & ((1L << width) - 1)
      }
    }
    check(Prop.forAll(gen) { case (a, b, maxH) =>
      val ham = java.lang.Long.bitCount(a ^ b)
      ham > maxH || bandKeys(a, maxH).zip(bandKeys(b, maxH)).exists(p => p._1 == p._2)
    })
  }

  test("bloomPositions/bloomContains: distinct in-range probes, no false negatives, monotone under OR-union") {
    val gen = for {
      logM <- Gen.choose(6, 20)
      k <- Gen.choose(1, 64)
      fps <- Gen.nonEmptyListOf(Gen.long)
      probe <- Gen.long
    } yield (1 << logM, k, fps, probe)
    check(Prop.forAll(gen) { case (m, k, fps, probe) =>
      // k positions always distinct and in [0, m) for EVERY fingerprint
      val allDistinct = (probe :: fps).forall { fp =>
        val ps = TextStats.bloomPositions(fp, m, k)
        ps.length == k && ps.distinct.length == k && ps.forall(p => p >= 0 && p < m)
      }
      val words = new Array[Long](m >> 6)
      fps.foreach(fp => TextStats.bloomPositions(fp, m, k).foreach(p =>
        words((p >> 6).toInt) |= 1L << (p & 63).toInt))
      // no false negatives: every inserted fp is contained
      val noFalseNeg = fps.forall(fp => TextStats.bloomContains(fp, words, m, k))
      // union monotone: OR-ing in more bits can never flip contains to false
      val more = words.clone()
      TextStats.bloomPositions(probe, m, k).foreach(p =>
        more((p >> 6).toInt) |= 1L << (p & 63).toInt)
      val monotone = TextStats.bloomContains(probe, more, m, k) &&
        fps.forall(fp => TextStats.bloomContains(fp, more, m, k))
      allDistinct && noFalseNeg && monotone
    })
  }

  test("ImageCodec.decode stays format-generic: JPEG/BMP pass the header dim gate") {
    // regression: the corrupt-input dim gate must probe dimensions via the
    // format's OWN reader, not assume a PNG IHDR at fixed offsets
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xFF8040)
    for (fmt <- Seq("jpg", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"ImageIO lacks $fmt writer")
      val back = ImageCodec.decode(bos.toByteArray)
      assert(back.exists(b => b.getWidth == 5 && b.getHeight == 3), s"$fmt rejected")
    }
    // corrupt and degenerate inputs still degrade to None, never throw
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode("not an image at all".getBytes("UTF-8")).isEmpty)
  }

  test("TopicModel.foldInTheta (sparse ascending-w kernel) == dense full-vocab model") {
    import graft.operators.TopicModel
    val word: Gen[String] = Gen.oneOf("pasta", "orbit", "basil", "rocket",
      "olive", "stage", "garlic", "fuel", "xx", "yy")
    val doc: Gen[String] = Gen.listOf(word).map(_.mkString(" "))
    val params = for {
      docs <- Gen.listOfN(6, doc); k <- Gen.choose(1, 6)
      iters <- Gen.choose(0, 4); id <- Gen.choose(-5L, 500L); target <- doc
    } yield (docs, k, iters, id, target)
    check(Prop.forAll(params) { case (docs, k, iters, id, target) =>
      val sample = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toArray
      val (vocab, _, phi) = TopicModel.fitPlsa(sample, k, 1 max iters)
      val widx = vocab.zipWithIndex.toMap
      val got = TopicModel.foldInTheta(id, target, widx, phi, k, iters)
      // dense model: full-vocab counts, ascending-w loop over nonzero terms
      val n = new Array[Double](vocab.length)
      "\\w\\w+".r.findAllIn(target.toLowerCase).foreach(t => widx.get(t).foreach(n(_) += 1.0))
      var th = Array.tabulate(k)(z => 1.0 + ((id * 31 + z * 17) % 97).toDouble / 1000.0)
      val s0 = th.sum; th = th.map(_ / s0)
      for (_ <- 0 until iters) {
        val tN = new Array[Double](k)
        for (w <- vocab.indices if n(w) != 0.0) {
          var den = 0.0; var z = 0
          while (z < k) { den += th(z) * phi(z)(w); z += 1 }
          z = 0
          while (z < k) { tN(z) += n(w) * th(z) * phi(z)(w) / den; z += 1 }
        }
        val s = tN.sum
        if (s != 0.0) th = tN.map(_ / s)
      }
      got.toSeq == th.toSeq
    }, n = 200)
  }
}
