package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.{LineSections, TableBlocks, TfIdfMatch}
import graft.sources.CsvGolden

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureSlim(convs: Int) = {
    import spark.implicits._
    graft.sources.TranscriptGen.generate(spark,
      FixtureGen.Profile(numConvs = convs, monsterEvery = 19, monsterTurns = 50,
        invalidEvery = 7), 4)
      .select(col("conv_id"), col("turn_idx"), col("text")).as[TurnSlim]
  }

  test("LineSections.lineFsm == LineFsm oracle per conversation") {
    val profile = FixtureGen.Profile(numConvs = 40, monsterEvery = 19,
      monsterTurns = 50, invalidEvery = 7)
    val all = FixtureGen.turns(profile)
    val got = LineSections.lineFsm(fixtureSlimOf(profile), 8).collect()
      .map(sr => (sr.conv_id, sr.section, sr.row) -> sr.value).toMap
    all.groupBy(_.conv_id).foreach { case (cid, ts) =>
      val pages = ts.sortBy(_.turn_idx).map(_.text)
      LineFsm.parseDocument(pages).foreach { sv =>
        assert(got.get((cid, sv.section, sv.row)).contains(sv.value),
          s"mismatch $cid/${sv.section}/${sv.row}")
      }
    }
  }

  private def fixtureSlimOf(p: FixtureGen.Profile) = {
    import spark.implicits._
    graft.sources.TranscriptGen.generate(spark, p, 4)
      .select(col("conv_id"), col("turn_idx"), col("text")).as[TurnSlim]
  }

  test("LineSections.keywordWindows == KeywordWindows oracle per turn") {
    val profile = FixtureGen.Profile(numConvs = 30, monsterEvery = 0, invalidEvery = 5)
    val all = FixtureGen.turns(profile)
    val got = LineSections.keywordWindows(fixtureSlimOf(profile)).collect()
      .map(kr => (kr.conv_id, kr.turn_idx, kr.row) ->
        (kr.key, kr.description, kr.cis_control)).toMap
    all.foreach { t =>
      KeywordWindows.parsePage(t.text).foreach { pr =>
        val g = got((t.conv_id, t.turn_idx, pr.row))
        assert(g._1 == pr.key)
        assert(g._2 == pr.values("description"))
        assert(g._3 == pr.values("cis control"))
      }
    }
  }

  test("TableBlocks: header uniquify, arity filter, cell roundtrip") {
    assert(TableBlocks.makeUnique(Seq("a", "b", "a", "a")) == Seq("a", "b", "a_1", "a_2"))
    import spark.implicits._
    val text = "intro line\nCol | Val | Val\nv8 | 1.2 x | TRUE\nbad | row\nv7 | 3.4 y | FALSE\n\ntail"
    val turns = Seq(TurnSlim("c1", 0, text)).toDS
    val cells = TableBlocks.extract(turns).collect()
    assert(cells.map(_.column).toSet == Set("Col", "Val", "Val_1"))
    // arity-mismatched row dropped: 2 good rows × 3 cols
    assert(cells.length == 6)
    assert(cells.filter(_.row_idx == 1).map(c => c.column -> c.value).toMap
      == Map("Col" -> "v7", "Val" -> "3.4 y", "Val_1" -> "FALSE"))
  }

  test("TfIdfMatch: identical text is its own best match") {
    import spark.implicits._
    val left = Seq((1L, "alpha beta gamma delta"), (2L, "unique words here today"))
      .toDF("id", "text")
    val right = Seq((10L, "alpha beta gamma delta"), (11L, "completely different content"),
      (12L, "unique words here today")).toDF("id", "text")
    val best = TfIdfMatch.bestMatch(left, right).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best(1L) == 10L)
    assert(best(2L) == 12L)
  }

  test("CsvGolden roundtrip preserves header, quoting, embedded delimiters") {
    import spark.implicits._
    val df = Seq(
      ("r1", "plain"),
      ("r2", "has, comma"),
      ("r3", "has \"quote\" inside"),
      ("r4", "multi\nline")).toDF("k", "v")
    val path = java.nio.file.Files.createTempDirectory("csvg").toString + "/out"
    CsvGolden.write(df, path)
    val back = CsvGolden.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == Map("r1" -> "plain", "r2" -> "has, comma",
      "r3" -> "has \"quote\" inside", "r4" -> "multi\nline"))
  }

  test("Clean.stopwordFiltered and lemmatize") {
    import spark.implicits._
    val df = Seq("The cat and the dog of it", "running dogs carried boxes").toDF("text")
    val f = df.select(graft.functions.Clean.stopwordFiltered(col("text"))).as[String].collect()
    assert(f(0) == "cat dog")
    val l = df.select(graft.functions.Clean.lemmatize(col("text"))).as[String].collect()
    assert(l(1) == "runn dog carri box") // pinned rule-based semantics
  }

  test("Multimodal: right-magic corrupt bodies degrade to base rows, never throw") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // PNG magic + IHDR claiming 1e9 × 1e9 — must be rejected BEFORE any
    // raster allocation, not OOM or throw
    val hugePng = pngMagic ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0x3B, 0x9A.toByte, 0xCA.toByte, 0x00, 0x3B, 0x9A.toByte,
        0xCA.toByte, 0x00, 8, 6, 0, 0, 0) ++ Array.fill[Byte](16)(0)
    val garbagePng = pngMagic ++ Array.fill[Byte](64)(0x55)
    // valid PNG truncated mid-IDAT
    val validPng = M.synthImages(spark, 1, dupEvery = 0).collect().head.payload
    val truncPng = java.util.Arrays.copyOf(validPng, validPng.length / 2)
    // Y4M with overflow-crafting dims (46341^2 wraps Int) and a truncated WAV
    val overflowY4m = "YUV4MPEG2 W46341 H46341 F25:1 C444\n".getBytes("US-ASCII") ++
      Array.fill[Byte](32)(1)
    val truncWav = java.util.Arrays.copyOf(
      M.synthAudio(spark, 1).collect().head.payload, 50)
    val media = Seq(
      (1L, hugePng), (2L, garbagePng), (3L, truncPng),
      (4L, overflowY4m), (5L, truncWav),
      (6L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val feats = M.extractFeatures(media, "media_id", "payload").collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size == 6)
    // every corrupt payload sniffs its container but yields NO decoded dims
    assert(feats(6L).mime == "application/octet-stream" && feats(6L).byte_len == 0)
    assert(feats(1L).mime == "image/png" && feats(1L).width.isEmpty)
    assert(feats(2L).mime == "image/png" && feats(2L).width.isEmpty)
    assert(feats(3L).mime == "image/png" && feats(3L).width.isEmpty)
    assert(feats(4L).mime == "video/x-y4m" && feats(4L).n_frames.isEmpty)
    assert(feats(5L).mime == "audio/x-wav" && feats(5L).sample_rate.isEmpty)
  }

  test("Multimodal generic plane: sniffed real-codec routing, dims == typed planes, resize/frame plans") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    val img = M.synthImages(spark, 30, dupEvery = 0).toDF
      .select(col("media_id"), col("payload"))
    val wav = M.synthAudio(spark, 20).toDF
      .select((col("media_id") + 1000L).as("media_id"), col("payload"))
    val y4m = M.synthVideos(spark, 10).toDF
      .select((col("media_id") + 2000L).as("media_id"), col("payload"))
    val junk = Seq(
      (3000L, "%PDF-1.7\nx".getBytes("UTF-8")),
      (3001L, "<!DOCTYPE html><p>x</p>".getBytes("UTF-8")),
      (3002L, "no magic here".getBytes("UTF-8"))).toDF("media_id", "payload")
    val media = img.unionByName(wav).unionByName(y4m).unionByName(junk)

    val feats = M.extractFeatures(media, "media_id", "payload").collect()
    assert(feats.length == 63)
    val byMime = feats.groupBy(_.mime).view.mapValues(_.length).toMap
    assert(byMime == Map("image/png" -> 30, "audio/x-wav" -> 20,
      "video/x-y4m" -> 10, "application/pdf" -> 1, "text/html" -> 1,
      "application/octet-stream" -> 1))

    // the JVM sniff and the sniffMime COLUMN expression must agree row-for-row
    val viaCol = M.sniffMime(media, "media_id", "payload")
      .select(col("media_id"), col("mime")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    feats.foreach(f => assert(viaCol(f.media_id) == f.mime, s"sniff drift at ${f.media_id}"))

    // generic dims must equal the typed planes' real decodes
    val imgDims = M.extractImageFeatures(
        img.as[graft.operators.Multimodal.ImageRow]).collect()
      .map(f => f.media_id -> (f.width, f.height)).toMap
    val vidDims = M.extractVideoFeatures(
        y4m.as[graft.operators.Multimodal.VideoRow]).collect()
      .map(f => f.media_id -> (f.width, f.height, f.n_frames)).toMap
    val audDims = M.extractAudioFeatures(
        wav.as[graft.operators.Multimodal.AudioRow]).collect()
      .map(f => f.media_id -> (f.sample_rate, f.n_frames)).toMap
    feats.foreach { f =>
      f.mime match {
        case "image/png" =>
          assert((f.width.get, f.height.get) == imgDims(f.media_id) && f.n_frames.contains(1))
          assert(f.sample_rate.isEmpty)
        case "video/x-y4m" =>
          assert((f.width.get, f.height.get, f.n_frames.get) == vidDims(f.media_id))
        case "audio/x-wav" =>
          assert((f.sample_rate.get, f.n_frames.get) == audDims(f.media_id))
          assert(f.width.isEmpty && f.height.isEmpty)
        case _ =>
          assert(f.width.isEmpty && f.height.isEmpty &&
            f.n_frames.isEmpty && f.sample_rate.isEmpty)
      }
      assert(f.byte_len > 0)
    }

    // determinism
    val again = M.extractFeatures(media, "media_id", "payload").collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)

    // resize plan: bounded for visual rows, null-through elsewhere
    val resized = M.resizePlan(M.extractFeatures(media, "media_id", "payload"), 64)
    assert(resized.filter(col("width").isNotNull &&
      greatest(col("out_width"), col("out_height")) > 64).count() == 0)
    assert(resized.filter(col("width").isNull && col("out_width").isNotNull).count() == 0)

    // frame plan: video rows only, ceil(n/stride) indices
    val sampled = M.frameSamplePlan(M.extractFeatures(media, "media_id", "payload"), 4)
    assert(sampled.count() == 10)
    assert(sampled.filter(col("mime") =!= "video/x-y4m").count() == 0)
    assert(sampled.filter(col("n_sampled") =!=
      ceil(col("n_frames").cast("double") / 4.0).cast("int")).count() == 0)
  }

  test("custom expressions: FloatCosine == HOF formulation; hyperplane bucket stable") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(50)
    val a = emb.as("a")
    val b = emb.as("b")
    val pairs = a.crossJoin(b)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        graft.expressions.VectorExpressions.float_cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        graft.functions.VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(pairs.filter(col("fast") =!= col("hof")).count() == 0) // bit-identical
    val buckets = emb.select(
      graft.expressions.VectorExpressions.hyperplane_bucket(col("embedding"), 4, 64).as("bk"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 16))
  }

  test("ImageCodec: real PNG decode, aHash near-dup recall, bounded resize") {
    import spark.implicits._
    val imgs = graft.operators.Multimodal.synthImages(spark, 120, dupEvery = 10)
    val feats = graft.operators.Multimodal.extractImageFeatures(imgs).collect()
    assert(feats.length == 120, "every synthetic PNG must decode")
    assert(feats.forall(f => f.width >= 24 && f.height >= 24))
    // pixel-identical planted duplicates share the exact aHash
    val byId = feats.map(f => f.media_id -> f.ahash).toMap
    val planted = (0L until 120L).filter(i => i % 10 == 9).map(i => (i - 1, i))
    planted.foreach { case (a, b) => assert(byId(a) == byId(b), s"dup pair $a/$b") }
    // near-dup join finds ALL planted pairs (pigeonhole: exact recall)
    val found = graft.operators.Multimodal.imageNearDup(
        graft.operators.Multimodal.extractImageFeatures(imgs), maxHamming = 4)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    planted.foreach { p => assert(found.contains(p), s"missing planted pair $p") }
    // ...and the fixture is DISCRIMINATIVE: unrelated seeds land far apart,
    // so the near-dup set is essentially the planted pairs, not most of n²
    assert(found.size <= planted.size + 2, s"degenerate fixture: ${found.size} pairs")
    // resize: bounded edge, still-decodable real PNG, aspect preserved ±1px
    val resized = graft.operators.Multimodal.resizeImages(imgs, maxEdge = 64).collect()
    resized.foreach { row =>
      val img = graft.core.ImageCodec.decode(row.payload).get
      assert(math.max(img.getWidth, img.getHeight) <= 64, s"edge bound ${row.media_id}")
    }
    // determinism: same synth + decode twice -> identical features
    val again = graft.operators.Multimodal.extractImageFeatures(
      graft.operators.Multimodal.synthImages(spark, 120, dupEvery = 10)).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("AudioCodec: WAV roundtrip, chunk-walking decode, features, decimation") {
    import graft.core.AudioCodec
    // encode → decode roundtrip is exact
    val samples = AudioCodec.synthSamples(7L, 500, 2)
    val clip = AudioCodec.decode(AudioCodec.encodeWavPcm16(samples, 16000, 2)).get
    assert(clip.sampleRate == 16000 && clip.channels == 2)
    assert(clip.samples.toSeq == samples.toSeq)
    // decoder walks unknown chunks (not just our writer's layout): splice a
    // LIST chunk between fmt and data
    val wav = AudioCodec.encodeWavPcm16(samples, 16000, 2)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // patch RIFF size (+12)
    val riffLen = java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riffLen.putInt(36 + 12 + samples.length * 2)
    val viaList = AudioCodec.decode(spliced).get
    assert(viaList.samples.toSeq == samples.toSeq, "LIST chunk must be skipped")
    // features match a direct recompute
    val f = AudioCodec.features(wav).get
    assert(f.nFrames == 500 && f.channels == 2)
    assert(f.sumAbs == samples.map(s => math.abs(s.toInt).toLong).sum)
    assert(f.sumSq == samples.map(s => s.toLong * s).sum)
    assert(f.peak == samples.map(s => math.abs(s.toInt)).max)
    val ch0 = (0 until 500).map(i => samples(i * 2))
    assert(f.zeroCrossings == ch0.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    // decimation: every 2nd frame, half rate, exact samples
    val dec = AudioCodec.decode(AudioCodec.decimate(wav, 2).get).get
    assert(dec.sampleRate == 8000 && dec.samples.length == 250 * 2)
    assert(dec.samples(2) == samples(4) && dec.samples(3) == samples(5))
    // corrupt payloads refuse cleanly
    assert(AudioCodec.decode("nope".getBytes).isEmpty)
    assert(AudioCodec.decode(wav.take(30)).isEmpty)
    // distributed plane: every synthetic clip decodes, deterministic twice
    val feats = graft.operators.Multimodal.extractAudioFeatures(
      graft.operators.Multimodal.synthAudio(spark, 80)).collect()
    assert(feats.length == 80)
    val again = graft.operators.Multimodal.extractAudioFeatures(
      graft.operators.Multimodal.synthAudio(spark, 80)).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
    // resample plane halves the frame count (±1) and keeps decodability
    val res = graft.operators.Multimodal.extractAudioFeatures(
      graft.operators.Multimodal.resampleAudio(
        graft.operators.Multimodal.synthAudio(spark, 20), 2)).collect()
    val orig = feats.filter(_.media_id < 20).map(x => x.media_id -> x.n_frames).toMap
    res.foreach(r => assert(r.n_frames == (orig(r.media_id) + 1) / 2, s"clip ${r.media_id}"))
  }

  test("VideoCodec: Y4M roundtrip, header variants, features, frame ops") {
    import graft.core.VideoCodec
    val payload = VideoCodec.synthY4m(11L, 12, 10, 4, fpsNum = 30)
    val v = VideoCodec.decode(payload).get
    assert(v.width == 12 && v.height == 10 && v.fpsNum == 30 && v.frames.length == 4)
    // roundtrip re-encode is byte-identical
    assert(VideoCodec.encodeY4m(v).toSeq == payload.toSeq)
    // header param order is free; unknown X-tags skipped
    val reordered = ("YUV4MPEG2 C444 Xfoo=1 H10 W12 F30:1\n").getBytes("US-ASCII") ++
      payload.drop(payload.indexOf('\n'.toByte) + 1)
    val v2 = VideoCodec.decode(reordered).get
    assert(v2.width == 12 && v2.height == 10 && v2.frames.length == 4)
    // features match a direct recompute
    val f = VideoCodec.features(payload).get
    val luma = v.frames.map(_(0).map(_ & 0xFF).map(_.toLong).sum).sum
    assert(f.lumaSum == luma && f.nFrames == 4)
    val motion = (1 until 4).map { fi =>
      v.frames(fi)(0).zip(v.frames(fi - 1)(0))
        .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)).toLong }.sum
    }.sum
    assert(f.motionSum == motion && f.motionSum > 0, "scrolling texture must move")
    // frame sampling touches the right frames
    val sampled = VideoCodec.sampleFrameLuma(payload, 2)
    assert(sampled.map(_._1) == Seq(0, 2))
    assert(sampled.head._2 == v.frames(0)(0).map(_ & 0xFF).map(_.toLong).sum)
    // frame → PNG thumbnail decodes with the image codec at the right dims
    val png = VideoCodec.frameToPng(payload, 1).get
    val img = graft.core.ImageCodec.decode(png).get
    assert(img.getWidth == 12 && img.getHeight == 10)
    // refusals: non-C444, truncation, bad marker
    assert(VideoCodec.decode("YUV4MPEG2 W4 H4 F25:1 C420\n".getBytes).isEmpty)
    assert(VideoCodec.decode(payload.take(payload.length - 3)).isEmpty)
    val broken = payload.clone()
    broken(payload.indexOf('\n'.toByte) + 1) = 'G'.toByte
    assert(VideoCodec.decode(broken).isEmpty)
    // distributed plane: all clips decode; determinism; thumbnails feed the
    // image near-dup operator without modification
    val feats = graft.operators.Multimodal.extractVideoFeatures(
      graft.operators.Multimodal.synthVideos(spark, 30)).collect()
    assert(feats.length == 30)
    val thumbs = graft.operators.Multimodal.extractImageFeatures(
      graft.operators.Multimodal.videoThumbnails(
        graft.operators.Multimodal.synthVideos(spark, 30))).collect()
    assert(thumbs.length == 30)
    val dims = feats.map(x => x.media_id -> ((x.width, x.height))).toMap
    thumbs.foreach(t => assert(dims(t.media_id) == ((t.width, t.height))))
  }

  test("TopicModel.plsaBestMatch separates topic groups; deterministic") {
    import spark.implicits._
    // two planted topics with disjoint vocabularies
    val food = Seq("pasta sauce tomato basil olive", "tomato pasta olive garlic basil",
      "basil olive sauce garlic pasta")
    val space = Seq("rocket orbit launch booster stage", "orbit booster rocket stage launch",
      "launch stage orbit rocket booster")
    val left = Seq((0L, food(0)), (1L, space(0))).toDF("id", "text")
    val right = Seq((10L, food(1)), (11L, space(1)), (12L, food(2)), (13L, space(2)))
      .toDF("id", "text")
    val got = graft.operators.TopicModel.plsaBestMatch(left, right)
      .select("left_id", "right_id").as[(Long, Long)].collect().toMap
    assert(Set(10L, 12L).contains(got(0L)), s"food doc matched ${got(0L)}")
    assert(Set(11L, 13L).contains(got(1L)), s"space doc matched ${got(1L)}")
    // determinism: bit-identical scores across runs
    val s1 = graft.operators.TopicModel.plsaBestMatch(left, right)
      .select("left_id", "right_id", "score").collect().map(_.toSeq).toSet
    val s2 = graft.operators.TopicModel.plsaBestMatch(left.repartition(3), right)
      .select("left_id", "right_id", "score").collect().map(_.toSeq).toSet
    assert(s1 == s2)
  }

  test("RegexExtracts reference faithfulness: \\b gating, strip, end-slice, start-anchored rows") {
    import spark.implicits._
    import graft.operators.RegexExtracts
    // trailing \b (word-char anchor): no match inside "ICS Controls"
    val t1 = Seq((1L, "ICS Controls mapping\n\nICS Control 1.1 real   \n\ntail"))
      .toDF("id", "text")
      .select(RegexExtracts.paragraphBounded(col("text"), "ICS Control").as("p"))
      .as[Seq[String]].head()
    assert(t1 == Seq("ICS Control 1.1 real"), s"got $t1") // 1 span, stripped
    // anchor ending in ':' gets no trailing \b — still matches
    val t2 = Seq((1L, "CIS Controls: v8\n\nx")).toDF("id", "text")
      .select(RegexExtracts.paragraphBounded(col("text"), "CIS Controls:").as("p"))
      .as[Seq[String]].head()
    assert(t2 == Seq("CIS Controls: v8"))
    // anchoredRows: tail starts AFTER the greedy anchor match (the anchor
    // line's own row-like text is consumed), and a mid-line row pattern is
    // rejected (re.match anchors at line start)
    val df = Seq(("c1", 0, "CIS Controls v8 5 xx\n12 good row here\nnope 34 mid line row x\n  7 stripped row ok"))
      .toDF("conv_id", "turn_idx", "text")
    val rows = RegexExtracts.anchoredRows(df, "text", "CIS Controls[\\s\\w]*",
        "(\\d+)\\s+(\\w.*)", 2)
      .select(col("g1"), col("g2")).as[(String, String)].collect().toSet
    // the whole text is [\s\w] chars, so the reference's greedy anchor match
    // consumes ALL of it and text[match.end():] is empty — zero rows (the
    // old from-match-START slice emitted phantom rows here)
    assert(rows.isEmpty, s"greedy anchor must consume its run: $rows")
    val df2 = Seq(("c1", 0, "CIS Controls:\n12 good row here\nnope 34 mid line\n  7 stripped row ok"))
      .toDF("conv_id", "turn_idx", "text")
    val rows2 = RegexExtracts.anchoredRows(df2, "text", "CIS Controls:",
        "(\\d+)\\s+(\\w.*)", 2)
      .select(col("g1"), col("g2")).as[(String, String)].collect().toSet
    assert(rows2 == Set(("12", "good row here"), ("7", "stripped row ok")),
      s"got $rows2") // mid-line '34' rejected; leading-space row stripped then matched
  }

  test("TableBlocks.extractGated: capture from first marker page, stop at blank-next break") {
    import spark.implicits._
    import graft.core.TurnSlim
    val conv = Seq(
      TurnSlim("c", 0, "a|b\n1|2"),              // BEFORE marker: not captured
      TurnSlim("c", 1, "intro CIS Controls: yes\nh1|h2\nx|y"), // captured
      TurnSlim("c", 2, "k1|k2\np|q"),            // captured; next page blank -> break after this
      TurnSlim("c", 3, "   \n  "),               // blank page (not captured: its own tables none)
      TurnSlim("c", 4, "z1|z2\nm|n"))            // after break: NOT captured
    val got = graft.operators.TableBlocks.extractGated(conv.toDS())
      .collect().map(c => (c.turn_idx, c.column, c.value)).toSet
    assert(got.map(_._1) == Set(1, 2), s"captured turns: ${got.map(_._1)}")
    assert(got.contains((1, "h1", "x")) && got.contains((2, "k1", "p")))
  }

  test("plsaBestMatch: overlapping left/right id spaces stay side-separated; null ids dropped") {
    import spark.implicits._
    // id 1 exists on BOTH sides with different text: the right doc must stay
    // a reachable candidate and must not leak its vector into the left side
    // (the under-cap path once split thetas by id-set membership)
    val left = Seq((1L, "pasta sauce tomato basil olive")).toDF("id", "text")
    val right = Seq((1L, "rocket orbit launch booster stage"),
      (2L, "tomato pasta olive garlic basil")).toDF("id", "text")
    val got = graft.operators.TopicModel.plsaBestMatch(left, right, k = 4, iters = 3)
      .select("left_id", "right_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)), s"food doc must match the food doc: ${got.toSeq}")
    // a null right id is dropped, not a crash (TfIdfMatch convention)
    val withNull = right.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "olive basil pasta")).toDF("id", "text"))
    val got2 = graft.operators.TopicModel.plsaBestMatch(left, withNull, k = 4, iters = 3)
      .select("left_id", "right_id").as[(Long, Long)].collect()
    assert(got2.toSeq == Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      graft.operators.TopicModel.plsaBestMatch(left, right, k = 0)
    }
  }

  test("ANN operators drop null-id/null-vec rows uniformly (no null-scored neighbors)") {
    import spark.implicits._
    val S = graft.operators.SimilaritySearch
    def vec(seed: Int): Array[Float] = Array.tabulate(8)(i => (seed * 31 + i).toFloat)
    val corpus = ((0L until 20L).map(i => (i, vec(i.toInt))) ++
      Seq((90L, null.asInstanceOf[Array[Float]]))).toDF("id", "vec")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], vec(7)))
        .toDF("id", "vec"))
    val queries = Seq((100L, vec(3)), (101L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec")
    val results = Seq(
      S.bruteForceTopK(queries, corpus, 3),
      S.quantizedTopK(queries, corpus, 3),
      S.lshTopK(queries, corpus, 3, dim = 8, bits = 2, probeHamming = 2),
      S.ivfTopK(queries, corpus, 3, nlist = 4, nprobe = 4))
    results.foreach { r =>
      val rows = r.collect()
      assert(rows.forall(_.getLong(0) == 100L), "null-vec query leaked")
      assert(rows.forall(!_.isNullAt(2)), "null score leaked")
      assert(rows.forall(_.getLong(1) < 90L), "null-vec/null-id corpus row leaked")
    }
    intercept[IllegalArgumentException] {
      S.lshTopK(queries, corpus, 3, dim = 8, bits = 32)
    }
  }

  test("topic matchers tolerate null-text docs (≡ empty doc, no NPE)") {
    import spark.implicits._
    val left = Seq((0L, "pasta sauce tomato"), (1L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val right = Seq((10L, "tomato pasta sauce"), (11L, null.asInstanceOf[String]),
      (12L, "rocket orbit launch")).toDF("id", "text")
    val plsa = graft.operators.TopicModel.plsaBestMatch(left, right, k = 4, iters = 2)
      .collect()
    assert(plsa.length == 2) // both lefts scored, incl. the null doc
    val foldin = graft.operators.TopicModel.plsaBestMatch(left, right, k = 4,
      iters = 2, fitSampleLimit = 2).collect()
    assert(foldin.length == 2)
    val lda = graft.operators.TopicModel.bestMatch(left, right, k = 4).collect()
    assert(lda.length == 2)
    val tfidf = TfIdfMatch.bestMatch(left, right).collect()
    assert(tfidf.length == 2)
    val exact = TfIdfMatch.bestMatchExact(left, right).collect()
    assert(exact.length == 2) // null left rides the no-shared-term fallback
  }

  test("plsaBestMatch over-cap fold-in == dense local replica; partition-invariant") {
    import spark.implicits._
    import graft.operators.TopicModel
    // 14 docs > cap 6 forces the sample-fit + distributed fold-in plane
    val words = Vector("pasta", "sauce", "tomato", "basil", "olive", "garlic",
      "rocket", "orbit", "launch", "booster", "stage", "fuel")
    def doc(seed: Int): String =
      (0 until 8).map(j => words((seed * 7 + j * (seed % 5 + 1)) % words.length)).mkString(" ")
    val lRows = (0L until 9L).map(i => (i, doc(i.toInt)))
    val rRows = (20L until 25L).map(i => (i, doc(i.toInt)))
    val (k, iters, cap) = (4, 3, 6)
    val got = TopicModel.plsaBestMatch(lRows.toDF("id", "text"), rRows.toDF("id", "text"),
      k, iters, fitSampleLimit = cap)
      .select("left_id", "right_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)

    // replica: same fingerprint-ranked sample (derived via the production
    // hash column but ranked locally), production joint fit (itself pinned
    // by the q_plsa_match oracle), then a DENSE fold-in — full-vocab arrays
    // with zero counts, the opposite code shape of the sparse kernel
    import graft.expressions.TextHashExpressions.fingerprint64
    import org.apache.spark.sql.functions.col
    val all = (lRows ++ rRows)
    val fps = all.toDF("id", "text")
      .select(col("id"), fingerprint64(col("id").cast("string")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampleIds = all.map(_._1).sortBy(id => (fps(id), id)).take(cap).toSet
    val sample = all.filter(d => sampleIds(d._1)).sortBy(_._1).toArray
    val (vocab, _, phi) = TopicModel.fitPlsa(sample, k, iters)
    val widx = vocab.zipWithIndex.toMap
    def denseFold(id: Long, text: String): Array[Double] = {
      val n = new Array[Double](vocab.length)
      "\\w\\w+".r.findAllIn(text.toLowerCase).foreach(t => widx.get(t).foreach(n(_) += 1.0))
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
      th
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rTheta = rRows.map { case (id, t) => (id, denseFold(id, t)) }
    val expect = lRows.map { case (lid, lt) =>
      val lv = denseFold(lid, lt)
      val best = rTheta.map { case (rid, rv) => (rid, cos(lv, rv)) }
        .minBy { case (rid, s) => (-s, rid) }
      (lid, best._1, best._2)
    }.sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    // partition invariance: the distributed embed must not depend on layout
    val wide = TopicModel.plsaBestMatch(
      lRows.toDF("id", "text").repartition(5), rRows.toDF("id", "text").repartition(3),
      k, iters, fitSampleLimit = cap)
      .select("left_id", "right_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(wide.toSeq == got.toSeq)
  }

  test("QLearning.bestMatches == episodes-outer reference-shaped fold; partition-invariant") {
    import spark.implicits._
    import graft.core.TextStats
    // deterministic embedding fixture
    def vec(seed: Long): Array[Float] =
      Array.tabulate(16)(i => (TextStats.mix64(seed ^ i).toDouble / Long.MaxValue).toFloat)
    val g = (0L until 12L).map(i => (i, vec(0x6AL ^ i)))
    val c = (100L until 115L).map(i => (i, vec(0xC7L ^ i)))
    val gDf = g.toDF("id", "vec")
    val cDf = c.toDF("id", "vec")
    val p = graft.operators.QLearning.Params()

    // independent replica, shaped like the REFERENCE loop (episodes outer,
    // guidelines inner — Reinforcement_Learning.py:44-66) rather than the
    // operator's per-row fold: agreement pins the row-independence claim
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val nC = c.length
    val q = Array.fill(g.length, nC)(0.0)
    for (e <- 0 until p.episodes; gi <- g.indices) {
      val gid = g(gi)._1
      val base = p.seed ^ (gid * 2654435761L)
      val u = (TextStats.mix64(base ^ (2L * e)) >>> 11).toDouble / 9007199254740992.0
      val action =
        if (u < p.epsilon)
          java.lang.Long.remainderUnsigned(TextStats.mix64(base ^ (2L * e + 1L)), nC.toLong).toInt
        else q(gi).zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
      val reward = cos(g(gi)._2, c(action)._2)
      val maxq = q(gi).max
      q(gi)(action) = q(gi)(action) + p.lr * (reward + p.gamma * maxq - q(gi)(action))
    }
    val expected = g.indices.map { gi =>
      val best = q(gi).zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
      (g(gi)._1, c(best)._1, q(gi)(best), cos(g(gi)._2, c(best)._2))
    }.toSet

    val got = graft.operators.QLearning.bestMatches(gDf, cDf, p)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == expected, s"fold mismatch: ${(expected -- got).take(2)}")
    // partition invariance
    val got7 = graft.operators.QLearning.bestMatches(gDf.repartition(7), cDf, p)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got7 == got)
    // learning is non-degenerate: not every guideline just keeps action 0
    assert(got.map(_._2).size > 1, "Q fold degenerated to a single control")
  }

  test("Clean.applyToAllColumns (F7) and fileStem (F9)") {
    import spark.implicits._
    val df = Seq(("Ab1", "C-d2")).toDF("x", "y")
    val got = graft.functions.Clean.applyToAllColumns(df, graft.functions.Clean.lowerAlpha)
      .as[(String, String)].collect().head
    assert(got == (("ab", "cd")))
    val stems = Seq("/a/b/report.v2.pdf", "plain.txt", "/x/noext")
      .toDF("p").select(graft.functions.Clean.fileStem(col("p")))
      .as[String].collect().toSeq
    assert(stems == Seq("report.v2", "plain", "noext"))
  }

  test("Xlsx: OOXML _xHHHH_ escaping roundtrips XML-invalid and trap strings") {
    import spark.implicits._
    val hostile = Seq(
      ("h1", "bell\u0007null\u0000end"),   // C0 controls → _xHHHH_
      ("h2", "_x0007_literal"),            // literal escape must NOT decode to a bell
      ("h3", "_x005f_"),                   // the escape-of-the-escape itself
      ("h4", "nonchar\uFFFE\uFFFFok"),     // XML noncharacters
      ("h6", "pair😁ok\tkeep\nlines"), // valid astral pair untouched
      ("h7", "_x0041_x0042_"),             // OVERLAPPING escape-shaped literals
      ("h8", "_x0041\u0007"),             // literal escape prefix + real escaped char
      ("h9", "a__x0007_b"),                // literal _ directly before a trap shape
      ("hA", "_xyz _x _x00 x0041_"))       // assorted near-miss shapes
    val df = hostile.toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("xlsx-esc").toString
    graft.sources.Xlsx.write(df, s"$dir/out.xlsx")
    val back = graft.sources.Xlsx.readWithHeader(spark, s"$dir/*.xlsx")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(back == hostile)
    // lone surrogates cannot even ENTER a DataFrame (Spark's UTF8String
    // encode replaces them) -- the writer/reader KERNEL must still
    // roundtrip them for direct toBytes callers, via the _xHHHH_ escape
    val bytes = graft.sources.Xlsx.toBytes(Seq("k", "v"),
      Iterator(Seq("h5", "lone\uD83Dsurrogate")))
    val rows = graft.sources.Xlsx.parseSheet(bytes)
    assert(rows == Seq((0, Seq("k", "v")), (1, Seq("h5", "lone\uD83Dsurrogate"))))
    // a corrupt workbook in the glob contributes zero rows, not a task failure
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/corrupt.xlsx"),
      "PK this is not a real zip".getBytes("UTF-8"))
    val withCorrupt = graft.sources.Xlsx.read(spark, s"$dir/*.xlsx")
      .select(col("file")).distinct().count()
    assert(withCorrupt == 1) // only out.xlsx yields rows
  }

  test("Xlsx: roundtrip write/read, shared-string files, sparse rows, escaping") {
    import spark.implicits._
    val df = Seq(
      ("r1", "plain", "1.5"),
      ("r2", "has <xml> & \"quotes\"", "2"),
      ("r3", "multi\nline\ttab", "3")).toDF("k", "v", "n")
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toString
    graft.sources.Xlsx.write(df, s"$dir/out.xlsx")
    val back = graft.sources.Xlsx.readWithHeader(spark, s"$dir/*.xlsx")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq(("r1", "plain", "1.5"),
      ("r2", "has <xml> & \"quotes\"", "2"), ("r3", "multi\nline\ttab", "3")))
    // shared-strings + sparse row (skipped cell B2) parse: hand-built workbook
    val shared = """<?xml version="1.0"?><sst xmlns="x"><si><t>alpha</t></si><si><t>beta</t></si></sst>"""
    val sheet = """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
      <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
      <row r="2"><c r="A2"><v>42</v></c><c r="C2" t="s"><v>1</v></c></row>
      </sheetData></worksheet>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def add(n: String, c: String) = {
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    add("xl/sharedStrings.xml", shared); add("xl/worksheets/sheet1.xml", sheet)
    zip.close()
    val rows = graft.sources.Xlsx.parseSheet(bos.toByteArray)
    assert(rows == Seq((0, Seq("alpha", "beta")), (1, Seq("42", null, "beta"))))
    assert(graft.sources.Xlsx.colRef(0) == "A" && graft.sources.Xlsx.colRef(27) == "AB")
    assert(graft.sources.Xlsx.refToColIdx("AB7") == 27)
  }

  test("Xlsx: multi-sheet write/read — named addressing, all-sheets, order") {
    import spark.implicits._
    val guide = Seq(("1.1", "Ensure logging"), ("1.2", "Ensure auditing"))
      .toDF("rule", "description")
    val mcl = Seq(("1.1", "8.2", "0.91")).toDF("rule", "control", "score")
    val notes = Seq(("n1", "a <b> & \"c\""), ("n2", "tab\there")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("xlsx-sheets").toString
    // the reference's real sheet names: text_preprocessing3.py:3, Similarity.py:28
    graft.sources.Xlsx.writeSheets(Seq(
      "Guidelines+Description" -> guide, "MCL" -> mcl, "Notes" -> notes),
      s"$dir/book.xlsx")
    // named addressing
    val gotMcl = graft.sources.Xlsx
      .readWithHeader(spark, s"$dir/*.xlsx", Some("MCL"))
      .as[(String, String, String)].collect().toSeq
    assert(gotMcl == Seq(("1.1", "8.2", "0.91")))
    val gotNotes = graft.sources.Xlsx
      .readWithHeader(spark, s"$dir/*.xlsx", Some("Notes"))
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(gotNotes == Seq(("n1", "a <b> & \"c\""), ("n2", "tab\there")))
    // default read = FIRST sheet in workbook order
    val first = graft.sources.Xlsx.readWithHeader(spark, s"$dir/*.xlsx")
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(first == Seq(("1.1", "Ensure logging"), ("1.2", "Ensure auditing")))
    // sheet_name=None: every sheet, workbook order preserved, header rows kept
    val all = graft.sources.Xlsx.readAllSheets(spark, s"$dir/*.xlsx")
      .select(col("sheet"), col("row_idx")).as[(String, Int)].collect().toSeq
    assert(all.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map("Guidelines+Description" -> 3, "MCL" -> 2, "Notes" -> 3))
    val orderSeen = all.map(_._1).distinct
    assert(orderSeen == Seq("Guidelines+Description", "MCL", "Notes"))
    // a missing sheet contributes zero rows, not a failure
    assert(graft.sources.Xlsx.readSheet(spark, s"$dir/*.xlsx", "NoSuch").count() == 0)
    // single-df write honors the sheetName arg (Similarity.py sheet_name='MCL')
    graft.sources.Xlsx.write(mcl, s"$dir/one.xlsx", sheetName = "MCL")
    assert(graft.sources.Xlsx
      .readWithHeader(spark, s"$dir/one.xlsx", Some("MCL")).count() == 1)
    assert(graft.sources.Xlsx.readSheet(spark, s"$dir/one.xlsx", "Sheet1").count() == 0)
    // duplicate sheet names refused loudly
    intercept[IllegalArgumentException] {
      graft.sources.Xlsx.writeSheets(Seq("A" -> mcl, "A" -> mcl), s"$dir/dup.xlsx")
    }
    // ...but a misspelled sheet through the HEADER path names the failure
    // (readSheet's zero-rows contract would otherwise surface as a bare
    // ArrayIndexOutOfBoundsException on the header collect)
    val miss = intercept[IllegalArgumentException] {
      graft.sources.Xlsx.readWithHeader(spark, s"$dir/*.xlsx", Some("Typo"))
    }
    assert(miss.getMessage.contains("Typo"), miss.getMessage)
  }

  test("Xlsx: sheet order follows workbook.xml, not zip entry order; hostile names") {
    // hand-build a workbook whose ZIP lists sheet2.xml BEFORE sheet1.xml and
    // whose workbook.xml names them in the opposite logical order — the
    // manifest must win (real writers order zip entries arbitrarily)
    def sheetXml(v: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="x"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>$v</t></is></c></row></sheetData></worksheet>"""
    val wb = """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      <sheets><sheet name="First" sheetId="1" r:id="rId9"/><sheet name="Second" sheetId="2" r:id="rId3"/></sheets></workbook>"""
    val rels = """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      <Relationship Id="rId9" Type="t" Target="worksheets/sheet1.xml"/>
      <Relationship Id="rId3" Type="t" Target="/xl/worksheets/sheet2.xml"/>
      </Relationships>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def add(n: String, c: String) = {
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    add("xl/worksheets/sheet2.xml", sheetXml("two"))     // zip order reversed
    add("xl/worksheets/sheet1.xml", sheetXml("one"))
    add("xl/_rels/workbook.xml.rels", rels)
    add("xl/workbook.xml", wb)
    zip.close()
    val sheets = graft.sources.Xlsx.parseWorkbook(bos.toByteArray)
    assert(sheets.map(_._1) == Seq("First", "Second"))
    assert(sheets.map(_._2.head._2.head) == Seq("one", "two"))
    // parseSheet = first sheet per MANIFEST order, i.e. "one"
    assert(graft.sources.Xlsx.parseSheet(bos.toByteArray).head._2 == Seq("one"))
    // hostile sheet names (XML entities + _x escapes + C0) roundtrip the writer
    val hostile = Seq("a&b <c>", "_x0007_lit", "bellname")
    val bytes = graft.sources.Xlsx.toBytesSheets(hostile.map(n =>
      (n, Seq("h"), Iterator(Seq("v")))))
    assert(graft.sources.Xlsx.parseWorkbook(bytes).map(_._1) == hostile)
  }

  test("Xlsx: typed-cell contract — numeric/date/bool cells read as raw stored strings") {
    // CONTRACT (pinned): this is a STRING-ONLY reader. Cells without t="s"
    // or t="inlineStr" — numerics, styled dates (a date is a styled NUMBER
    // serial in OOXML, style index in `s` which we ignore), booleans
    // (t="b" stores 0/1), formulas (<f> ignored, cached <v> kept) — yield
    // the raw stored <v> text. Typed interpretation is the caller's cast.
    val sheet = """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
      <row r="1">
        <c r="A1"><v>42</v></c>
        <c r="B1"><v>3.14159</v></c>
        <c r="C1" s="2"><v>45292</v></c>
        <c r="D1" t="b"><v>1</v></c>
        <c r="E1" t="str"><f>A1*2</f><v>84</v></c>
        <c r="F1"><v>1.23E-5</v></c>
        <c r="G1" t="inlineStr"><is><t>text</t></is></c>
      </row></sheetData></worksheet>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(sheet.getBytes("UTF-8")); zip.closeEntry(); zip.close()
    val rows = graft.sources.Xlsx.parseSheet(bos.toByteArray)
    assert(rows == Seq((0,
      Seq("42", "3.14159", "45292", "1", "84", "1.23E-5", "text"))))
  }

  test("BinaryPayloads: byte-stream lexer == in-memory oracle; feeds the FSM") {
    import spark.implicits._
    // payload files: one conversation per file, pages joined by form feed
    val profile = FixtureGen.Profile(numConvs = 12, monsterEvery = 0, invalidEvery = 5)
    val convs = (0L until 12L).map(i => FixtureGen.conversation(profile, i))
    val dir = java.nio.file.Files.createTempDirectory("binpay")
    convs.foreach { ts =>
      java.nio.file.Files.write(dir.resolve(ts.head.conv_id + ".txt"),
        ts.map(_.text).mkString("\f").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val pages = graft.sources.BinaryPayloads.pages(spark, dir.toString + "/*.txt")
    val got = pages.collect().map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    val want = convs.flatten.map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    assert(got == want, "lexed pages must round-trip the payload bytes exactly")
    // composes with the flagship FSM: distributed records == oracle records
    val viaBinary = graft.operators.Extraction.records(
      graft.operators.Extraction.extract(
        pages.withColumn("role", lit("user")).withColumn("tool", lit(null: String))
          .withColumn("ts", lit(new java.sql.Timestamp(0L))).as[Turn],
        graft.operators.Extraction.Config(numPartitions = 4))).collect()
    val oracle = convs.flatMap(ts => graft.core.ConvParser.parse(ts.head.conv_id, ts))
      .flatMap(tr => tr.record.toSeq)
    assert(viaBinary.length == oracle.length && viaBinary.nonEmpty)
    // line lexer: \r\n handling + per-page line indexing
    val f2 = java.nio.file.Files.createTempDirectory("binpay2")
    java.nio.file.Files.write(f2.resolve("x.txt"),
      "a\r\nb\fc".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val lines = graft.sources.BinaryPayloads.lines(spark, f2.toString + "/*.txt")
      .collect().sortBy(l => (l.page_idx, l.line_idx))
      .map(l => (l.page_idx, l.line_idx, l.line)).toSeq
    assert(lines == Seq((0, 0, "a"), (0, 1, "b"), (1, 0, "c")))
  }

  test("repeatedLines drops cross-doc boilerplate lines, keeps order and blanks") {
    import spark.implicits._
    val docs = Seq(
      (0L, "unique alpha\nCOPYRIGHT FOOTER\nbody one"),
      (1L, "body two\nCOPYRIGHT FOOTER\n\nunique beta"),
      (2L, "all original\ncontent here")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.repeatedLines(docs, "text", "doc_id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (0L, "unique alpha\nbody one", 1L),
      (1L, "body two\n\nunique beta", 1L),
      (2L, "all original\ncontent here", 0L)))
    // a doc whose every line is boilerplate still comes back (empty, counted)
    val dup = Seq((0L, "x\ny"), (1L, "x\ny")).toDF("doc_id", "text")
    val out2 = graft.operators.Dedup.repeatedLines(dup, "text", "doc_id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out2 == Seq((0L, "", 2L), (1L, "", 2L)))
  }

  test("Gopher repetition signals: dup n-gram and dup-line-char ppm") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a b a"),              // 2-grams: ab ba ab ba → 2 dup of 4
      (1L, "w x y z"),                // all distinct
      (2L, "one\ntwo\none\nthree")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.TextFunctions.dupNgramPpm(col("text"), 2).as("d2"),
        graft.functions.TextFunctions.dupLineCharPpm(col("text")).as("dl"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got(0) == ((0L, 500000L, 0L)))     // 2/4 dup bigrams
    assert(got(1) == ((1L, 0L, 0L)))
    // lines: one(3) two(3) one(3) three(5): dup chars 6 of 14
    assert(got(2)._3 == math.floor(6.0 / 14 * 1000000).toLong)
  }

  test("bestMatchExact: identical doc scores ppm 1e6; no-overlap falls back") {
    import spark.implicits._
    val l = Seq((1L, "alpha beta gamma"), (2L, "zz_nowhere qq_nothing")).toDF("id", "text")
    val r = Seq((10L, "alpha beta gamma"), (11L, "delta epsilon")).toDF("id", "text")
    val got = graft.operators.TfIdfMatch.bestMatchExact(l, r)
      .orderBy("left_id").as[(Long, Long, Long)].collect().toSeq
    assert(got.length == 2)
    assert(got(0)._1 == 1L && got(0)._2 == 10L && got(0)._3 >= 999990L)
    assert(got(1) == ((2L, 10L, 0L))) // no shared term → min right id, score 0
  }

  test("NLTK stopword list is the published 179-entry set") {
    val sw = TextStats.NltkStopWordsEn
    assert(sw.length == 179 && sw.distinct.length == 179)
    // spot members incl. the contraction entries NLTK carries
    Seq("i", "the", "shouldn't", "won't", "ma", "that'll", "should've")
      .foreach(w => assert(sw.contains(w), w))
    assert(!sw.contains("ensure") && !sw.contains("never"))
  }

  test("minhash/simhash expressions match TextStats semantics") {
    import spark.implicits._
    val texts = Seq("the quick brown fox jumps", "pack my box with five dozen jugs",
      "the quick brown fox jumps over").toDF("text")
    val sim = texts.select(
      graft.expressions.TextHashExpressions.simhash64(col("text")).as("sh")).as[Long].collect()
    val expected = Seq("the quick brown fox jumps", "pack my box with five dozen jugs",
      "the quick brown fox jumps over")
      .map(s => TextStats.simHash(TextStats.wsTokens(s.toLowerCase)))
    assert(sim.toSeq == expected)
    val bands = texts.select(
      graft.expressions.TextHashExpressions.minhash_bands(col("text"), 3, 16, 4).as("b"))
      .as[Seq[Long]].collect()
    assert(bands.forall(_.length == 4))
    // near-identical texts share at least one band; disjoint texts share none
    assert(bands(0).intersect(bands(2)).nonEmpty)
    assert(bands(0).intersect(bands(1)).isEmpty)
  }

  test("Sessionize: strict-gap byGap vs >=-gap session_window at the boundary") {
    import spark.implicits._
    val secs = Seq(0L, 10L, 2000L, 3800L) // gaps: 10, 1990, exactly 1800
    val df = secs.zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, new java.sql.Timestamp(t * 1000L))
    }.toDF("uid", "eid", "ts")
    val idx = graft.operators.Sessionize.byGap(df, "uid", "ts", "eid", 1800L)
      .select(col("eid"), col("session_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // strict > 1800: only the 1990 gap splits; the exactly-1800 gap does not
    assert(idx == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
    val win = graft.operators.Sessionize.sessionWindows(df, "uid", "ts", 1800L)
      .select(col("n_events")).collect().map(_.getLong(0)).sorted.toSeq
    // session_window merges at exactly-gap too (split only when > 1800):
    // {0,10}, {2000,3800} — same boundary as byGap
    assert(win == Seq(2L, 2L))
    val summary = graft.operators.Sessionize
      .sessionSummary(df, "uid", "ts", "eid", 1800L)
      .orderBy(col("session_idx"))
      .select(col("n_events"), col("t_start").cast("long"),
        col("t_end").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(summary == Seq((2L, 0L, 10L), (2L, 2000L, 3800L)))
  }

  test("gunzipTexts: stored-deflate AND default-compressed gzip roundtrip; framing asserted") {
    import spark.implicits._
    import graft.sources.BinaryPayloads
    val texts = Seq((1L, "alpha beta gamma " * 40), (2L, "x"), (3L, ""))
    // stored-deflate framing: header(10) + block(5) + data + trailer(8)
    val stored = texts.map { case (id, t) => (id, BinaryPayloads.gzipStored(t)) }
    stored.foreach { case (id, gz) =>
      val n = texts.find(_._1 == id).get._2.getBytes("UTF-8").length
      assert(gz.length == 23 + n)
      assert((gz(10) & 0xFF) == 1 && (gz(11) & 0xFF) == (n & 0xFF))
    }
    // generic decode: a DEFAULT-level (really compressed) member too
    def gzDefault(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val df = (stored :+ ((4L, gzDefault("compressed payload " * 100))))
      .toDF("doc_id", "payload")
    val got = BinaryPayloads.gunzipTexts(df, "doc_id", "payload")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == ((t, t.getBytes("UTF-8").length.toLong)))
    }
    assert(got(4L)._1 == "compressed payload " * 100)
    // corrupt members survive as NULL-text rows instead of failing the task
    val corrupt = Seq(
      (10L, "not gzip at all".getBytes("UTF-8")),
      (11L, java.util.Arrays.copyOf(stored.head._2, 15)),     // truncated mid-block
      (12L, { val b = stored.head._2.clone(); b(b.length - 1) = (b.last ^ 0x7F).toByte; b })) // CRC/ISIZE corrupted
    val mixed = (stored ++ corrupt).toDF("doc_id", "payload")
    val got2 = BinaryPayloads.gunzipTexts(mixed, "doc_id", "payload")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2.size == 6)
    Seq(10L, 11L, 12L).foreach(id => assert(got2(id) == ((null, -1L)), s"id $id"))
    texts.foreach { case (id, t) => assert(got2(id)._1 == t) } // valid rows intact
    // a corrupt SECOND member must not silently truncate to the first
    // member's text (the JDK swallows a malformed next header as clean EOF);
    // a VALID concatenated pair must decode both members
    val junk = Array.fill[Byte](32)(0x55)
    val twoValid = stored.head._2 ++ BinaryPayloads.gzipStored(" tail")
    val mixed2 = Seq((20L, stored.head._2 ++ junk), (21L, twoValid))
      .toDF("doc_id", "payload")
    val got3 = BinaryPayloads.gunzipTexts(mixed2, "doc_id", "payload")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got3(20L) == ((null, -1L)), s"trailing junk must corrupt the row: ${got3(20L)}")
    assert(got3(21L)._1 == texts.head._2 + " tail")
    // null ids are dropped, not a task crash; id-name collision fails loud
    val withNullId = Seq((java.lang.Long.valueOf(30L), stored.head._2),
      (null.asInstanceOf[java.lang.Long], stored.head._2)).toDF("doc_id", "payload")
    assert(BinaryPayloads.gunzipTexts(withNullId, "doc_id", "payload").count() == 1)
    intercept[IllegalArgumentException] {
      BinaryPayloads.gunzipTexts(mixed2, "text", "payload")
    }
  }

  test("gzipStoredBlocks: multi-block framing walks and decodes; edge sizes") {
    import spark.implicits._
    import graft.sources.BinaryPayloads
    // sizes straddling the cap: 1 block, exact multiple, cap+1, many blocks
    val cap = 97
    val texts = Seq(1L -> "a", 2L -> ("b" * cap), 3L -> ("c" * (cap + 1)),
      4L -> ("word " * 300).trim, 5L -> ("d" * (cap * 4)))
    val rows = texts.map { case (id, t) => (id, BinaryPayloads.gzipStoredBlocks(t, cap)) }
    rows.foreach { case (id, gz) =>
      val n = texts.find(_._1 == id).get._2.getBytes("UTF-8").length
      val blocks = math.max(1, (n + cap - 1) / cap)
      assert(gz.length == 10 + 5 * blocks + n + 8, s"doc $id framing")
      // walk the chain like the oracle: BFINAL only on the last block
      var off = 10; var seen = 0
      var fin = false
      while (!fin) {
        fin = (gz(off) & 1) == 1
        val len = (gz(off + 1) & 0xFF) | ((gz(off + 2) & 0xFF) << 8)
        // NLEN is LEN's complement
        assert(((gz(off + 3) & 0xFF) | ((gz(off + 4) & 0xFF) << 8)) == (~len & 0xFFFF))
        off += 5 + len; seen += 1
      }
      assert(seen == blocks, s"doc $id block count")
    }
    // the ordinary inflater must accept the chain (trailer CRC included)
    val got = BinaryPayloads.gunzipTexts(rows.toDF("doc_id", "payload"),
        "doc_id", "payload")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    texts.foreach { case (id, t) => assert(got(id) == t, s"doc $id roundtrip") }
  }
}
