package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.Extraction
import graft.sources.TranscriptGen

/** Golden-file equality for the north-rule invariant: the distributed pipeline
  * must equal the single-threaded oracle 100%, per turn, under stable
  * (conv_id, turn_idx) ordering — for any partitioning / skew routing. */
class ExtractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val profile =
    FixtureGen.Profile(numConvs = 120, monsterEvery = 29, monsterTurns = 150,
      invalidEvery = 11)
  private lazy val oracle: Seq[TurnResult] =
    ConvParser.parseAll(FixtureGen.turns(profile))
      .sortBy(t => (t.conv_id, t.turn_idx))

  private def sortedResults(ds: org.apache.spark.sql.Dataset[TurnResult]): Seq[TurnResult] =
    ds.collect().toSeq.sortBy(t => (t.conv_id, t.turn_idx))

  test("distributed extraction == oracle (scrambled input, default path)") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    val got = sortedResults(Extraction.extract(turns, Extraction.Config(numPartitions = 8)))
    assert(got.size == oracle.size)
    got.zip(oracle).foreach { case (g, o) => assert(g == o, s"mismatch at ${o.conv_id}/${o.turn_idx}") }
  }

  test("partition-count invariance (local[1]-equivalent vs wide)") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 5)
    val one = sortedResults(Extraction.extract(turns, Extraction.Config(numPartitions = 1)))
    val wide = sortedResults(Extraction.extract(turns, Extraction.Config(numPartitions = 32)))
    assert(one == wide)
    assert(one == oracle)
  }

  test("skew-aware routing (monster isolation) == oracle") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    val got = sortedResults(Extraction.extractSkewAware(turns,
      Extraction.Config(numPartitions = 8, monsterThreshold = 60)))
    assert(got == oracle)
  }

  test("null-text turns parse as empty pages (no NPE) on every plane") {
    import spark.implicits._
    val turns = Seq(
      Turn("cN", 0, "user", null, "", new java.sql.Timestamp(0L)),
      Turn("cN", 1, "user", "plain text", "", new java.sql.Timestamp(1L))).toDS
    val viaExtract = Extraction.extract(turns, Extraction.Config(numPartitions = 2))
      .collect().sortBy(_.turn_idx)
    assert(viaExtract.length == 2)
    val viaSkew = Extraction.extractSkewAware(turns,
      Extraction.Config(numPartitions = 2, monsterThreshold = 0, maxMonsters = 1))
      .collect().sortBy(_.turn_idx)
    assert(viaSkew.toSeq == viaExtract.toSeq)
    // null text == empty text, the defined degradation
    val emptyTurns = Seq(
      Turn("cN", 0, "user", "", "", new java.sql.Timestamp(0L)),
      Turn("cN", 1, "user", "plain text", "", new java.sql.Timestamp(1L))).toDS
    val viaEmpty = Extraction.extract(emptyTurns, Extraction.Config(numPartitions = 2))
      .collect().sortBy(_.turn_idx)
    assert(viaExtract.toSeq == viaEmpty.toSeq)
    // the sibling text-kernel planes share the null ≡ empty-page contract
    val slim = Seq(TurnSlim("cN", 0, null), TurnSlim("cN", 1, "Col | A\nv | 1")).toDS
    assert(graft.operators.LineSections.lineFsm(slim, 2).collect() != null)
    assert(graft.operators.LineSections.keywordWindows(slim).collect() != null)
    assert(graft.operators.TableBlocks.extract(slim).collect().nonEmpty)
  }

  test("maxMonsters cap is output-invisible (placement-only)") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    // threshold 1 makes (nearly) EVERY conversation a "monster"; the cap
    // must keep the driver-side map at ≤ 2 entries while results stay exact
    val got = sortedResults(Extraction.extractSkewAware(turns,
      Extraction.Config(numPartitions = 8, monsterThreshold = 1, maxMonsters = 2)))
    assert(got == oracle)
    // cap 0: no conversation is isolated — pure hash routing, still exact
    val uncapped = sortedResults(Extraction.extractSkewAware(turns,
      Extraction.Config(numPartitions = 8, monsterThreshold = 1, maxMonsters = 0)))
    assert(uncapped == oracle)
  }

  test("bucketed plane: extractBucketed == oracle AND plans no exchange") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    val tmp = java.nio.file.Files.createTempDirectory("bucketed-turns").toString
    Extraction.writeBucketed(turns, "bucketed_turns_spec", tmp, buckets = 8)
    try {
      val results = Extraction.extractBucketed(spark, "bucketed_turns_spec",
        Extraction.Config())
      assert(sortedResults(results) == oracle)
      // the ClusteredDistribution(conv_id) must be satisfied by the bucketed
      // scan itself: the executed plan contains NO shuffle exchange
      val plan = results.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange in plan:\n$plan")
      // one sorted file per bucket (repartition hash == bucket hash)
      val files = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-")).toSeq
      assert(files.size == 8, s"expected 8 bucket files, got ${files.size}")
    } finally spark.sql("DROP TABLE IF EXISTS bucketed_turns_spec")
  }

  test("conversationDocs: stable turn order under scrambled distributed input") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 7)
    val got = Extraction.conversationDocs(turns).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2)))).toMap
    val model = FixtureGen.turns(profile).groupBy(_.conv_id).map { case (c, ts) =>
      (c, (ts.sortBy(_.turn_idx).map(_.text).mkString("\n"), ts.size.toLong))
    }
    assert(got == model)
  }

  test("lossMaskSpans: offsets slice the conversationDocs text back to each turn") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 5)
    val docs = Extraction.conversationDocs(turns).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val spans = Extraction.lossMaskSpans(turns).collect()
    assert(spans.nonEmpty)
    val byTurn = FixtureGen.turns(profile)
      .map(t => (t.conv_id, t.turn_idx) -> t).toMap
    spans.foreach { r =>
      val (c, i) = (r.getString(0), r.getInt(1))
      val (s0, e0) = (r.getLong(2).toInt, r.getLong(3).toInt)
      val t = byTurn((c, i))
      assert(docs(c).substring(s0, e0) == t.text, s"span mismatch at $c#$i")
      assert(r.getBoolean(4) == (t.role == "assistant"))
    }
    // full coverage: every non-null turn appears exactly once
    assert(spans.length == FixtureGen.turns(profile).count(_.text != null))
  }

  test("records/spans views are consistent with the per-turn results") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    val results = Extraction.extract(turns, Extraction.Config(numPartitions = 8))
    val recs = Extraction.records(results).collect()
    assert(recs.length == oracle.count(_.record.isDefined))
    val spanCount = Extraction.spansLong(results).count()
    assert(spanCount == oracle.map(_.spans.size).sum)
  }

  test("incrementalCommit: two delta appends == one full recompute; files reused") {
    import org.apache.spark.sql.functions.col
    val p = FixtureGen.Profile(numConvs = 40, monsterEvery = 19,
      monsterTurns = 60, invalidEvery = 11)
    val all = TranscriptGen.generate(spark, p, parallelism = 4)
    val table = java.nio.file.Files.createTempDirectory("inc-extract").toString
    val cfg = Extraction.Config(numPartitions = 4)
    // day 1: first 20 conversations; day 2: the remaining 20
    Extraction.incrementalCommit(
      all.filter(col("conv_id") < "conv00000020"), table, cfg, numChunks = 4)
    Extraction.incrementalCommit(
      all.filter(col("conv_id") >= "conv00000020"), table, cfg, numChunks = 4)
    val incremental = graft.sources.Snapshot.read(spark, table)
      .collect().map(_.toString).sorted.toSeq
    val full = {
      val (df, _) = Extraction.observed(Extraction.extractSkewAware(all, cfg))
      df.collect().map(_.toString).sorted.toSeq
    }
    assert(incremental == full, "delta appends must equal the full recompute")
    // append reused day-1 files via hard links: every v0 parquet file name
    // appears unchanged in v1 alongside the s1- prefixed delta files
    import scala.jdk.CollectionConverters._
    def names(v: Int) = java.nio.file.Files.walk(java.nio.file.Paths.get(table, s"v$v"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
    val (v0, v1) = (names(0), names(1))
    assert(v0.subsetOf(v1), "append must reuse every parent data file")
    assert((v1 -- v0).nonEmpty && (v1 -- v0).forall(_.startsWith("s1-")))
    // time travel: v0 holds only day-1 conversations
    val day1 = graft.sources.Snapshot.read(spark, table, version = 0)
      .select("conv_id").distinct().collect().map(_.getString(0)).toSet
    assert(day1.forall(_ < "conv00000020") && day1.nonEmpty)

    // tagged retry is exactly-once: a replayed batch tag skips extraction
    // and append entirely — no third version, table unchanged — while STILL
    // returning the committed snapshot's metrics (the same contract the
    // Snapshot.write/append replay paths honor; round-3 ADVICE item)
    val committed = Extraction.incrementalCommit(
      all.filter(col("conv_id") >= "conv00000020"), table, cfg,
      numChunks = 4, batchTag = "day2")
    assert(graft.sources.Snapshot.committedTags(table).contains("day2"))
    val v2rows = graft.sources.Snapshot.read(spark, table).count()
    val replay = Extraction.incrementalCommit(
      all.filter(col("conv_id") >= "conv00000020"), table, cfg,
      numChunks = 4, batchTag = "day2")
    assert(replay == committed && replay("turns") > 0L,
      "replayed tag must be a no-op that returns the committed metrics")
    assert(graft.sources.Snapshot.read(spark, table).count() == v2rows)
    assert(graft.sources.Snapshot.metricsOfTag(table, "nosuch").isEmpty)
  }

  test("stripHtml stage: pipeline on raw == oracle on stripped turns") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 4)
    val got = sortedResults(Extraction.extract(turns,
      Extraction.Config(numPartitions = 8, stripHtml = true)))
    val strippedOracle = ConvParser.parseAll(
      FixtureGen.turns(profile).map(t => t.copy(text = Boilerplate.stripHtml(t.text))))
      .sortBy(t => (t.conv_id, t.turn_idx))
    assert(got == strippedOracle)
  }
}
