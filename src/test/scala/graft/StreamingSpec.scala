package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.core._
import graft.streaming.StreamingExtract

/** Incremental extraction == batch oracle: feed the fixture transcripts in two
  * micro-batches; after processing, the LATEST emission per (conv_id, turn_idx)
  * must equal the single-threaded oracle on the full table. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermarked windowed turn metrics: windows finalize, late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, role: String, text: String, minute: Int) =
      Turn(conv, idx, role, text, null,
        new java.sql.Timestamp(1700000000000L + minute * 60000L))

    val input = MemoryStream[Turn]
    val agg = graft.streaming.StreamingMetrics.turnRate(
      input.toDF(), windowLen = "1 minute", watermark = "2 minutes")
    val query = agg.writeStream.format("memory").queryName("turn_rate")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [m0, m1): two user turns (3 + 2 tokens), one assistant turn
      input.addData(turn("c1", 0, "user", "a b c", 0),
        turn("c1", 1, "assistant", "x y", 0),
        turn("c2", 0, "user", "d e", 0))
      query.processAllAvailable()
      // advance event time far past the watermark -> m0 window finalizes
      input.addData(turn("c1", 2, "user", "later turn", 10))
      query.processAllAvailable()
      // LATE arrival for the already-finalized m0 window -> must be dropped
      input.addData(turn("c9", 0, "user", "too late", 0))
      query.processAllAvailable()
      input.addData(turn("c1", 3, "user", "flush", 20))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.table("turn_rate")
      .select("role", "n_turns", "n_tokens", "win_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime)).toSet
    // event-time windows align to epoch minute boundaries
    val m0 = 1700000000000L / 60000L * 60000L
    // finalized minute-0 window reflects ONLY the on-time turns
    assert(rows.contains(("user", 2L, 5L, m0)), s"got $rows")
    assert(rows.contains(("assistant", 1L, 2L, m0)))
    // the late c9 turn must not appear anywhere (its window was closed)
    assert(rows.collect { case ("user", n, _, ts) if ts == m0 => n }.sum == 2L)
  }

  test("streaming dedup: first arrival per content hash wins; later dups dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, text: String, minute: Int) =
      Turn(conv, idx, "user", text, null,
        new java.sql.Timestamp(1700000000000L + minute * 60000L))

    val input = MemoryStream[Turn]
    val dedup = graft.streaming.StreamingDedup.firstOccurrence(
      input.toDF(), watermark = "10 minutes")
    val query = dedup.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(turn("c1", 0, "alpha beta", 0), turn("c2", 0, "gamma", 0))
      query.processAllAvailable()
      // same content again (same batch horizon) → dropped; new content kept
      input.addData(turn("c3", 0, "alpha beta", 1), turn("c4", 0, "delta", 1))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("stream_dedup")
      .select("conv_id", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("c1", "alpha beta"), ("c2", "gamma"), ("c4", "delta")),
      s"got $out")
  }

  test("flatMapGroupsWithState incremental extraction converges to batch oracle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val profile = FixtureGen.Profile(numConvs = 25, monsterEvery = 11,
      monsterTurns = 40, invalidEvery = 6)
    val all = FixtureGen.turns(profile)
      .map(t => TurnSlim(t.conv_id, t.turn_idx, t.text))
    val (batch1, batch2) = all.splitAt(all.size / 2)

    val input = MemoryStream[TurnSlim]
    val results = StreamingExtract.extract(input.toDS())
    val query = results.writeStream
      .format("memory").queryName("stream_extract")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
    } finally query.stop()

    // latest emission per (conv, turn) wins (snapshot-upsert semantics)
    val emitted = spark.table("stream_extract").as[TurnResult].collect()
    val latest = emitted.zipWithIndex
      .groupBy { case (tr, _) => (tr.conv_id, tr.turn_idx) }
      .map { case (_, vs) => vs.maxBy(_._2)._1 }
      .toSeq.sortBy(tr => (tr.conv_id, tr.turn_idx))

    val oracle = ConvParser.parseAll(FixtureGen.turns(profile))
      .sortBy(tr => (tr.conv_id, tr.turn_idx))
    assert(latest.size == oracle.size)
    latest.zip(oracle).foreach { case (g, o) =>
      assert(g == o, s"stream/batch mismatch at ${o.conv_id}/${o.turn_idx}")
    }
  }

  test("streaming sessionization: session_window finalizes on watermark; stream ⊆ batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def turn(conv: String, idx: Int, sec: Int) =
      Turn(conv, idx, "user", "t", null, new java.sql.Timestamp(t0 + sec * 1000L))
    val fed = Seq(turn("c1", 0, 0), turn("c1", 1, 30), turn("c2", 0, 10),
      turn("c1", 2, 600), turn("c1", 3, 1200))

    val input = MemoryStream[Turn]
    // the SAME operator as batch q_session_window, watermarked upstream
    val sess = graft.operators.Sessionize.sessionWindows(
      input.toDF().withWatermark("ts", "2 minutes"), "conv_id", "ts", 60L)
    val query = sess.writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(fed(0), fed(1), fed(2))
      query.processAllAvailable()
      // watermark jumps to 600s-120s=480s — both minute-0 sessions finalize
      input.addData(fed(3))
      query.processAllAvailable()
      input.addData(fed(4))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.table("stream_sessions")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    // c1: turns at 0s and 30s merge (gap 30 < 60), window [0, 30+60)
    assert(rows.contains(("c1", t0, t0 + 90000L, 2L)), s"got $rows")
    assert(rows.contains(("c2", t0 + 10000L, t0 + 70000L, 1L)))
    // every finalized streamed session equals the batch result on the same data
    val batch = graft.operators.Sessionize
      .sessionWindows(fed.toDF(), "conv_id", "ts", 60L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(rows.subsetOf(batch), s"stream rows $rows not in batch $batch")
  }

  test("stream-static broadcast join: streamed turns enriched against a static dim table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("grep", "search"), ("bash", "shell"), ("browse", "web"))
      .toDF("tool", "category")
    def turn(conv: String, idx: Int, tool: String) =
      Turn(conv, idx, "tool", "t", tool, new java.sql.Timestamp(1700000000000L))
    val input = MemoryStream[Turn]
    val joined = input.toDF()
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("tool"), "left")
      .select(org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx"),
        org.apache.spark.sql.functions.col("tool"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("category"),
          org.apache.spark.sql.functions.lit("unknown")).as("category"))
    val q = joined.writeStream.format("memory").queryName("stream_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(turn("c1", 0, "grep"), turn("c1", 1, "frobnicate"))
      q.processAllAvailable()
      input.addData(turn("c2", 0, "bash"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_enrich")
      .select("conv_id", "turn_idx", "category")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(("c1", 0, "search"), ("c1", 1, "unknown"), ("c2", 0, "shell")),
      s"got $got")
  }

  test("stateless curation ops (piiRedact → c4Clean chain) run unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "Streaming sentence number one stays.\nshort.\n" +
        "See the privacy policy for details.\nGood second sentence is here."),
      (2L, "mail a@b.co and more prose that keeps flowing along nicely."))
    val input = MemoryStream[(Long, String)]
    // the zero-shuffle expression-tree operators need no watermark/state:
    // the SAME DataFrame functions apply verbatim to a streaming frame
    val streamed = graft.operators.TrainingData.c4Clean(
      graft.operators.TrainingData.piiRedact(
        input.toDF().toDF("doc_id", "text"), "text")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("redacted").as("text")),
      "doc_id", "text")
    val q = streamed.writeStream.format("memory").queryName("curation_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.head)
      q.processAllAvailable()
      input.addData(docs(1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("curation_stream")
      .select("doc_id", "n_lines", "n_kept", "doc_keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val batch = graft.operators.TrainingData.c4Clean(
      graft.operators.TrainingData.piiRedact(
        docs.toDF("doc_id", "text"), "text")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("redacted").as("text")),
      "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "doc_keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == batch && got.size == 2, s"stream $got vs batch $batch")
  }

  test("StreamingSnapshot: per-batch tagged delta commits; crash replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Snapshot
    import graft.streaming.StreamingSnapshot
    val base = java.nio.file.Files.createTempDirectory("snapsink").toString
    val table = s"$base/table"
    val ckpt = s"$base/ckpt"
    val input = MemoryStream[(Long, String)]
    val q = StreamingSnapshot.sink(input.toDF().toDF("doc_id", "text"),
      table, ckpt, chunkKey = "doc_id", numChunks = 2)
    try {
      input.addData((1L, "first"), (2L, "second"))
      q.processAllAvailable()
      input.addData((3L, "third"))
      q.processAllAvailable()
    } finally q.stop()
    val afterStream = Snapshot.read(spark, table)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(afterStream == Set((1L, "first"), (2L, "second"), (3L, "third")))
    val tags = Snapshot.committedTags(table)
    assert(tags.contains("batch-0") && tags.contains("batch-1"), tags.toString)

    // at-least-once replay: re-delivering a committed batch must not write
    val replay = Seq((1L, "first"), (2L, "second")).toDF("doc_id", "text")
    assert(!StreamingSnapshot.appendBatch(replay, table, 0L, "doc_id", 2))
    assert(Snapshot.read(spark, table).count() == 3)
    // a genuinely new batch appends one more tagged delta
    val next = Seq((4L, "fourth")).toDF("doc_id", "text")
    assert(StreamingSnapshot.appendBatch(next, table, 2L, "doc_id", 2))
    assert(Snapshot.read(spark, table).count() == 4)
    assert(Snapshot.committedTags(table).contains("batch-2"))

    // downstream incremental consumer closes the ETL loop: each poll reads
    // ONLY the files the new micro-batches committed (manifest file-set
    // diff over the stream's append-only versions), never the history
    assert(Snapshot.readAppended(spark, table, 0)
      .select("doc_id").as[Long].collect().toSet == Set(3L, 4L))
    assert(Snapshot.readAppended(spark, table, 1, 2)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    assert(Snapshot.readAppended(spark, table,
      Snapshot.committedVersion(table).get).count() == 0)
  }

  test("stream-stream interval join == batch join; out-of-interval events dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def ts(sec: Int) = new java.sql.Timestamp(t0 + sec * 1000L)
    def turn(conv: String, idx: Int, sec: Int) =
      Turn(conv, idx, "assistant", "t", null, ts(sec))
    val turns = Seq(turn("c1", 0, 0), turn("c1", 1, 100), turn("c2", 0, 50))
    // events: within interval, before the turn (excluded), past the delay
    val events = Seq(
      ("c1", "search", ts(20)),   // matches c1/0 (Δ20) only — c1/1 is later
      ("c1", "browse", ts(140)),  // matches c1/1 (Δ40); c1/0 Δ140 > 60
      ("c2", "search", ts(40)),   // BEFORE c2/0 — excluded
      ("c2", "fetch", ts(115)))   // c2/0 Δ65 > 60 — excluded

    val ti = MemoryStream[Turn]
    val ei = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = graft.streaming.StreamingJoin.turnToolEvents(
      ti.toDF(),
      ei.toDF().toDF("e_conv_id", "e_tool", "ets"), maxDelaySec = 60)
    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      ti.addData(turns: _*)
      ei.addData(events(0), events(1))
      query.processAllAvailable()
      ei.addData(events(2), events(3))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("ss_join")
      .select("conv_id", "turn_idx", "e_tool").as[(String, Int, String)]
      .collect().toSet
    assert(got == Set(("c1", 0, "search"), ("c1", 1, "browse")), s"got $got")

    // batch plan of the SAME operator over the same data agrees
    val batch = graft.streaming.StreamingJoin.turnToolEvents(
      turns.toDF(), events.toDF("e_conv_id", "e_tool", "ets"), maxDelaySec = 60)
      .select("conv_id", "turn_idx", "e_tool").as[(String, Int, String)]
      .collect().toSet
    assert(batch == got)
  }
}
