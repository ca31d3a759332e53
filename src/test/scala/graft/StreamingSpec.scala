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
}
