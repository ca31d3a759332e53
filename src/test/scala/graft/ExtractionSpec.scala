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

  test("records/spans views are consistent with the per-turn results") {
    val turns = TranscriptGen.generate(spark, profile, parallelism = 8)
    val results = Extraction.extract(turns, Extraction.Config(numPartitions = 8))
    val recs = Extraction.records(results).collect()
    assert(recs.length == oracle.count(_.record.isDefined))
    val spanCount = Extraction.spansLong(results).count()
    assert(spanCount == oracle.map(_.spans.size).sum)
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
