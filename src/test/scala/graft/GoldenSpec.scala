package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.Extraction
import graft.sources.TranscriptGen
import graft.tools.GoldenGen

/** The north-rule invariant against CHECKED-IN goldens: both the
  * single-threaded oracle and the distributed pipeline must reproduce the
  * CSVs under src/test/resources/golden byte-for-byte (mirrors the
  * reference's committed CSV artifacts, SURVEY §5). */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden resource $name — run graft.tools.GoldenGen")
    new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
  }

  private lazy val oracleResults =
    ConvParser.parseAll(FixtureGen.turns(FixtureGen.TestProfile))
      .sortBy(tr => (tr.conv_id, tr.turn_idx))

  test("oracle reproduces the checked-in golden CSVs byte-for-byte") {
    assert(GoldenGen.recordsCsv(oracleResults) == resource("extracted_turns.csv"))
    assert(GoldenGen.spansCsv(oracleResults) == resource("spans.csv"))
  }

  test("distributed pipeline reproduces the checked-in golden CSVs byte-for-byte") {
    val turns = TranscriptGen.generate(spark, FixtureGen.TestProfile, parallelism = 8)
    val got = Extraction.extractSkewAware(turns,
        Extraction.Config(numPartitions = 8, monsterThreshold = 60))
      .collect().toSeq.sortBy(tr => (tr.conv_id, tr.turn_idx))
    assert(GoldenGen.recordsCsv(got) == resource("extracted_turns.csv"))
    assert(GoldenGen.spansCsv(got) == resource("spans.csv"))
  }
}
