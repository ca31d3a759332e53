package graft.tools

import java.nio.file.{Files, Paths}
import graft.core._

/** Generates the checked-in golden CSVs (FIXTURES.md §B) from the
  * single-threaded oracle over the pinned TestProfile fixtures:
  *   src/test/resources/golden/extracted_turns.csv — assembled records
  *   src/test/resources/golden/spans.csv           — per-turn labeled spans
  * Mirrors the reference's committed-artifact practice (CIS_Benchmarks.csv).
  * Run once; GoldenSpec compares both the oracle AND the distributed pipeline
  * against these files forever after. */
object GoldenGen {

  def csvEscape(s: String): String =
    if (s == null) ""
    else if (s.contains(",") || s.contains("\"") || s.contains("\n") || s.contains("\r"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def recordsCsv(results: Seq[TurnResult]): String = {
    val sb = new StringBuilder
    sb.append("conv_id,turn_idx,Rule,Profile Applicability,Description,Rationale,Audit,Remediation,Default Value,CIS Controls\n")
    results.foreach { tr =>
      tr.record.foreach { r =>
        sb.append(Seq(tr.conv_id, tr.turn_idx.toString, r.rule,
          r.profile_applicability, r.description, r.rationale, r.audit,
          r.remediation, r.default_value, r.cis_controls)
          .map(csvEscape).mkString(",")).append('\n')
      }
    }
    sb.toString
  }

  def spansCsv(results: Seq[TurnResult]): String = {
    val sb = new StringBuilder
    sb.append("conv_id,turn_idx,label,start,end,text\n")
    results.foreach { tr =>
      tr.spans.foreach { sp =>
        sb.append(Seq(tr.conv_id, tr.turn_idx.toString, sp.label,
          sp.start.toString, sp.end.toString, sp.text)
          .map(csvEscape).mkString(",")).append('\n')
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get("src/test/resources/golden")
    Files.createDirectories(outDir)
    val results = ConvParser.parseAll(FixtureGen.turns(FixtureGen.TestProfile))
      .sortBy(tr => (tr.conv_id, tr.turn_idx))
    Files.writeString(outDir.resolve("extracted_turns.csv"), recordsCsv(results))
    Files.writeString(outDir.resolve("spans.csv"), spansCsv(results))
    println(s"records=${results.count(_.record.isDefined)} spans=${results.map(_.spans.size).sum}")
  }
}
