package graft.tools

import java.nio.file.{Files, Paths}
import graft.core._

/** Dev harness: dump the fixture conversations' page texts plus the Scala
  * oracle's per-turn extractions as JSON, so an external replica of the
  * reference's loop can be diffed against them (semantics pinning, SURVEY §5.1).
  * Run: sbt "runMain graft.tools.CrossCheckDump target/crosscheck" */
object CrossCheckDump {

  /** Hand-written adversarial pages pinning the FSM's edge semantics. */
  private def edgeTurns: Seq[Turn] = {
    val pages = Vector(
      "CIS Red Hat Enterprise Linux 7\nBenchmark",
      "Recommendations 1 Initial Setup",
      // markers out of document order: split/partition use FIRST occurrence
      "CIS Controls: ctl one P a g e\nRemediation: fix it\nDescription: ddd\nRationale: rrr\nProfile Applicability: lvl\nDescription: second",
      // rule header with no sections at all
      "1.1.1 Ensure edge case zero (Automated)",
      // end-marker absent → partition keeps whole tail; empty-tail marker
      "Description: tail runs to end with no terminator",
      "Description:",
      // Audit needs a LEADING newline: first token here must NOT match
      "Audit: not matched at string start\nAudit: matched here\nRemediation follows",
      // CRLF + unicode whitespace (NBSP / NEL) around values
      "Profile Applicability:\r\n Level 1\r\nDescription: x\r\nRationale: y\r\nAudit typo no colon",
      // same marker twice: split takes first; 'Rationale' word terminates description early
      "Description: first Rationale word cuts here\nDescription: ignored\nRationale: real\nAudit: a\nRemediation: r\nCIS Controls: c P a g e",
      // defval present but cis absent → defval_count runs ahead, backfill must NOT fire next time
      "1.1.2 Ensure dv ahead (Manual)\nProfile Applicability: L\nDescription: d\nRationale: ra\nAudit: au\nRemediation: re\nDefault Value: dv only",
      "CIS Controls: now closing P a g e",
      // empty page, then a complete rule page
      "",
      "1.1.3 Ensure full (Automated)\nProfile Applicability:\n L1\nDescription:\n dd\nRationale:\n rr\nAudit:\n aa\nRemediation:\n rm\nDefault Value:\n dv\nCIS Controls:\n v8 1.2 x\n17 | P a g e",
      "plain chatter, counters frozen, seenList suppresses")
    pages.zipWithIndex.map { case (text, i) =>
      Turn("convedge0", i, "user", text, null, new java.sql.Timestamp(1700000000000L + i))
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "target/crosscheck"
    Files.createDirectories(Paths.get(outDir))
    val turns = FixtureGen.turns(FixtureGen.TestProfile) ++ edgeTurns
    val byConv = turns.groupBy(_.conv_id).toSeq.sortBy(_._1)

    val pagesJson = Json.obj(byConv.map { case (cid, ts) =>
      cid -> Json.arr(ts.sortBy(_.turn_idx).map(t => Json.str(t.text)))
    }: _*)
    Files.writeString(Paths.get(s"$outDir/pages.json"), pagesJson)

    val results = ConvParser.parseAll(turns)
    val recs = results.flatMap { tr =>
      tr.record.map { r =>
        Json.obj(
          "conv" -> Json.str(tr.conv_id), "turn" -> tr.turn_idx.toString,
          "row" -> Json.arr(Seq(r.rule, r.profile_applicability, r.description,
            r.rationale, r.audit, r.remediation, r.default_value, r.cis_controls)
            .map(Json.str)))
      }
    }
    val spans = results.flatMap { tr =>
      tr.spans.map(sp => Json.obj(
        "conv" -> Json.str(tr.conv_id), "turn" -> tr.turn_idx.toString,
        "label" -> Json.str(sp.label), "start" -> sp.start.toString,
        "end" -> sp.end.toString, "text" -> Json.str(sp.text)))
    }
    val invalid = results.filter(!_.valid).map(tr =>
      Json.obj("conv" -> Json.str(tr.conv_id), "turn" -> tr.turn_idx.toString))
    Files.writeString(Paths.get(s"$outDir/scala.json"), Json.obj(
      "records" -> Json.arr(recs),
      "spans" -> Json.arr(spans),
      "invalid_turns" -> Json.arr(invalid)))
    println(s"convs=${byConv.size} turns=${turns.size} records=${recs.size} spans=${spans.size}")
  }
}
