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

  /** Seeded adversarial fuzz: random page soups over the marker vocabulary —
    * random marker order/duplication/truncation, CRLF and Unicode whitespace,
    * colonless variants, footers mid-text — far outside the template fixture
    * space. Any Scala/Python divergence on these is a real semantics bug in
    * one of the twins. */
  private def fuzzTurns(numConvs: Int, seed: Long): Seq[Turn] = {
    val covers = Vector(
      "CIS Red Hat Enterprise Linux 7\nBenchmark\nv3.1.1",
      "CIS Debian Linux 11\nBenchmark\nv1.0.0",
      "CIS Microsoft Windows Server 2019\nBenchmark\nv1.2.1",
      "CIS Microsoft Windows 10 Enterprise\nBenchmark\nv1.12.0",
      "CIS SomethingElse 99\nBenchmark",  // unknown type → conv invalid
      "no cover markers at all")
    val pieces = Vector(
      "Profile Applicability:", "Description:", "Rationale:", "Rationale",
      "Audit:", "\nAudit:", "Remediation:", "Default Value:", "CIS Controls:",
      "P a g e", "| P a g e", "Recommendations 1 ", "Recommendations 1",
      "(Automated)", "(Manual)", "(L1)", "(NG)", "1.1.1 Ensure thing",
      "2.3.4 Ensure other", "10.1 (L1) Ensure win", "lorem ipsum", "x y z",
      "Level 1 - Server", "v8", "1.2", "::", ":", " ", "",
      "Description", "Profile Applicability", "Default Value", "CIS Controls")
    val seps = Vector(" ", "\n", "\r\n", "  ", "\n ", " \n", "")
    // near-valid rule page + random mutations: completes records often, so
    // the fuzz exercises counter alignment / backfill / seen-dedup — not
    // just the per-page slicing that pure soup reaches
    def mutatedRulePage(r: scala.util.Random, k: Int): String = {
      val base = Vector(s"1.1.$k Ensure fuzz rule $k (Automated)",
        "Profile Applicability:", s" Level $k", "Description:", s" d$k",
        "Rationale:", s" r$k", "Audit:", s" a$k", "Remediation:", s" m$k",
        "Default Value:", s" v$k", "CIS Controls:", s" c$k", s"$k | P a g e")
      var lines = base
      (0 until r.nextInt(4)).foreach { _ =>
        r.nextInt(6) match {
          case 0 if lines.size > 2 => // drop a random line
            val i = r.nextInt(lines.size); lines = lines.patch(i, Nil, 1)
          case 1 => // duplicate a random line
            val i = r.nextInt(lines.size); lines = lines.patch(i, Seq(lines(i), lines(i)), 1)
          case 2 if lines.size > 2 => // swap two adjacent lines
            val i = r.nextInt(lines.size - 1)
            lines = lines.updated(i, lines(i + 1)).updated(i + 1, lines(i))
          case 3 => // strip a colon somewhere
            val i = r.nextInt(lines.size); lines = lines.updated(i, lines(i).replace(":", ""))
          case 4 => // inject an early footer / gate token
            val i = r.nextInt(lines.size)
            lines = lines.patch(i, Seq(if (r.nextBoolean()) "P a g e" else "Recommendations 1 "), 0)
          case _ => // splice in a soup fragment
            val i = r.nextInt(lines.size)
            lines = lines.patch(i, Seq(pieces(r.nextInt(pieces.size))), 0)
        }
      }
      lines.mkString(if (r.nextInt(5) == 0) "\r\n" else "\n")
    }
    (0 until numConvs).map { c =>
      val r = new scala.util.Random(seed ^ (c.toLong * 0x9E3779B97F4A7C15L))
      val nPages = 2 + r.nextInt(9)
      val gate = if (r.nextInt(5) > 0) Vector("Recommendations 1 Initial Setup") else Vector.empty
      val pages = Vector(covers(r.nextInt(covers.size))) ++ gate ++
        (0 until nPages).map { k =>
          if (r.nextBoolean()) mutatedRulePage(r, k)
          else {
            val n = r.nextInt(14)
            (0 until n).map(_ => pieces(r.nextInt(pieces.size)) +
              seps(r.nextInt(seps.size))).mkString
          }
        }
      pages.zipWithIndex.map { case (text, i) =>
        Turn(f"convfuzz$c%05d", i, "user", text, null,
          new java.sql.Timestamp(1700000000000L + i))
      }
    }.flatten
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "target/crosscheck"
    val fuzzConvs = if (args.length > 1) args(1).toInt else 400
    val fuzzSeed = if (args.length > 2) args(2).toLong else 0xF0221L
    Files.createDirectories(Paths.get(outDir))
    val turns = FixtureGen.turns(FixtureGen.TestProfile) ++ edgeTurns ++
      fuzzTurns(fuzzConvs, fuzzSeed)
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
