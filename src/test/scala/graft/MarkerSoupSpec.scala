package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{KeywordWindows, LineFsm, TurnSlim}

/** X4/X5 adversarial fuzz, the way the rule-FSM was fuzzed (round-3 verdict
  * #8): ~3000 marker-soup pages over 300 conversations with a FRESH seed
  * (independent of the committed soup160 fixture that the DuckDB fuzz
  * queries pin cross-engine), asserting the DISTRIBUTED planes equal the
  * single-threaded per-conversation models under shuffling + grouping. */
class MarkerSoupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def soup(seed: Long, convs: Int): Seq[TurnSlim] = {
    val rnd = new java.util.Random(seed)
    val names = Seq("Description", "Rationale", "Impact", "Audit",
      "Remediation", "CIS Controls", "Impact Audit", "description", "AUDIT",
      "CIS Controls Impact", "ImpactAudit:Remediation")
    val fillers = Seq("", "a:b:c", "x | y", "  pad  ", "cis control (7) x",
      "CIS  Control ( a:b )", "impact:none", "::", "rationale impact",
      "audit impact audit", "cis control (open", "tail",
      "description rationale impact audit remediation cis control (z)")
    (0 until convs).flatMap { c =>
      (0 until (1 + rnd.nextInt(9))).map { t =>
        val lines = (0 until (1 + rnd.nextInt(12))).map { _ =>
          rnd.nextInt(3) match {
            case 0 => names(rnd.nextInt(names.size)) +
              (if (rnd.nextBoolean()) ":" else "") +
              (if (rnd.nextBoolean()) " " + fillers(rnd.nextInt(fillers.size)) else "")
            case 1 => fillers(rnd.nextInt(fillers.size))
            case _ => "  " + names(rnd.nextInt(names.size)) + " " +
              fillers(rnd.nextInt(fillers.size))
          }
        }
        TurnSlim(s"fz-$c", t, (s"hdr $c.$t" +: lines).mkString("\n"))
      }
    }
  }

  test("distributed lineFsm == single-threaded FSM on 300 fresh-seed soup conversations") {
    import spark.implicits._
    val turns = soup(0xF4E5EED1L, 300)
    info(s"${turns.size} soup pages")
    val got = graft.operators.LineSections
      .lineFsm(spark.createDataset(turns), numPartitions = 16)
      .collect().map(r => (r.conv_id, r.section, r.row, Option(r.value)))
      .toSet
    val exp = turns.groupBy(_.conv_id).iterator.flatMap { case (cid, ts) =>
      val sorted = ts.sortBy(_.turn_idx)
      val parsed = LineFsm.parseDocument(sorted.map(_.text))
      val title = sorted.head.text.split('\n').headOption.getOrElse("")
      val n = if (parsed.isEmpty) 0 else parsed.map(_.row).max + 1
      parsed.map(sv => (cid, sv.section, sv.row, Option(sv.value))) ++
        (0 until n).map(i => (cid, "Title", i, Option(title)))
    }.toSet
    assert(got == exp, s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("distributed keywordWindows == single-threaded parsePage on fresh-seed soup") {
    import spark.implicits._
    val turns = soup(0xF4E5EED2L, 300)
    val got = graft.operators.LineSections
      .keywordWindows(spark.createDataset(turns))
      .collect().map(r => (r.conv_id, r.turn_idx, r.key, r.row,
        r.description, r.rationale, r.impact, r.audit, r.remediation,
        r.cis_control)).toSet
    val exp = turns.flatMap { t =>
      KeywordWindows.parsePage(t.text).map { pr =>
        def v(k: String) = pr.values.getOrElse(k, "")
        (t.conv_id, t.turn_idx, pr.key, pr.row, v("description"),
          v("rationale"), v("impact"), v("audit"), v("remediation"),
          v("cis control"))
      }
    }.toSet
    assert(got == exp, s"missing=${(exp -- got).take(2)} extra=${(got -- exp).take(2)}")
  }
}
