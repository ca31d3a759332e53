package graft.core

import java.sql.Timestamp
import java.util.Random

/** Deterministic synthetic transcript generator (FIXTURES.md §A).
  *
  * Pure function of (convIndex, profile): each conversation is generated from its
  * own `java.util.Random(seed ^ convIndex)` stream, so the table is identical
  * regardless of partitioning or parallelism — the property the golden tests and
  * the scaling bench rely on. No wall-clock anywhere.
  *
  * The per-turn text grammar exercises every FSM branch of
  * `/root/reference/cis_pdf_parser.py:118-218`: cover turn (doc-type dispatch),
  * TOC front matter (P8 gate), rule turns with all/partial sections, sections
  * split across consecutive turns (cross-turn carry), no-op chatter turns
  * (seenList suppression), repeated full-rule turns (duplicate emission path),
  * Default Value sometimes absent (backfill ":191-194"), HTML payload turns
  * (boilerplate strip stage), and invalid conversations (unknown doc type / no
  * "Recommendations 1 " gate).
  */
object FixtureGen {

  case class Profile(
      numConvs: Int,
      seed: Long = 42L,
      monsterEvery: Int = 200, // every k-th conv is a "monster" (skew fixture)
      monsterTurns: Int = 1200,
      invalidEvery: Int = 17)

  private val words = Array(
    "ensure", "system", "access", "control", "service", "audit", "policy",
    "configured", "network", "kernel", "module", "password", "permission",
    "logging", "daemon", "secure", "remote", "filesystem", "account", "session")

  private def sentence(r: Random, n: Int): String =
    Array.fill(n)(words(r.nextInt(words.length))).mkString(" ")

  private def ruleHeader(r: Random, docType: String, seq: Int): String = {
    val a = 1 + seq / 10
    val b = 1 + seq % 10
    val c = 1 + r.nextInt(9)
    val mode = if (r.nextBoolean()) "(Automated)" else "(Manual)"
    val title = sentence(r, 4)
    docType match {
      case "win2019" => s"$a.$b.$c (L${1 + r.nextInt(2)}) Ensure $title $mode"
      case "win10" =>
        val lvl = Array("L1", "L2", "NG", "BL").apply(r.nextInt(4))
        s"$a.$b.$c ($lvl) Ensure $title $mode"
      case _ => s"$a.$b.$c Ensure $title $mode"
    }
  }

  /** One full rule page; withDefval=false exercises the backfill path. */
  private def rulePage(r: Random, docType: String, seq: Int,
                       withDefval: Boolean): String = {
    val sb = new StringBuilder
    sb.append(ruleHeader(r, docType, seq)).append('\n')
    sb.append("Profile Applicability:\n Level ").append(1 + r.nextInt(2))
      .append(" - Server\n")
    sb.append("Description:\n ").append(sentence(r, 8)).append('\n')
    sb.append("Rationale:\n ").append(sentence(r, 10)).append('\n')
    sb.append("Audit:\n Run the following command:\n # ")
      .append(sentence(r, 3)).append('\n')
    sb.append("Remediation:\n Edit the file and ").append(sentence(r, 6)).append('\n')
    if (withDefval) sb.append("Default Value:\n ").append(sentence(r, 3)).append('\n')
    sb.append("CIS Controls:\n v8 ").append(1 + r.nextInt(18)).append('.')
      .append(1 + r.nextInt(9)).append(' ').append(sentence(r, 4)).append('\n')
    sb.append(100 + r.nextInt(800)).append(" | P a g e\n")
    sb.toString
  }

  /** A rule split across two pages: header+profile+description, then the rest. */
  private def splitRulePages(r: Random, docType: String, seq: Int): (String, String) = {
    val p1 = new StringBuilder
    p1.append(ruleHeader(r, docType, seq)).append('\n')
    p1.append("Profile Applicability:\n Level 1 - Server\n")
    p1.append("Description:\n ").append(sentence(r, 8)).append('\n')
    p1.append(100 + r.nextInt(800)).append(" | P a g e\n")
    val p2 = new StringBuilder
    p2.append("Rationale:\n ").append(sentence(r, 10)).append('\n')
    p2.append("Audit:\n Verify via:\n # ").append(sentence(r, 3)).append('\n')
    p2.append("Remediation:\n ").append(sentence(r, 6)).append('\n')
    p2.append("Default Value:\n ").append(sentence(r, 3)).append('\n')
    p2.append("CIS Controls:\n v8 5.2 ").append(sentence(r, 4)).append('\n')
    p2.append(100 + r.nextInt(800)).append(" | P a g e\n")
    (p1.toString, p2.toString)
  }

  private def chatter(r: Random): String =
    sentence(r, 5 + r.nextInt(15)).capitalize + "."

  /** Pipe-delimited table block payload (S3/P5/X12 fixture): duplicate
    * header names and one wrong-arity row included. */
  private def tablePayload(r: Random): String = {
    val sb = new StringBuilder
    sb.append("Summary of controls\n")
    sb.append("Controls Version | Control | Control\n")
    for (_ <- 0 until 2 + r.nextInt(4))
      sb.append("v").append(7 + r.nextInt(2)).append(" | ")
        .append(1 + r.nextInt(18)).append('.').append(1 + r.nextInt(9))
        .append(' ').append(sentence(r, 3)).append(" | ")
        .append(if (r.nextBoolean()) "TRUE" else "FALSE").append('\n')
    sb.append("v9 | arity mismatch row\n") // dropped by the P5 filter
    sb.append(sentence(r, 4))
    sb.toString
  }

  private def htmlPayload(r: Random): String = {
    val main = sentence(r, 12)
    s"""<html><head><title>doc</title><style>p{color:red}</style></head><body>
<nav><a href="/">home</a> <a href="/x">x</a></nav>
<header><h1>Site ${r.nextInt(100)}</h1></header>
<div id="main"><p>$main</p><p>${sentence(r, 9)}.</p></div>
<footer><a href="/about">about</a> copyright</footer>
</body></html>"""
  }

  private val docTypes = Array("rhel7", "debian11", "win2019", "win10")
  private def coverText(docType: String): String = docType match {
    case "rhel7"    => "CIS Red Hat Enterprise Linux 7\nBenchmark\nv3.1.1 - 2021"
    case "debian11" => "CIS Debian Linux 11\nBenchmark\nv1.0.0 - 2022"
    case "win2019"  => "CIS Microsoft Windows Server 2019\nBenchmark\nv1.2.1"
    case "win10"    => "CIS Microsoft Windows 10 Enterprise\nBenchmark\nv1.12.0"
    case other      => s"CIS $other\nBenchmark\nv0.0.1"
  }

  /** Generate one conversation's turns, sorted by turn_idx. */
  def conversation(p: Profile, convIdx: Long): IndexedSeq[Turn] = {
    val r = new Random(p.seed ^ (convIdx * 0x9E3779B97F4A7C15L))
    val convId = f"conv$convIdx%08d"
    val isMonster = p.monsterEvery > 0 && convIdx % p.monsterEvery == p.monsterEvery - 1
    val invalidKind = if (p.invalidEvery > 0 && convIdx % p.invalidEvery == 3)
      (if (r.nextBoolean()) "unknown" else "nogate") else "valid"

    val docType = docTypes(r.nextInt(docTypes.length))
    val pages = Vector.newBuilder[String]

    // cover
    pages += (if (invalidKind == "unknown") coverText("SuperCustom OS 99")
              else coverText(docType))
    // front matter / TOC noise
    val tocN = 1 + r.nextInt(3)
    for (_ <- 0 until tocN)
      pages += ("Table of Contents\n" +
        Array.fill(4)(sentence(r, 3) + " ....... " + (1 + r.nextInt(90))).mkString("\n"))
    // the P8 gate page (absent for "nogate" conversations)
    if (invalidKind != "nogate")
      pages += s"Recommendations 1 Initial Setup\n${sentence(r, 6)}"

    val nRules = if (isMonster) p.monsterTurns else 1 + r.nextInt(6)
    var seq = 0
    while (seq < nRules) {
      r.nextInt(10) match {
        case 0 => // split rule across two turns (cross-turn carry)
          val (a, b) = splitRulePages(r, docType, seq)
          pages += a
          if (r.nextInt(4) == 0) pages += chatter(r) // interleaved chatter
          pages += b
        case 1 =>
          pages += rulePage(r, docType, seq, withDefval = false) // backfill path
        case 2 =>
          val pg = rulePage(r, docType, seq, withDefval = true)
          pages += pg
          pages += pg // repeated full page → duplicate emission path
        case 3 =>
          pages += htmlPayload(r)
          pages += rulePage(r, docType, seq, withDefval = true)
        case 4 =>
          pages += chatter(r)
          pages += rulePage(r, docType, seq, withDefval = true)
        case 5 =>
          pages += tablePayload(r)
          pages += rulePage(r, docType, seq, withDefval = true)
        case _ =>
          pages += rulePage(r, docType, seq, withDefval = r.nextInt(3) > 0)
      }
      seq += 1
    }
    pages += chatter(r) // trailing no-op turn (seenList suppression)

    val ps = pages.result()
    val roles = Array("user", "assistant", "tool")
    val baseTs = 1700000000000L + convIdx * 977L
    ps.zipWithIndex.map { case (text, i) =>
      // mod BEFORE the Int narrowing: (convIdx + i).toInt wraps negative
      // near Int.MaxValue and roles(-1) would throw; same value otherwise
      val role = roles(((convIdx + i) % 3).toInt)
      Turn(convId, i, role,
        text,
        if (role == "tool") "pdf_reader" else null,
        new Timestamp(baseTs + i * 31000L))
    }
  }

  /** All turns of a profile — oracle/test-scale only (driver-side memory). */
  def turns(p: Profile): Seq[Turn] =
    (0L until p.numConvs.toLong).flatMap(conversation(p, _))

  /** Small unit/golden-test profile (FIXTURES.md: ~200 convs / ~3k turns). */
  val TestProfile: Profile = Profile(numConvs = 200, monsterEvery = 97,
    monsterTurns = 120, invalidEvery = 17)
}
