package graft.core

import java.util.regex.Pattern

/** Document-type classification from the cover text — P9 in SURVEY §2.2,
  * `/root/reference/cis_pdf_parser.py:62-82` — plus the P8 front-matter gate
  * (":85-95").
  *
  * Reference behavior reproduced exactly:
  *  - cover regex `(?<=CIS).*(?=Benchmark)` with DOTALL; on match, the name is
  *    `group(0).strip().replace('\n','')` and a known-name lookup picks the
  *    per-type rule pattern;
  *  - QUIRK kept: when the cover regex does NOT match, the reference silently
  *    leaves `pattern` bound to the cover regex itself and parses with it
  *    (`pattern` is reassigned only inside the `if rerule is not None` branch);
  *  - an unrecognized CIS name raises ValueError in the reference (uncaught →
  *    process dies); we map it to a per-conversation validity flag instead of a
  *    job abort (north-rule: flag, don't kill a 10^12-turn job);
  *  - the front-matter gate scans ALL pages for `"Recommendations 1 "` and keeps
  *    the LAST hit as the first content page; absence → invalid conversation
  *    (reference exits).
  */
object DocType {

  val CoverPattern: Pattern =
    Pattern.compile("(?<=CIS).*(?=Benchmark)", Pattern.DOTALL)

  /** Per-type rule-header regexes, verbatim from cis_pdf_parser.py:71-77
    * (including the `\.\d.\d*` any-char quirk in the default pattern). */
  val LinuxPattern = "(\\d+(?:\\.\\d.\\d*)+)(.*?)(\\(Automated\\)|\\(Manual\\))"
  val Win2019Pattern =
    "(\\d+(?:\\.\\d+)+)\\s\\(((L[12])|(NG))\\)(.*?)(\\(Automated\\)|\\(Manual\\))"
  val Win10Pattern =
    "(\\d+(?:\\.\\d+)+)\\s\\(((L[12])|(NG)|(BL))\\)(.*?)(\\(Automated\\)|\\(Manual\\))"

  sealed trait Classification { def docType: String }
  /** Parse with this pattern. */
  final case class Classified(docType: String, pattern: String) extends Classification
  /** Reference raises ValueError → our validity flag. */
  final case class UnknownName(name: String) extends Classification {
    def docType: String = "unknown:" + name
  }

  def classify(coverText: String): Classification = {
    val m = CoverPattern.matcher(coverText)
    if (!m.find())
      // quirk: pattern stays the cover regex (cis_pdf_parser.py:65 never
      // reassigned) — sourced from CoverPattern so the classifier and the
      // FSM can never drift onto different spellings
      Classified("no-cover-match", CoverPattern.pattern())
    else {
      val name = PyStr.strip(m.group(0)).replace("\n", "")
      if (name.contains("Red Hat Enterprise Linux 7")) Classified("rhel7", LinuxPattern)
      else if (name.contains("Debian Linux 11")) Classified("debian11", LinuxPattern)
      else if (name.contains("Microsoft Windows Server 2019"))
        Classified("win2019", Win2019Pattern)
      else if (name.contains("Microsoft Windows 10 Enterprise"))
        Classified("win10", Win10Pattern)
      else UnknownName(name)
    }
  }

  /** P8: ordinal position (in sorted turn order) of the LAST turn whose text
    * contains `"Recommendations 1 "`; None → not a benchmark conversation. */
  def firstContentOrdinal(texts: IterableOnce[String]): Option[Int] = {
    var last = -1
    var i = 0
    val it = texts.iterator
    while (it.hasNext) {
      if (it.next().contains("Recommendations 1 ")) last = i
      i += 1
    }
    if (last < 0) None else Some(last)
  }
}
