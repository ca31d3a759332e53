package graft.core

import scala.collection.mutable

/** Variant-B sectionizer: the line-walking FSM of
  * `/root/reference/mutiple_pdf_cis.py:16-34` (`parse_cis_benchmark`).
  *
  * Semantics reproduced exactly:
  *  - a line *containing* any of the 6 keywords opens a section named
  *    `line.split(":")[0].strip()` — note the NAME is taken from the line, not
  *    from the keyword list, so `"Impact Audit:"` opens section `"Impact Audit"`;
  *  - the opening line's content is `line.split(":")[1].strip()` if the line has
  *    a colon, else `""` — Python `split(":")[1]` is the segment between the
  *    first and second colon;
  *  - every following non-header line appends `" " + line.strip()` to the OPEN
  *    section's LAST value;
  *  - state persists across pages (turns) of one document (conversation);
  *  - list-length equalization pads with null (mutiple_pdf_cis.py:37-42, X13).
  */
object LineFsm {

  val Sections: Seq[String] =
    Seq("Description", "Rationale", "Impact", "Audit", "Remediation", "CIS Controls")

  /** One accumulated section occurrence: (section name, row index, value). */
  case class SectionValue(section: String, row: Int, value: String)

  final class State {
    // python dict preserves insertion order
    private[core] val data = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    private[core] var current: String = null

    def feedLine(line: String): Unit = {
      if (Sections.exists(line.contains)) {
        val name = PyStr.strip(PyStr.beforeFirst(line, ":"))
        val content =
          if (line.contains(":")) {
            // python line.split(":")[1]: between first and second colon
            val after = line.substring(line.indexOf(':') + 1)
            PyStr.strip(PyStr.beforeFirst(after, ":"))
          } else ""
        current = name
        data.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += content
      } else if (current != null) {
        val buf = data(current)
        buf(buf.length - 1) = buf.last + " " + PyStr.strip(line)
      }
    }

    // limit -1: Python's page.split('\n') KEEPS trailing empty lines, and
    // each one appends " " + "".strip() to the open section — a page ending
    // in '\n' leaves a trailing space the reference's values carry
    def feedPage(page: String): Unit = page.split("\n", -1).foreach(feedLine)

    /** Long-form result after equalization (null-padded to max length). */
    def result(): Seq[SectionValue] = {
      if (data.isEmpty) return Nil
      val maxLen = data.valuesIterator.map(_.length).max
      data.iterator.flatMap { case (k, vs) =>
        (0 until maxLen).map(i => SectionValue(k, i, if (i < vs.length) vs(i) else null))
      }.toSeq
    }
  }

  /** Parse a whole document (sequence of page texts). */
  def parseDocument(pages: Seq[String]): Seq[SectionValue] = {
    val st = new State
    pages.foreach(st.feedPage)
    st.result()
  }
}
