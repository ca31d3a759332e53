package graft.core

import java.util.regex.Pattern

/** HTML main-content extraction: boilerplate strip via DOM-block heuristics.
  *
  * The reference never parses HTML (PDF only); the north rule adds "HTML
  * boilerplate strip / DOM heuristics" for embedded HTML payload turns, so these
  * semantics are NEW code pinned by our own goldens (SURVEY §7 step 5). Design is
  * the classic block-level link/tag-density heuristic (Kohlschütter et al.,
  * "Boilerplate Detection using Shallow Text Features", WSDM 2010 — public):
  *
  *  1. drop <script>/<style>/<noscript>/<template> subtrees and comments;
  *  2. drop whole <nav>/<header>/<footer>/<aside> container blocks;
  *  3. split the remainder into blocks at block-level tags;
  *  4. score each block: link density = chars inside <a> / total text chars;
  *     drop blocks with link density > 0.5, or fewer than 10 text chars that
  *     are purely navigational punctuation;
  *  5. strip remaining inline tags, decode the 5 core entities, collapse
  *     horizontal whitespace, join blocks with single newlines.
  *
  * Pure function of the input string — deterministic, no DOM library.
  */
object Boilerplate {

  private val DropSubtree = Pattern.compile(
    "(?is)<(script|style|noscript|template)\\b[^>]*>.*?</\\1\\s*>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val DropContainer = Pattern.compile(
    "(?is)<(nav|header|footer|aside)\\b[^>]*>.*?</\\1\\s*>")
  private val BlockBreak = Pattern.compile(
    "(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|section|article|main|br|blockquote|pre)\\b[^>]*>")
  private val AnchorText = Pattern.compile("(?is)<a\\b[^>]*>(.*?)</a\\s*>")
  // tag-SHAPED only: </?letter...>, comments, <!doctype...>. A bare
  // '<[^>]*>' would classify "for (i = 0; i < n; i++) a > b" as HTML and
  // stripTags would eat '< n; i++) a >' — plain-text corruption on the
  // apply-to-every-turn path (Extraction stripHtml=true).
  private val AnyTag = Pattern.compile("(?s)</?[A-Za-z][^>]*>|<!--.*?-->|<![^>]*>")

  def isHtml(s: String): Boolean = s.indexOf('<') >= 0 && AnyTag.matcher(s).find()

  private def stripTags(s: String): String =
    AnyTag.matcher(s).replaceAll(" ")

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def collapse(s: String): String =
    PyStr.strip(s.replaceAll("[ \\t\\x0B\\f\\r]+", " "))

  /** Extract main content from an HTML payload; non-HTML input is returned
    * unchanged (so the stage is safe to apply to every turn). */
  def stripHtml(html: String): String = {
    if (!isHtml(html)) return html
    var s = Comment.matcher(html).replaceAll(" ")
    s = DropSubtree.matcher(s).replaceAll(" ")
    s = DropContainer.matcher(s).replaceAll(" ")
    val blocks = BlockBreak.matcher(s).replaceAll("\u0000").split('\u0000')
    val kept = blocks.iterator.map { b =>
      val anchors = {
        val m = AnchorText.matcher(b)
        val sb = new StringBuilder
        while (m.find()) sb.append(stripTags(m.group(1)))
        sb.toString
      }
      val text = collapse(decodeEntities(stripTags(b)))
      val anchorLen = collapse(decodeEntities(anchors)).length
      (text, anchorLen)
    }.filter { case (text, anchorLen) =>
      text.nonEmpty &&
        (text.length >= 10 || text.exists(_.isLetterOrDigit)) &&
        (anchorLen.toDouble / math.max(text.length, 1)) <= 0.5
    }.map(_._1).toVector
    kept.mkString("\n")
  }
}
