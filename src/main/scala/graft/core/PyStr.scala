package graft.core

/** Python string-operation semantics, reproduced exactly.
  *
  * The reference pipeline (`/root/reference/cis_pdf_parser.py:134-196`) is built on
  * `str.split(sep, 1)`, `str.partition(sep)` and `str.strip()`, whose edge behavior
  * differs from the nearest Java/Scala equivalents:
  *
  *  - `s.split(sep, 1)[1]` RAISES IndexError when `sep` is absent (list has one
  *    element). The reference catches that and *skips the section*, keeping the
  *    previously-carried value — so "marker absent" must be distinguishable from
  *    "marker present with empty tail". We model it as `Option`.
  *  - `s.partition(sep)` never raises: absent separator → `(s, "", "")`.
  *  - Python `str.strip()` strips all Unicode whitespace per `str.isspace()`,
  *    which includes U+00A0 NBSP and U+0085 NEL; Java `String.trim` only strips
  *    chars <= U+0020 and `String.strip` uses `Character.isWhitespace`, which
  *    excludes NBSP. We implement the Python set.
  */
object PyStr {

  /** `s.split(sep, 1)`: `Some((head, tail))` iff `sep` occurs in `s`, else `None`
    * (the reference's IndexError path, cis_pdf_parser.py:140-141). */
  def splitOnce(s: String, sep: String): Option[(String, String)] = {
    val i = s.indexOf(sep)
    if (i < 0) None else Some((s.substring(0, i), s.substring(i + sep.length)))
  }

  /** `s.partition(sep)` → (before, sep-or-empty, after). */
  def partition(s: String, sep: String): (String, String, String) = {
    val i = s.indexOf(sep)
    if (i < 0) (s, "", "") else (s.substring(0, i), sep, s.substring(i + sep.length))
  }

  /** Python whitespace per `str.isspace()`: ASCII ws (incl. VT), the C0 file/
    * group/record/unit separators, NEL, NBSP, and Unicode space/line/paragraph
    * separators. */
  def isPySpace(c: Char): Boolean =
    c match {
      case ' ' | '\t' | '\n' | '\r' | '\f' | '\u000b' => true
      case '\u001c' | '\u001d' | '\u001e' | '\u001f'  => true // FS GS RS US
      case '\u0085' | '\u00a0'                        => true // NEL NBSP
      case _ =>
        val t = Character.getType(c)
        t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
        t == Character.PARAGRAPH_SEPARATOR
    }

  /** `s.strip()` with the Python whitespace set. */
  def strip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** `line.split(":")[0]` — text before the first ':' (whole string if absent),
    * as used by the line-FSM variant (mutiple_pdf_cis.py:27). */
  def beforeFirst(s: String, sep: String): String = {
    val i = s.indexOf(sep)
    if (i < 0) s else s.substring(0, i)
  }
}
