package graft.core

import java.util.{ArrayList, HashMap}

/** Faithful JVM transcription of CPython `difflib.SequenceMatcher(None, a,
  * b)` restricted to what `.ratio()` needs, plus fuzzywuzzy's
  * `token_sort_ratio` on top of it.
  *
  * Why difflib and not Levenshtein: the reference pins no python-Levenshtein
  * (requirements.txt/Pipfile carry only PyMuPDF), so fuzzywuzzy's
  * `fuzz.ratio` falls back to `difflib.SequenceMatcher` — the SAME
  * Ratcliff-Obershelp kernel its SequenceMatcher scripts use directly
  * (`Sequence matcher.py:12-14`, `bestmatch.py:12-14`, `fuzzy.py:13-14`).
  * One kernel therefore reproduces every string-similarity score in the
  * reference.
  *
  * Faithfulness notes:
  *  - operates on Unicode CODE POINTS (Python `str` indexing); for
  *    supplementary-plane text Java's UTF-16 would otherwise diverge.
  *  - `autojunk=True` is modeled: when len(b) >= 200, characters occupying
  *    more than 1% of b are "popular" and excluded from match SEEDING
  *    (b2j). CPython's extension loops test `isbjunk`, which reads the
  *    `bjunk` set — EMPTY when isjunk=None — never `bpopular`: so the
  *    non-junk extension loops walk straight through popular characters
  *    and the junk loops never fire. (An earlier transcription treated
  *    popular as junk in the extension loops and diverged from difflib on
  *    ~8% of structured ≥200-char pairs.)
  *  - `ratio()` returns 1.0 when both strings are empty (difflib
  *    `_calculate_ratio`).
  *  - tie-breaking: `find_longest_match` keeps the FIRST maximal block in
  *    (i, j) scan order — the earliest-in-a, then earliest-in-b block.
  *  - fuzzywuzzy decorator chain on `fuzz.ratio` (0.18.0): equal PROCESSED
  *    strings → 100 (`@check_for_equivalence`, fires before the
  *    empty-string guard, so two empty/punctuation-only inputs score 100);
  *    then either empty → 0; `force_ascii=True` runs `asciidammit`, which
  *    on Python 3 DELETES code points U+0080–U+00FF (and keeps >= U+0100).
  *  - token sort compares CODE POINTS (Python `sorted()`), not UTF-16
  *    units — differs from `String#compareTo` beyond the BMP.
  *
  * Divergences (documented, not observable on the ASCII oracle fixtures):
  * Python `str.lower()` vs `String.toLowerCase(ROOT)` on a few locale-ful
  * code points; Python `\w` includes No/Nl number categories that
  * `Character.isLetterOrDigit` excludes.
  *
  * Complexity: O(|a|·|b|) worst case per pair — cap operand length at the
  * call site for adversarial corpora (the expression wrappers score what
  * they are given; the reference scripts score short header/title cells). */
object SeqMatcher {

  /** difflib.SequenceMatcher(None, a, b).ratio() — called from generated
    * code via [[graft.expressions.Kernels.seqRatio]]. */
  def ratio(aStr: String, bStr: String): Double = {
    val a = codePoints(aStr)
    val b = codePoints(bStr)
    val t = a.length + b.length
    if (t == 0) return 1.0
    2.0 * matchingTotal(a, b) / t
  }

  /** fuzzywuzzy `fuzz.token_sort_ratio(s1, s2)` (defaults force_ascii=True,
    * full_process=True; difflib backend): asciidammit + \W→space + lower +
    * strip, whitespace-split, code-point sort, re-join, then `fuzz.ratio` on
    * the sorted strings. `fuzz.ratio`'s decorator chain applies OUTSIDE-IN:
    * `@check_for_equivalence` (equal → 100, INCLUDING two empties) before
    * `@check_empty_string` (either empty → 0), then `intr(100 * ratio)`. */
  def tokenSortRatio(s1: String, s2: String): Int = {
    val t1 = tokenSort(s1)
    val t2 = tokenSort(s2)
    if (t1 == t2) 100
    else if (t1.isEmpty || t2.isEmpty) 0
    else intr(100.0 * ratio(t1, t2))
  }

  /** fuzzywuzzy asciidammit + utils.full_process + token sort: the
    * canonicalized compare key. Exposed for tests and for the SQL oracle's
    * replica.
    *
    * asciidammit (force_ascii=True default) on a Python 3 `str` DELETES
    * code points U+0080–U+00FF and keeps everything >= U+0100 — quirky but
    * exactly `s.translate({128..255: None})`.
    *
    * Word characters = `[\p{L}\p{N}_]` (letters, ALL number categories
    * incl. Nl/No, underscore) — Python's unicode `\w` and RE2's
    * `[\p{L}\p{N}_]` agree here, while `Character.isLetterOrDigit` would
    * drop Nl/No; verified against CPython difflib+re on mixed-script pairs.
    *
    * Tokens sort in CODE-POINT order (Python `sorted()`; DuckDB's binary
    * UTF-8 `list_sort` agrees), not UTF-16 unit order. */
  def tokenSort(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 0x80 || cp > 0xFF) { // asciidammit: U+0080–U+00FF deleted
        val t = Character.getType(cp)
        val isWord = Character.isLetter(cp) || cp == '_' ||
          t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
          t == Character.OTHER_NUMBER
        if (isWord) sb.appendCodePoint(cp) else sb.append(' ')
      }
      i += Character.charCount(cp)
    }
    sb.toString.toLowerCase(java.util.Locale.ROOT).trim
      .split(" +").filter(_.nonEmpty).sorted(cpOrdering).mkString(" ")
  }

  /** Code-point lexicographic string order == Python `sorted()` == UTF-8
    * byte order. Differs from String#compareTo only when one side has a
    * supplementary-plane char (surrogates 0xD800+ sort below 0xE000+ BMP
    * chars in UTF-16 order but above them in code-point order). */
  private val cpOrdering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      var i = 0; var j = 0
      while (i < x.length && j < y.length) {
        val cx = x.codePointAt(i); val cy = y.codePointAt(j)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx); j += Character.charCount(cy)
      }
      Integer.compare(x.length - i, y.length - j)
    }
  }

  /** Python3 `int(round(x))` — round half to EVEN (fuzzywuzzy utils.intr).
    * DuckDB's round() is half-away-from-zero, so the oracle replays this
    * with an explicit floor/parity CASE instead. */
  private def intr(x: Double): Int = Math.rint(x).toInt

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Sum of matching-block sizes, difflib `get_matching_blocks` stack walk
    * (recursion order does not affect the SUM, only block enumeration
    * order, so a simple LIFO matches Python's `queue.pop()`). */
  private def matchingTotal(a: Array[Int], b: Array[Int]): Long = {
    // __chain_b: b2j positions + autojunk popular set
    val b2j = new HashMap[Int, ArrayList[Int]]()
    var j = 0
    while (j < b.length) {
      var l = b2j.get(b(j))
      if (l == null) { l = new ArrayList[Int](); b2j.put(b(j), l) }
      l.add(j)
      j += 1
    }
    // autojunk: popular chars leave b2j (no seeding) but need no set of
    // their own — extension never consults popularity (see above)
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      val it = b2j.entrySet().iterator()
      while (it.hasNext) { if (it.next().getValue.size() > ntest) it.remove() }
    }
    var total = 0L
    val stack = new ArrayList[(Int, Int, Int, Int)]()
    stack.add((0, a.length, 0, b.length))
    while (!stack.isEmpty) {
      val (alo, ahi, blo, bhi) = stack.remove(stack.size() - 1)
      val (bi, bj, k) = findLongestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        if (alo < bi && blo < bj) stack.add((alo, bi, blo, bj))
        if (bi + k < ahi && bj + k < bhi) stack.add((bi + k, ahi, bj + k, bhi))
      }
    }
    total
  }

  private def findLongestMatch(a: Array[Int], b: Array[Int],
      b2j: HashMap[Int, ArrayList[Int]],
      alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = new HashMap[Int, Int]()
    var i = alo
    while (i < ahi) {
      val newj2len = new HashMap[Int, Int]()
      val js = b2j.get(a(i))
      if (js != null) {
        var x = 0
        var break = false
        while (x < js.size() && !break) {
          val j = js.get(x)
          if (j >= bhi) break = true
          else if (j >= blo) {
            val prev = j2len.get(j - 1)
            val k = (if (prev == null) 0 else prev.intValue()) + 1
            newj2len.put(j, k)
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
          x += 1
        }
      }
      j2len = newj2len
      i += 1
    }
    // Extension: CPython's `isbjunk` reads the bjunk set, which is EMPTY
    // for SequenceMatcher(None, a, b) — bpopular is never consulted here.
    // So the non-junk loops extend through ANY equal character (popular
    // included; popularity only suppressed SEEDING via b2j above) and the
    // junk loops can never fire — they are omitted entirely.
    while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a(besti + bestsize) == b(bestj + bestsize)) {
      bestsize += 1
    }
    (besti, bestj, bestsize)
  }
}
