package graft.core

import java.util.regex.Pattern

/** Variant-C sectionizer: per-page keyword-pair window extraction of
  * `/root/reference/cis_benchmarks.py:36-58` (X5/X6/X10/X13 in SURVEY §2.3).
  *
  * For each adjacent keyword pair (k1,k2) all DOTALL|IGNORECASE matches of
  * `k1(.*?)k2` are taken; `cis control` is special-cased as
  * `cis\s*control\s*\((.*?)\)`; row r of the page zips the r-th match of every
  * keyword, missing → `""`; the page key is the first two lines joined.
  */
object KeywordWindows {

  val Keywords: Seq[String] =
    Seq("description", "rationale", "impact", "audit", "remediation", "cis control")

  // UNICODE_CHARACTER_CLASS: Python 3 re gives \s Unicode semantics (NBSP
  // U+00A0 is whitespace — common in PDF-extracted text); Java defaults to
  // ASCII classes. The DuckDB replica's RE2 \s stays ASCII — divergent only
  // on non-ASCII whitespace, which the ASCII fixtures never carry.
  private val pairPatterns: Seq[(String, Pattern)] =
    Keywords.sliding(2).map { case Seq(k1, k2) =>
      k1 -> Pattern.compile(k1 + "(.*?)" + k2,
        Pattern.DOTALL | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CHARACTER_CLASS)
    }.toSeq
  private val cisPattern =
    Pattern.compile("cis\\s*control\\s*\\((.*?)\\)",
      Pattern.DOTALL | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CHARACTER_CLASS)

  private def findAll(p: Pattern, s: String): Vector[String] = {
    val m = p.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group(1)
    b.result()
  }

  /** X10: page key = first two lines, each stripped, space-joined
    * (cis_benchmarks.py:32-33). Python `text.split('\n', 2)[:2]` keeps a
    * trailing EMPTY second element ('Header\n' → ['Header', ''] → key
    * 'Header ' with a trailing space); Java limit 3 ≡ maxsplit 2. */
  def pageKey(text: String): String =
    text.split("\n", 3).take(2).map(PyStr.strip).mkString(" ")

  case class PageRow(key: String, row: Int, values: Map[String, String])

  /** One page → zero or more aligned rows (cis_benchmarks.py:49-58). */
  def parsePage(text: String): Seq[PageRow] = {
    val key = pageKey(text)
    val matches: Seq[(String, Vector[String])] =
      pairPatterns.map { case (k, p) => k -> findAll(p, text) } :+
        ("cis control" -> findAll(cisPattern, text))
    val maxRows = matches.map(_._2.length).max
    (0 until maxRows).map { r =>
      PageRow(key, r, matches.map { case (k, vs) =>
        k -> (if (r < vs.length) PyStr.strip(vs(r)) else "")
      }.toMap)
    }
  }
}
