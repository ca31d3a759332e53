package graft

import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.SeqMatcher
import graft.expressions.StringSimilarity

/** Pins [[graft.core.SeqMatcher]] against REAL CPython difflib/fuzzywuzzy
  * semantics three independent ways:
  *
  *  1. `seqmatcher_golden.tsv` — 920 (a, b, ratio, token_sort_ratio) vectors
  *     produced by CPython 3's actual `difflib.SequenceMatcher(None, a, b)
  *     .ratio()` and a line-faithful fuzzywuzzy-0.18.0 port (decorator
  *     chain incl. check_for_equivalence, asciidammit U+0080–U+00FF
  *     deletion, code-point sorted()), covering unicode scripts incl.
  *     non-BMP sort discriminators, empty/punct-only pairs, Latin-1
  *     accents, halfway rounding cases, the autojunk activation boundary
  *     (len(b) in {198..202}), and 500+ structured autojunk vectors with
  *     popular filler adjacent to rare-match boundaries (150-500 chars,
  *     varying popular density) — the extension-loop window where a
  *     non-faithful junk treatment could diverge. (Empirically, the prior
  *     popular-as-junk extension alternation was total-preserving under
  *     the recursion on 60k structured probes, but the kernel now mirrors
  *     CPython's isbjunk-reads-bjunk structure exactly rather than relying
  *     on that equivalence.) Double equality is EXACT (the repr
  *     round-trips to the identical IEEE value).
  *  2. A from-first-principles Ratcliff-Obershelp replica (recursive
  *     longest-common-substring by brute force, no b2j/no junk) fuzzed
  *     against the kernel on sub-200-char strings where difflib's autojunk
  *     is inert — a transcription-bug detector independent of the golden
  *     generator.
  *  3. The Catalyst expressions evaluated through Spark (codegen path) must
  *     agree with the direct kernel calls.
  */
class StringSimilaritySpec extends AnyFunSuite {

  private def goldens: Seq[(String, String, Double, Int)] = {
    val in = getClass.getResourceAsStream("/seqmatcher_golden.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filterNot(_.startsWith("#")).map { line =>
      val Array(a64, b64, r, t) = line.split("\t", -1)
      (new String(Base64.getDecoder.decode(a64), "UTF-8"),
        new String(Base64.getDecoder.decode(b64), "UTF-8"),
        r.toDouble, t.toInt)
    }.toList
    finally src.close()
  }

  test("kernel matches CPython difflib on all golden vectors (exact doubles)") {
    val gs = goldens
    assert(gs.size == 920)
    gs.foreach { case (a, b, expRatio, expTsr) =>
      val got = SeqMatcher.ratio(a, b)
      assert(got == expRatio,
        s"ratio(${a.take(40)}…, ${b.take(40)}…) = $got, CPython says $expRatio")
      val gotT = SeqMatcher.tokenSortRatio(a, b)
      assert(gotT == expTsr,
        s"token_sort_ratio(${a.take(40)}…, ${b.take(40)}…) = $gotT, CPython says $expTsr")
    }
  }

  // independent naive Ratcliff-Obershelp: recursive longest-match (earliest
  // in a, then earliest in b) with no junk machinery, O(n^3) brute force
  private def naiveMatches(a: String, b: String): Int = {
    def longest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var best = (alo, blo, 0)
      var i = alo
      while (i < ahi) {
        var j = blo
        while (j < bhi) {
          var k = 0
          while (i + k < ahi && j + k < bhi && a(i + k) == b(j + k)) k += 1
          if (k > best._3) best = (i, j, k)
          j += 1
        }
        i += 1
      }
      best
    }
    def go(alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
      val (i, j, k) = longest(alo, ahi, blo, bhi)
      if (k == 0) 0
      else k + go(alo, i, blo, j) + go(i + k, ahi, j + k, bhi)
    }
    go(0, a.length, 0, b.length)
  }

  test("kernel == naive Ratcliff-Obershelp on 1500 fuzzed sub-autojunk pairs") {
    val rnd = new scala.util.Random(0x5E91L)
    val alpha = "abcdef gh-xyz"
    (1 to 1500).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      val t = a.length + b.length
      val exp = if (t == 0) 1.0 else 2.0 * naiveMatches(a, b) / t
      assert(SeqMatcher.ratio(a, b) == exp, s"fuzz diverged on (${a}, ${b})")
    }
  }

  test("Catalyst expressions (codegen path) agree with the kernel") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pairs = goldens.take(80).map { case (a, b, _, _) => (a, b) }
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        StringSimilarity.seq_ratio(col("a"), col("b")).as("r"),
        StringSimilarity.token_sort_ratio(col("a"), col("b")).as("t"))
    df.collect().foreach { row =>
      val (a, b) = (row.getString(0), row.getString(1))
      assert(row.getDouble(2) == SeqMatcher.ratio(a, b))
      assert(row.getInt(3) == SeqMatcher.tokenSortRatio(a, b))
    }
    // SQL registration round-trip
    GraftExtensions.registerOn(spark)
    pairs.take(5).toDF("a", "b").createOrReplaceTempView("ss_pairs")
    val viaSql = spark.sql(
      "SELECT seq_ratio(a, b), token_sort_ratio(a, b) FROM ss_pairs").collect()
    pairs.take(5).zip(viaSql).foreach { case ((a, b), row) =>
      assert(row.getDouble(0) == SeqMatcher.ratio(a, b))
      assert(row.getInt(1) == SeqMatcher.tokenSortRatio(a, b))
    }
  }

  test("reference-documented values hold") {
    assert(SeqMatcher.ratio("abcd", "bcde") == 0.75)
    assert(SeqMatcher.tokenSortRatio(
      "fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 100)
    assert(SeqMatcher.tokenSortRatio(
      "fuzzy was a bear", "fuzzy fuzzy was a bear") == 84)
    assert(SeqMatcher.ratio("", "") == 1.0)   // difflib: empty == empty
    // fuzz.ratio's @check_for_equivalence fires BEFORE @check_empty_string:
    // two inputs that process to the same (even empty) string score 100
    assert(SeqMatcher.tokenSortRatio("", "") == 100)
    assert(SeqMatcher.tokenSortRatio("!!!", "???") == 100)
    assert(SeqMatcher.tokenSortRatio("!!!", "abc") == 0) // one-sided empty
    // asciidammit (force_ascii=True default) deletes U+0080–U+00FF
    assert(SeqMatcher.tokenSortRatio("café", "caf") == 100)
  }
}
