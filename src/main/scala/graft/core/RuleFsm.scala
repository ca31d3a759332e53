package graft.core

import java.util.regex.Pattern

/** The flagship section-header finite-state machine — exact per-page semantics of
  * `/root/reference/cis_pdf_parser.py:118-218`, re-expressed as a pure, allocation-
  * light Scala class so it can run inside a Spark `mapPartitions` stage.
  *
  * State carried ACROSS turns of one conversation (the reference carries it across
  * pages of one document): eight section counters, eight last-seen section values,
  * and the single-entry `seenList` dedup (cis_pdf_parser.py:13-24, 212-214).
  *
  * Faithfully reproduced quirks (goldens depend on them):
  *  - marker absent → `split(sep,1)[1]` IndexError → section skipped, FSM keeps
  *    the stale value from an earlier turn (":140-141");
  *  - `Description` is terminated by `"Rationale"` (no colon), `Audit` by
  *    `"Remediation"` (no colon), `Audit` opens on `"\nAudit:"` (leading newline)
  *    (":146,161-162");
  *  - `Default Value` backfill: when `CIS Controls` advances without a preceding
  *    `Default Value`, defval is set to `""` and its counter synthesized (":191-194");
  *  - emission only when the six tracked counters are all equal (defval/cis counters
  *    excluded — commented out in the reference, ":200-209");
  *  - `seenList` holds at most ONE entry — `seenList = [row_count]` replaces rather
  *    than appends (":214"), so only *consecutive* duplicate emissions are suppressed;
  *  - the char-class scrubs `[^a-zA-Z0-9\n-]+` (profile) and `[^a-zA-Z0-9\n.-]+`
  *    (cis controls) replace runs with a single space (":138,189").
  *
  * One deliberate divergence, documented: if emission fires before every section has
  * ever been assigned (possible only for `defval`/`cis`, whose counters are excluded
  * from the alignment check) the reference raises NameError and dies; we emit `""`
  * for the never-assigned section instead.
  */
final class RuleFsm(pattern: Pattern) {
  import RuleFsm.literalGate

  private var ruleCount, levelCount, descCount, ratCount, aCnt, remCount = 0
  private var defvalCount, cisCount = 0
  private var rule, level, description, rat, audit, rem, defval, cis = ""
  // seenList bounded to one entry (cis_pdf_parser.py:214)
  private var seen: List[Int] = null

  // Cheap literal pre-gate: the rule regex can only match if its required
  // literals are present — skips the backtracking search on chatter/HTML/TOC
  // turns (pure optimization, semantics identical).
  private val gate: String => Boolean = literalGate(pattern.pattern())

  private def subProfile(s: String): String = RuleFsm.scrub(s, allowDot = false)
  private def subCis(s: String): String = RuleFsm.scrub(s, allowDot = true)

  /** Feed one turn's text; returns the spans found on this turn and the record if
    * the counter-alignment emission fired. */
  def feed(data: String): (Vector[Span], Option[CisRecord]) = {
    val spans = Vector.newBuilder[Span]

    // X1 rule header (re.search with DOTALL; group() = whole match) :123-132
    if (gate(data)) {
      val m = pattern.matcher(data)
      if (m.find()) {
        rule = m.group()
        ruleCount += 1
        spans += Span("rule", m.start, m.end, rule)
      }
    }

    // X2 marker-delimited span slices :134-196 (order matters: defval backfill in
    // the CIS step reads defvalCount as left by the Default Value step).
    def section(label: String, open: String, close: String,
                clean: String => String)(assign: String => Unit): Unit = {
      val i = data.indexOf(open)
      if (i >= 0) {
        val start = i + open.length
        val tail = data.substring(start)
        val j = tail.indexOf(close)
        val end = if (j < 0) data.length else start + j
        val value = clean(PyStr.strip(if (j < 0) tail else tail.substring(0, j)))
        assign(value)
        spans += Span(label, start, end, value)
      }
    }

    section("profile_applicability", "Profile Applicability:", "Description:",
      subProfile) { v => level = v; levelCount += 1 }
    section("description", "Description:", "Rationale",
      identity) { v => description = v; descCount += 1 }
    section("rationale", "Rationale:", "Audit:",
      identity) { v => rat = v; ratCount += 1 }
    section("audit", "\nAudit:", "Remediation",
      identity) { v => audit = v; aCnt += 1 }
    section("remediation", "Remediation:", "Default Value:",
      identity) { v => rem = v; remCount += 1 }
    section("default_value", "Default Value:", "CIS Controls:",
      identity) { v => defval = v; defvalCount += 1 }
    section("cis_controls", "CIS Controls:", "P a g e",
      subCis) { v =>
      cis = v; cisCount += 1
      // Default Value absent on this rule → backfill "" (":191-194")
      if (defvalCount == cisCount - 1) { defval = ""; defvalCount += 1 }
    }

    // X3 counter-alignment emission + A6 single-entry dedup :198-218
    var out: Option[CisRecord] = None
    if (ruleCount > 0) {
      val rowCount = List(ruleCount, levelCount, descCount, ratCount, aCnt, remCount)
      if (rowCount.forall(_ == rowCount.head) && rowCount != seen) {
        seen = rowCount
        out = Some(CisRecord(rule, level, description, rat, audit, rem, defval, cis))
      }
    }
    (spans.result(), out)
  }
}

object RuleFsm {
  /** Hand-rolled equivalent of `re.sub("[^a-zA-Z0-9\n-]+", " ", s)` (and the
    * `.`-allowing cis variant, cis_pdf_parser.py:138,189): each maximal run of
    * disallowed chars becomes ONE space. java.util.regex implements the char
    * class as a chain of union lambdas (`Pattern$BmpCharPredicate`) that
    * dominated multi-thread profiles (megamorphic `is()` call site) — this
    * loop is ~40× cheaper and byte-identical on all inputs (surrogate pairs:
    * both halves are disallowed chars in either formulation → same run). */
  private[graft] def scrub(s: String, allowDot: Boolean): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var inRun = false
    while (i < n) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '\n' || c == '-' || (allowDot && c == '.')
      if (ok) { sb.append(c); inRun = false }
      else { if (!inRun) sb.append(' '); inRun = true }
      i += 1
    }
    sb.toString
  }

  /** Literal containment gate implied by each known doc-type pattern. */
  private[core] def literalGate(patternStr: String): String => Boolean =
    if (patternStr.contains("Automated"))
      s => s.contains("(Automated)") || s.contains("(Manual)")
    else if (patternStr.contains("CIS") && patternStr.contains("Benchmark"))
      s => s.contains("CIS") && s.contains("Benchmark")
    else _ => true

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Pattern]()

  /** Compile a reference doc-type pattern with Python re.DOTALL semantics.
    * UNICODE_CHARACTER_CLASS: Python 3's \s/\d/\w are Unicode classes (\s
    * matches NBSP U+00A0 — routine in PDF-extracted text between a rule
    * number and '(L1)'); Java defaults them to ASCII, which would silently
    * skip such rule headers and shift the counter alignment. The DuckDB FSM
    * replica's RE2 classes stay ASCII — divergent only on non-ASCII
    * whitespace, which the ASCII fixtures never carry (the Python
    * cross-check oracle exercises the real re semantics).
    * Memoized: there are only a handful of distinct doc-type patterns but one
    * conversation each — compiling per conversation showed up in the bench. */
  def compile(pythonPattern: String): Pattern =
    cache.computeIfAbsent(pythonPattern, p => Pattern.compile(p,
      Pattern.DOTALL | Pattern.UNICODE_CHARACTER_CLASS))
}
