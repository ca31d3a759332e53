package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining regex-extraction operator family (SURVEY §2.3 X7/X8/X9),
  * expressed as pure column pipelines (codegen'd builtins, no UDFs).
  */
object RegexExtracts {

  /** X7 (cis_benchmarks_ics.py:16-29): paragraph-bounded extraction — every
    * span starting at `anchor` and ending at a blank line or end-of-text,
    * each span stripped (the reference's per-match `.strip()`, :27).
    * Python `re.findall(r'\bICS Control\b.*?(?=\n\n|\Z)', DOTALL)` →
    * Java `(?s)\banchor\b.*?(?=\n\n|\z)`. The \b boundaries are emitted
    * only where meaningful — adjacent to a word character (the reference's
    * anchor ends in a word char; for an anchor ending in ':' a trailing \b
    * would demand a following word char and change the match set). Strip is
    * `\s`-based (ASCII+basic) — the documented RE2∩Java subset of Python's
    * unicode strip(). */
  def paragraphBounded(text: Column, anchor: String): Column = {
    def word(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    val lead = if (anchor.nonEmpty && word(anchor.head)) "\\b" else ""
    val trail = if (anchor.nonEmpty && word(anchor.last)) "\\b" else ""
    transform(
      regexp_extract_all(text,
        lit("(?s)" + lead + java.util.regex.Pattern.quote(anchor) + trail +
          ".*?(?=\\n\\n|\\z)"),
        lit(0)),
      m => regexp_replace(m, "^\\s+|\\s+$", ""))
  }

  /** X8 (cis_benchmark_control_tables.py:16-37): locate the section anchor,
    * slice the tail AFTER the anchor match (the reference slices
    * `text[match.end():]`, so rows the greedy anchor pattern consumes are
    * excluded, :24-25), split into lines, strip each line, and match the
    * STRIPPED line against a columnar row pattern anchored at line start
    * (`table_pattern.match(line.strip())`, :32). Returns a DataFrame with
    * one row per matched line: (original columns…, line_idx, g1..gN). */
  def anchoredRows(df: DataFrame, textCol: String, anchorPattern: String,
                   rowPattern: String, groups: Int): DataFrame = {
    val reserved = Seq("_tail", "_line", "line_idx") ++ (1 to groups).map(g => s"g$g")
    reserved.filter(df.columns.contains).foreach(r => throw new IllegalArgumentException(
      s"anchoredRows: input column '$r' collides with a scratch/output column"))
    val pos = regexp_instr(col(textCol), lit(anchorPattern))
    val mlen = length(regexp_extract(col(textCol), anchorPattern, 0))
    val tail = when(pos > 0, col(textCol).substr(pos + mlen, length(col(textCol))))
      .otherwise(lit(""))
    val lines = df.withColumn("_tail", tail)
      .select(df.columns.map(col) :+
        posexplode(split(col("_tail"), "\n")).as(Seq("line_idx", "_line")): _*)
      .withColumn("_line", regexp_replace(col("_line"), "^\\s+|\\s+$", ""))
    // re.match ≡ start-anchored search; (?:...) keeps group numbers intact
    val anchored = "^(?:" + rowPattern + ")"
    val out = (1 to groups).foldLeft(
      lines.filter(col("_line").rlike(anchored))) { (d, g) =>
      d.withColumn(s"g$g", regexp_extract(col("_line"), anchored, g))
    }
    out.drop("_line")
  }

  /** X9 (cis_control_info.py:25-31): first regex match per document, then
    * stop — per-group limit(1) via window over document order. `df` must carry
    * (docCol, orderCol, textCol). */
  def firstMatchPerDoc(df: DataFrame, docCol: String, orderCol: String,
                       textCol: String, pattern: String, groups: Int): DataFrame = {
    val reserved = "_rn" +: (1 to groups).map(g => s"g$g")
    reserved.filter(df.columns.contains).foreach(r => throw new IllegalArgumentException(
      s"firstMatchPerDoc: input column '$r' collides with a scratch/output column"))
    val matched = df.filter(col(textCol).rlike(pattern))
    val w = Window.partitionBy(col(docCol)).orderBy(col(orderCol))
    val first = matched.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    (1 to groups).foldLeft(first) { (d, g) =>
      d.withColumn(s"g$g", regexp_extract(col(textCol), pattern, g))
    }.drop(textCol)
  }
}
