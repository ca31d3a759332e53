package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining regex-extraction operator family (SURVEY §2.3 X7/X8/X9),
  * expressed as pure column pipelines (codegen'd builtins, no UDFs).
  */
object RegexExtracts {

  /** X7 (cis_benchmarks_ics.py:16-29): paragraph-bounded extraction — every
    * span starting at `anchor` and ending at a blank line or end-of-text.
    * Python `re.findall(r'\bICS Control\b.*?(?=\n\n|\Z)', DOTALL)` →
    * Java `(?s)\banchor\b.*?(?=\n\n|\z)`. */
  def paragraphBounded(text: Column, anchor: String): Column =
    regexp_extract_all(text,
      lit("(?s)\\b" + java.util.regex.Pattern.quote(anchor) + ".*?(?=\\n\\n|\\z)"),
      lit(0))

  /** X8 (cis_benchmark_control_tables.py:16-37): locate the section anchor,
    * slice the tail after it, split into lines, match each line against a
    * columnar row pattern with `groups` capture groups. Returns a DataFrame
    * with one row per matched line: (original columns…, line_idx, g1..gN). */
  def anchoredRows(df: DataFrame, textCol: String, anchorPattern: String,
                   rowPattern: String, groups: Int): DataFrame = {
    val pos = regexp_instr(col(textCol), lit(anchorPattern))
    val tail = when(pos > 0, col(textCol).substr(pos, length(col(textCol))))
      .otherwise(lit(""))
    val lines = df.withColumn("_tail", tail)
      .select(df.columns.map(col) :+
        posexplode(split(col("_tail"), "\n")).as(Seq("line_idx", "_line")): _*)
    val out = (1 to groups).foldLeft(
      lines.filter(col("_line").rlike(rowPattern))) { (d, g) =>
      d.withColumn(s"g$g", regexp_extract(col("_line"), rowPattern, g))
    }
    out.drop("_line")
  }

  /** X9 (cis_control_info.py:25-31): first regex match per document, then
    * stop — per-group limit(1) via window over document order. `df` must carry
    * (docCol, orderCol, textCol). */
  def firstMatchPerDoc(df: DataFrame, docCol: String, orderCol: String,
                       textCol: String, pattern: String, groups: Int): DataFrame = {
    val matched = df.filter(col(textCol).rlike(pattern))
    val w = Window.partitionBy(col(docCol)).orderBy(col(orderCol))
    val first = matched.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    (1 to groups).foldLeft(first) { (d, g) =>
      d.withColumn(s"g$g", regexp_extract(col(textCol), pattern, g))
    }.drop(textCol)
  }
}
