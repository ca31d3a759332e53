package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RegexExtracts

class RegexExtractsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("X7 paragraphBounded: spans end at blank line or end-of-text") {
    import spark.implicits._
    val text = "intro\nICS Control 1.1 first span\ncontinues\n\nmiddle\nICS Control 2.2 tail span\nruns to end"
    val out = Seq(text).toDF("text")
      .select(RegexExtracts.paragraphBounded(col("text"), "ICS Control").as("p"))
      .as[Seq[String]].head()
    assert(out.size == 2)
    assert(out(0) == "ICS Control 1.1 first span\ncontinues")
    assert(out(1) == "ICS Control 2.2 tail span\nruns to end")
  }

  test("X8 anchoredRows: tail slice + line-wise columnar regex") {
    import spark.implicits._
    val text = "preamble noise\nCIS Controls:\n v8 5.1 ensure thing\n v7 3.2 other thing\nnot a row"
    val df = Seq(("c1", 0, text)).toDF("conv_id", "turn_idx", "text")
    val rows = RegexExtracts.anchoredRows(df, "text", "CIS Controls[:\\s]*",
      "(v\\d+)\\s+(\\d+\\.\\d+)\\s+(\\w.*)", 3)
      .select("g1", "g2", "g3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("v8", "5.1", "ensure thing"), ("v7", "3.2", "other thing")))
  }

  test("X9 firstMatchPerDoc: one row per doc, earliest matching turn") {
    import spark.implicits._
    val df = Seq(
      ("a", 0, "no match"), ("a", 1, "rule 1.2.3 here"), ("a", 2, "rule 4.5.6 later"),
      ("b", 5, "only 7.8.9")).toDF("conv_id", "turn_idx", "text")
    val out = RegexExtracts.firstMatchPerDoc(df, "conv_id", "turn_idx", "text",
      "(\\d+)\\.(\\d+)\\.(\\d+)", 3)
      .select("conv_id", "turn_idx", "g1", "g2", "g3").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(out.toSet == Set(("a", 1, "1", "2", "3"), ("b", 5, "7", "8", "9")))
  }
}
