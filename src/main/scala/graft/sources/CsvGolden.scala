package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5/S6: CSV source/sink with header + minimal quoting — the reference's
  * golden-file format (`cis_pdf_parser.py:100-115` csv.QUOTE_MINIMAL;
  * committed goldens like `CIS_Benchmarks.csv`). Parquet is the canonical
  * sink (S7/S8 → Snapshot); CSV exists for golden-file compatibility. */
object CsvGolden {

  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("header", "true")
      .option("quoteAll", "false") // minimal quoting: only when needed
      .option("escape", "\"")      // RFC-4180 double-quote escaping (python csv)
      .mode("overwrite")
      .csv(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true") // quoted embedded newlines (python csv writes them)
      .csv(path)
}
