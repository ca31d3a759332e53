package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{PyStr, TurnSlim}

/** In-payload table extraction — the Spark re-expression of the reference's
  * pdfplumber `extract_tables` path (SURVEY S3/P5/X12/X14,
  * `Mutiple_CIS_Pdfs.py:22-43`):
  *
  *  - a "table block" inside a turn's text is a run of consecutive lines
  *    containing the `|` cell delimiter;
  *  - first row of a block is the header; duplicate header names are
  *    uniquified with `_1`, `_2`… suffixes (X12, `Mutiple_CIS_Pdfs.py:5-16`);
  *  - rows whose arity differs from the header are dropped (P5, ":39");
  *  - output is long-form (one row per cell) so the dynamic-column table fits
  *    a fixed Spark schema; `component` carries lineage (X14).
  */
object TableBlocks {

  case class CellRow(conv_id: String, turn_idx: Int, table_idx: Int, row_idx: Int,
      column: String, value: String)

  /** X12: `make_unique` — duplicate names get _1, _2… suffixes. */
  def makeUnique(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    names.map { n =>
      val c = seen.getOrElse(n, 0)
      seen(n) = c + 1
      if (c == 0) n else s"${n}_$c"
    }
  }

  private[operators] def parseTables(text: String): Seq[(Int, Seq[Seq[String]])] = {
    val lines = text.split('\n')
    val blocks = Seq.newBuilder[(Int, Seq[Seq[String]])]
    var cur = Vector.empty[Seq[String]]
    var idx = 0
    def flush(): Unit = {
      if (cur.length >= 2) { blocks += ((idx, cur)); idx += 1 }
      cur = Vector.empty
    }
    lines.foreach { line =>
      if (line.contains('|'))
        cur :+= line.split("\\|", -1).toSeq.map(PyStr.strip)
      else flush()
    }
    flush()
    blocks.result()
  }

  /** The reference's CAPTURE GATE applied before [[extract]]
    * (`Mutiple_CIS_Pdfs.py:20-47`): tables are captured only from the first
    * page containing `marker` onward, and capture STOPS after the first
    * captured page whose NEXT page is blank (`break` out of the page loop —
    * later marker pages are NOT re-captured). One shuffle on conv_id (two
    * window passes share the exchange), then the stateless cell plane. */
  def extractGated(turns: Dataset[TurnSlim],
                   marker: String = "CIS Controls:"): Dataset[CellRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val gated = turns.toDF
      .withColumn("text", coalesce(col("text"), lit(""))) // null ≡ empty page
      .withColumn("_mk",
        max(when(col("text").contains(marker), 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // Python: `if i+1 < len(pages) and not next_text.strip(): break` —
      // a null lead (last page) never stops capture
      .withColumn("_nb", lead(col("text"), 1).over(w).rlike("^\\s*$"))
      .withColumn("_stop",
        min(when(col("_mk") === 1 && col("_nb"), col("turn_idx")))
          .over(Window.partitionBy("conv_id")))
      .filter(col("_mk") === 1 &&
        (col("_stop").isNull || col("turn_idx") <= col("_stop")))
      .select(col("conv_id"), col("turn_idx"), col("text"))
    extract(gated.as[TurnSlim])
  }

  /** Extract all table blocks of all turns as long-form cells. Stateless per
    * turn — pure flatMap, no shuffle. */
  def extract(turns: Dataset[TurnSlim]): Dataset[CellRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.flatMap { t =>
      parseTables(if (t.text == null) "" else t.text).flatMap { case (tableIdx, rows) =>
        val header = makeUnique(rows.head)
        val arity = header.length
        rows.tail.filter(_.length == arity).zipWithIndex.flatMap { case (r, ri) =>
          header.zip(r).map { case (c, v) =>
            CellRow(t.conv_id, t.turn_idx, tableIdx, ri, c, v)
          }
        }
      }
    }
  }
}
