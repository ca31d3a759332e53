package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S7: native XLSX source and sink — NO external dependencies. An .xlsx
  * file is a ZIP of XML parts; `java.util.zip` and StAX (`javax.xml.stream`)
  * both ship with the JDK. The reference's users start from `.xlsx`
  * (`fuzzy.py:5-6` pd.read_excel, `Mutiple_CIS_Pdfs.py:77-79` to_excel);
  * round 1 substituted CSV/parquet — this closes the gap.
  *
  * Reader is DISTRIBUTED: `binaryFile` scan → per-file in-memory unzip →
  * StAX pull parse of the workbook manifest + sharedStrings + sheet parts →
  * one Row per sheet row (file, [sheet,] row_idx, cells:array<string>). One
  * file = one task (xlsx is not splittable — the right unit for
  * workbook-sized files); parallelism comes from the file count. Handles
  * inline strings, shared strings, and numeric cells; blank cells inside a
  * row are positioned via the A1-style `r` ref.
  *
  * SHEET ADDRESSING (the reference selects sheets on read and write:
  * `text_preprocessing3.py:3` `sheet_name="Guidelines+Description"`,
  * `BERT_Model_Final_V2.py:8` `sheet_name=None` = all sheets,
  * `Similarity.py:28` `ExcelWriter` + `sheet_name='MCL'`): sheet order and
  * names come from `xl/workbook.xml` (`<sheet name=… r:id=…>`) resolved
  * through `xl/_rels/workbook.xml.rels` to worksheet parts — NOT from zip
  * entry names, which real writers order arbitrarily. A workbook with no
  * manifest (hand-built fragments) falls back to the `xl/worksheets/`
  * parts sorted by part name, each named by its file stem.
  *
  * Writer emits a minimal multi-sheet workbook with inline strings —
  * driver-side, for export artifacts (the reference's to_excel role). */
object Xlsx {

  // ---- writer --------------------------------------------------------------

  /** OOXML string escaping (the ECMA-376 `_xHHHH_` convention, like Excel):
    * characters invalid in XML 1.0 -- C0 controls except \t\n\r,
    * U+FFFE/U+FFFF, and LONE surrogates (raw ones are silently destroyed by
    * the UTF-8 encoder) -- are written as `_xHHHH_`, and a literal `_`
    * directly before an `x` is escaped as `_x005f_`.
    *
    * Why that exact rule (and not "protect full _xHHHH_ shapes"): after
    * encoding, EVERY `_x` bigram in the output opens an emitted escape --
    * plain text cannot contain one (the rule), one escape's trailing `_`
    * plus a following literal `x` cannot collide (the leftmost decode match
    * consumes the trailing underscore first), and a literal `_` before an
    * emitted escape yields `__x`, whose first underscore the decoder skips.
    * The decoder's leftmost non-overlapping `_xHHHH_` scan is therefore an
    * EXACT inverse -- including overlap traps like `_x0041_x0042_`, which a
    * consuming regex pre-pass silently corrupts. */
  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '_' if i + 1 < s.length && s.charAt(i + 1) == 'x' =>
          sb.append("_x005f_")
        case c =>
          val invalid = (c < ' ' && c != '\t' && c != '\n' && c != '\r') ||
            c == '\uFFFE' || c == '\uFFFF' ||
            (Character.isHighSurrogate(c) &&
              !(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)))) ||
            (Character.isLowSurrogate(c) &&
              !(i > 0 && Character.isHighSurrogate(s.charAt(i - 1))))
          if (invalid) sb.append(f"_x${c.toInt}%04x_") else sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val escapeSeq = "_x([0-9A-Fa-f]{4})_".r
  /** Reader-side inverse of [[xmlEscape]]'s `_xHHHH_` convention:
    * non-overlapping left-to-right, so `_x005f_x0007_` decodes to the
    * literal `_x0007_`. */
  private[sources] def xmlUnescape(s: String): String =
    escapeSeq.replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
      Integer.parseInt(m.group(1), 16).toChar.toString))

  def colRef(idx: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA …
    var i = idx
    val sb = new StringBuilder
    while (i >= 0) { sb.insert(0, ('A' + i % 26).toChar); i = i / 26 - 1 }
    sb.toString
  }

  def refToColIdx(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** Serialize rows (header first) to xlsx bytes: minimal OOXML, one sheet
    * named `Sheet1`, inline strings. */
  def toBytes(header: Seq[String], rows: Iterator[Seq[String]]): Array[Byte] =
    toBytesSheets(Seq(("Sheet1", header, rows)))

  /** Multi-sheet serializer: one (name, header, rows) triple per sheet, in
    * workbook order. Sheet names go through the same `_xHHHH_` + XML-entity
    * escaping as cell text (the reader unescapes symmetrically), so hostile
    * names roundtrip; Excel-side naming limits (31 chars, no `[]\/:*?`) are
    * the CALLER's concern — this is a data sink, not a UI. */
  def toBytesSheets(
      sheets: Seq[(String, Seq[String], Iterator[Seq[String]])]): Array[Byte] = {
    require(sheets.nonEmpty, "xlsx workbook needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos, StandardCharsets.UTF_8)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    val n = sheets.length
    val overrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString("\n")
    entry("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |$overrides
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    val sheetTags = sheets.zipWithIndex.map { case ((name, _, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>$sheetTags</sheets>
        |</workbook>""".stripMargin)
    val rels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
      .mkString("\n")
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |$rels
        |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, header, rows), si) =>
      zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
      val head = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""".stripMargin
      zip.write(head.getBytes(StandardCharsets.UTF_8))
      var rowNum = 1
      (Iterator(header) ++ rows).foreach { cells =>
        val sb = new StringBuilder(s"""<row r="$rowNum">""")
        cells.zipWithIndex.foreach { case (v, i) =>
          if (v != null)
            sb.append(s"""<c r="${colRef(i)}$rowNum" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>""")
        }
        sb.append("</row>")
        zip.write(sb.toString.getBytes(StandardCharsets.UTF_8))
        rowNum += 1
      }
      zip.write("</sheetData></worksheet>".getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }

  /** Driver-side export of a (small) DataFrame to one .xlsx file — the
    * reference's `to_excel` role (export artifact, not a data path). The
    * `sheetName` default matches pandas' (`Similarity.py:28` writes
    * `sheet_name='MCL'`). */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit =
    writeSheets(Seq(sheetName -> df), path)

  /** Multi-sheet export — the `ExcelWriter` role: several frames into one
    * workbook, one named sheet each, in the given order. */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    val ser = sheets.map { case (name, df) =>
      val rows = df.collect().iterator.map(r =>
        (0 until r.length).map(i => if (r.isNullAt(i)) null else String.valueOf(r.get(i))))
      (name, df.columns.toSeq, rows)
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, toBytesSheets(ser))
  }

  // ---- reader --------------------------------------------------------------

  /** Parse one workbook into all its sheets, workbook order: Seq of
    * (sheetName, rows) where rows = Seq of (rowIdx, cells). Dense rows —
    * gaps from missing cell refs are null-filled. Sheet order/names resolve
    * via workbook.xml + rels; a manifest-less zip falls back to part-name
    * order with stem names (see class doc). */
  def parseWorkbook(bytes: Array[Byte]): Seq[(String, Seq[(Int, Seq[String])])] = {
    val parts = scala.collection.mutable.Map[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), StandardCharsets.UTF_8)
    var e = zin.getNextEntry
    val buf = new Array[Byte](8192)
    def readAll(): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var n = zin.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
      out.toByteArray
    }
    while (e != null) {
      val name = e.getName
      val keep = name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
        name == "xl/sharedStrings.xml" ||
        (name.startsWith("xl/worksheets/") && name.endsWith(".xml") &&
          !name.contains("_rels"))
      if (keep) parts(name) = readAll()
      e = zin.getNextEntry
    }
    zin.close()
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val manifest: Seq[(String, String)] = // (sheetName, partName)
      (parts.get("xl/workbook.xml"), parts.get("xl/_rels/workbook.xml.rels")) match {
        case (Some(wb), Some(rl)) =>
          val targets = parseRels(rl) // rId -> target
          parseWorkbookSheets(wb).flatMap { case (name, rid) =>
            targets.get(rid).map { t =>
              // targets are rels-relative ("worksheets/sheet1.xml") or
              // package-absolute ("/xl/worksheets/sheet1.xml")
              val part = if (t.startsWith("/")) t.substring(1)
                         else if (t.startsWith("xl/")) t else s"xl/$t"
              (name, part)
            }
          }
        case _ =>
          parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.map { p =>
            val stem = p.substring("xl/worksheets/".length).stripSuffix(".xml")
            (stem, p)
          }
      }
    manifest.flatMap { case (name, part) =>
      parts.get(part).map(b => (name, parseSheetXml(b, shared)))
    }
  }

  /** First sheet (workbook order) of one workbook: Seq of (rowIdx, cells). */
  def parseSheet(bytes: Array[Byte]): Seq[(Int, Seq[String])] =
    parseWorkbook(bytes).headOption.map(_._2).getOrElse(Nil)

  private def staxReader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
  }

  /** `xl/workbook.xml` → (sheetName, r:id) in document order. Sheet names
    * are `_xHHHH_`-unescaped (the writer escapes symmetrically). */
  private def parseWorkbookSheets(bytes: Array[Byte]): Seq[(String, String)] = {
    val r = staxReader(bytes)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
        // r:id is namespaced; match by local name across declared attrs
        var rid: String = null
        var i = 0
        while (i < r.getAttributeCount && rid == null) {
          if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
          i += 1
        }
        if (rid != null) out += ((xmlUnescape(name), rid))
      }
    }
    r.close()
    out.result()
  }

  /** `xl/_rels/workbook.xml.rels` → Map(rId → Target). */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = staxReader(bytes)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
        val id = r.getAttributeValue(null, "Id")
        val target = r.getAttributeValue(null, "Target")
        if (id != null && target != null) out += (id -> target)
      }
    }
    r.close()
    out.result()
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = staxReader(bytes)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += xmlUnescape(cur.toString); cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  private def parseSheetXml(bytes: Array[Byte], shared: Vector[String]): Seq[(Int, Seq[String])] = {
    val r = staxReader(bytes)
    val rows = Seq.newBuilder[(Int, Seq[String])]
    var rowIdx = -1
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var colIdx = -1
    var cellType = ""
    var inV = false
    var inT = false
    var text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              rowIdx = Option(r.getAttributeValue(null, "r")).map(_.toInt - 1).getOrElse(rowIdx + 1)
              cells = scala.collection.mutable.ArrayBuffer.empty
            case "c" =>
              colIdx = Option(r.getAttributeValue(null, "r")).map(refToColIdx)
                .getOrElse(cells.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text = new StringBuilder
            case "v" => inV = true
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inT =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inT = false
            case "c" =>
              val raw = text.toString
              val v = cellType match {
                case "s" => shared.lift(raw.trim.toInt).orNull // decoded at parse
                case _ => xmlUnescape(raw) // inlineStr/str via <t>; numbers never contain _x escapes
              }
              while (cells.length < colIdx) cells += null
              if (cells.length == colIdx) cells += v else cells(colIdx) = v
            case "row" => rows += ((rowIdx, cells.toSeq))
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** Distributed read of the FIRST sheet of every .xlsx under `glob` →
    * (file, row_idx, cells) — the pandas `sheet_name=0` default. Header
    * handling is the caller's (see `readWithHeader`). */
  def read(spark: SparkSession, glob: String): DataFrame =
    readRaw(spark, glob, SheetFirst)

  /** Distributed read of ONE named sheet — `sheet_name="…"`. Files lacking
    * the sheet contribute zero rows (same contract as a corrupt workbook:
    * a partial glob must not kill the scan). */
  def readSheet(spark: SparkSession, glob: String, sheetName: String): DataFrame =
    readRaw(spark, glob, SheetNamed(sheetName))

  /** Distributed read of ALL sheets — `sheet_name=None`: (file, sheet,
    * row_idx, cells), sheets in workbook order within each file. */
  def readAllSheets(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val sheets =
          try parseWorkbook(bytes)
          catch { case scala.util.control.NonFatal(_) => Nil }
        sheets.flatMap { case (name, rows) =>
          rows.map { case (i, cells) => (path, name, i, cells) }
        }
      }
      .toDF("file", "sheet", "row_idx", "cells")
  }

  private sealed trait SheetSel
  private case object SheetFirst extends SheetSel
  private case class SheetNamed(name: String) extends SheetSel

  private def readRaw(spark: SparkSession, glob: String, sel: SheetSel): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        // one corrupt workbook (bad zip / malformed XML) must not kill a
        // glob-wide scan: it contributes zero rows instead of a task failure
        val rows =
          try {
            val wb = parseWorkbook(bytes)
            sel match {
              case SheetFirst => wb.headOption.map(_._2).getOrElse(Nil)
              case SheetNamed(n) => wb.find(_._1 == n).map(_._2).getOrElse(Nil)
            }
          } catch { case scala.util.control.NonFatal(_) => Seq.empty[(Int, Seq[String])] }
        rows.map { case (i, cells) => (path, i, cells) }
      }
      .toDF("file", "row_idx", "cells")
  }

  /** First sheet row = column names (the pandas read_excel convention):
    * returns one string column per header cell. Header is taken from the
    * lexicographically-first file; all files must share the layout. Pass
    * `sheetName` to address a named sheet (`sheet_name="…"`). */
  def readWithHeader(spark: SparkSession, glob: String,
                     sheetName: Option[String] = None): DataFrame = {
    val raw = (sheetName match {
      case Some(n) => readSheet(spark, glob, n)
      case None => read(spark, glob)
    }).cache()
    // a misspelled sheet name yields ZERO rows (readSheet's documented
    // partial-glob contract: files without the sheet contribute nothing)
    // — name the failure instead of dying on collect()(0) with a bare
    // ArrayIndexOutOfBoundsException
    val head = raw.orderBy(col("file"), col("row_idx")).limit(1)
      .select(col("cells")).collect()
    require(head.nonEmpty, sheetName match {
      case Some(n) => s"no sheet named '$n' found in any workbook under $glob"
      case None => s"no workbook rows found under $glob"
    })
    val headerRow = head(0).getSeq[String](0)
    val names = headerRow.zipWithIndex.map { case (n, i) =>
      if (n == null || n.isEmpty) s"_c$i" else n }
    val cols = names.zipWithIndex.map { case (n, i) =>
      element_at(col("cells"), i + 1).as(n) }
    raw.filter(col("row_idx") > 0).select(cols: _*)
  }
}
