package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TurnSlim

/** S1 binary-payload plane (SURVEY §2.1): opaque document payloads read via
  * `spark.read.format("binaryFile")` and tokenized by a mapPartitions
  * BYTE-stream lexer — no whole-file string materialization before the page
  * split, and no driver involvement.
  *
  * Page model: the 0x0C form-feed byte separates pages (the text-layer page
  * delimiter convention PDF extractors emit), so one payload file becomes one
  * "conversation" whose turns are its pages — directly consumable by
  * `Extraction.extract`. Line lexing splits on 0x0A with 0x0D stripped.
  *
  * Scale notes: binaryFile files are NOT split (one file = one task input,
  * 2 GB cap per file) — parallelism comes from file count, which is the right
  * unit for payload blobs; the lexer itself is streaming per file. Column
  * pruning applies (`content` only read when asked). */
object BinaryPayloads {

  case class LexedLine(doc: String, page_idx: Int, line_idx: Int, line: String)

  /** GZIPInputStream exposing the inflater's unconsumed-input count, for
    * trailing-junk detection after a (possibly silently truncated) EOF. */
  private final class PeekGzip(in: java.io.InputStream)
      extends java.util.zip.GZIPInputStream(in) {
    def unread: Int = inf.getRemaining
  }

  /** Raw binaryFile frame: (path, modificationTime, length, content). */
  def read(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** conv_id = filename stem — the reference's own convention (F9/X14 stem
    * lineage). CONTRACT: stems must be unique across the glob; two distinct
    * files with equal stems (a/doc.txt + b/doc.txt) would merge into one
    * "conversation" with duplicate turn indices, and map-side code cannot
    * detect the cross-task collision. Callers with ambiguous layouts should
    * pre-rename or partition the glob. */
  private def stem(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** Split a byte payload on `sep` LAZILY: one page String materialized at a
    * time (the raw byte array is the only whole-file resident; an eager
    * splitter would hold every page's UTF-16 chars alongside it — a ~3×
    * heap spike at the 2 GB binaryFile cap). */
  private[sources] def splitBytes(bytes: Array[Byte], sep: Byte): Iterator[String] =
    new Iterator[String] {
      private var start = 0
      private var done = false
      override def hasNext: Boolean = !done
      override def next(): String = {
        if (done) throw new NoSuchElementException
        var i = start
        while (i < bytes.length && bytes(i) != sep) i += 1
        val s = new String(bytes, start, i - start, StandardCharsets.UTF_8)
        if (i >= bytes.length) done = true else start = i + 1
        s
      }
    }

  /** Payload files → per-page turns: conv_id = file stem, turn_idx = page
    * ordinal (form-feed-separated). Feed straight into Extraction.extract. */
  def pages(spark: SparkSession, glob: String): Dataset[TurnSlim] = {
    import spark.implicits._
    read(spark, glob).select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val doc = stem(path)
        splitBytes(bytes, 0x0C.toByte).zipWithIndex.map { case (text, i) =>
          TurnSlim(doc, i, text)
        }
      })
  }

  /** Payload files → lexed lines (0x0A separator, trailing 0x0D stripped). */
  def lines(spark: SparkSession, glob: String): Dataset[LexedLine] = {
    import spark.implicits._
    read(spark, glob).select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val doc = stem(path)
        splitBytes(bytes, 0x0C.toByte).zipWithIndex.flatMap { case (page, p) =>
          page.split("\n", -1).iterator.zipWithIndex.map { case (l, i) =>
            LexedLine(doc, p, i, if (l.endsWith("\r")) l.dropRight(1) else l)
          }
        }
      })
  }

  /** Gzip text-payload decode (the WET/compressed-shard ingestion step):
    * streaming JDK inflate per payload inside mapPartitions — no whole-batch
    * materialization, zero shuffle, the decode rides the scan stage exactly
    * like the media codecs. Emits (id, text, n_bytes). Any RFC-1952 stream
    * decodes; the fixture uses stored-deflate members so the DuckDB oracle
    * can re-extract the bytes arithmetically. */
  def gunzipTexts(df: DataFrame, idCol: String, payloadCol: String,
                  maxBytes: Long = 256L * 1024 * 1024): DataFrame = {
    require(idCol != "text" && idCol != "n_bytes",
      s"idCol '$idCol' collides with an output column (text, n_bytes)")
    val spark = df.sparkSession
    import spark.implicits._
    // null/uncastable ids cannot survive the typed (Long, _) decode — the
    // encoder would throw OUTSIDE the per-row try below and kill the task;
    // drop them up front (the repo-wide null-id convention)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, gz) =>
        // corrupt-member contract (web-scale shards WILL contain bad magic /
        // truncated streams / CRC mismatches / decompression bombs): the row
        // survives with NULL text and n_bytes = -1 instead of failing the
        // task. The bomb cap matters because an OutOfMemoryError from an
        // unbounded inflate is fatal and would escape any catch.
        val bis = new java.io.ByteArrayInputStream(gz)
        var in: PeekGzip = null
        try {
          in = new PeekGzip(bis)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var total = 0L
          var bomb = false
          var n = in.read(buf)
          while (n >= 0 && !bomb) {
            total += n
            if (total > maxBytes) bomb = true
            else { out.write(buf, 0, n); n = in.read(buf) }
          }
          // the JDK inflater SILENTLY truncates at a corrupt non-first
          // member (readTrailer swallows a malformed next header and
          // reports clean EOF — verified empirically): leftover unconsumed
          // input at EOF means exactly that, so the row degrades to the
          // corrupt contract instead of passing partial text off as the
          // whole document. At a CLEAN final EOF the un-drained count is
          // exactly the 8-byte trailer (readTrailer reads it via a side
          // SequenceInputStream without decrementing the inflater's
          // remaining), so the junk threshold is > 8. (Junk of <= 8 bytes
          // can still evade detection — an accepted residual.)
          val leftover = !bomb && (in.unread + bis.available()) > 8
          if (bomb || leftover) (id, null: String, -1L)
          else {
            val b = out.toByteArray
            (id, new String(b, StandardCharsets.UTF_8), b.length.toLong)
          }
        } catch { case scala.util.control.NonFatal(_) =>
          (id, null: String, -1L)
        } finally {
          // releases the Inflater's native zlib memory NOW, not at GC —
          // millions of corrupt rows would otherwise accumulate native
          // allocations invisible to the heap
          if (in != null) in.close()
        }
      })
      .toDF(idCol, "text", "n_bytes")
  }

  /** Deterministic gzip writer for fixtures/tests: stored-deflate (level 0)
    * with a 64 KiB deflate buffer so payloads under ~64 KiB become exactly
    * ONE final stored block — asserted, so the oracle may use fixed offsets
    * (10-byte header, 5-byte block header, data, 8-byte trailer). */
  def gzipStored(s: String): Array[Byte] = {
    val data = s.getBytes(StandardCharsets.UTF_8)
    require(data.length < 65535, "gzipStored fixture cap: one stored block")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos, 1 << 16) {
      `def`.setLevel(java.util.zip.Deflater.NO_COMPRESSION)
    }
    gz.write(data); gz.close()
    val out = bos.toByteArray
    require(out.length == 10 + 5 + data.length + 8,
      s"expected single stored block, got ${out.length} bytes for ${data.length}")
    out
  }

  /** Deterministic MULTI-block gzip writer: the payload split into
    * `blockCap`-byte stored-deflate blocks (RFC 1951 §3.2.4: 1 header byte
    * — BFINAL in the LSB, BTYPE=00 — then LEN/NLEN little-endian, then raw
    * bytes), wrapped in a hand-rolled RFC 1952 container (the JDK's 10-byte
    * header shape, CRC32 + ISIZE trailer). [[gunzipTexts]] decodes it with
    * the ordinary inflater like any other member; the value of the fixture
    * is that the DuckDB oracle must WALK the block chain (a recursive CTE
    * over byte offsets) rather than slice one fixed window — multi-block is
    * what real stored-deflate shards look like past 64 KiB. */
  def gzipStoredBlocks(s: String, blockCap: Int): Array[Byte] = {
    val data = s.getBytes(StandardCharsets.UTF_8)
    require(blockCap >= 1 && blockCap <= 65535, s"bad blockCap $blockCap")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val nBlocks = math.max(1, (data.length + blockCap - 1) / blockCap)
    for (i <- 0 until nBlocks) {
      val from = i * blockCap
      val len = math.min(data.length - from, blockCap)
      bos.write(if (i == nBlocks - 1) 1 else 0)
      bos.write(len & 0xFF); bos.write((len >> 8) & 0xFF)
      bos.write(~len & 0xFF); bos.write((~len >> 8) & 0xFF)
      bos.write(data, from, len)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val c = crc.getValue
    bos.write((c & 0xFF).toInt); bos.write(((c >> 8) & 0xFF).toInt)
    bos.write(((c >> 16) & 0xFF).toInt); bos.write(((c >> 24) & 0xFF).toInt)
    val n = data.length.toLong
    bos.write((n & 0xFF).toInt); bos.write(((n >> 8) & 0xFF).toInt)
    bos.write(((n >> 16) & 0xFF).toInt); bos.write(((n >> 24) & 0xFF).toInt)
    bos.toByteArray
  }
}
