package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Json

/** Iceberg-style snapshot table emulation (SURVEY §7: no Iceberg runtime jar in
  * this sandbox, so snapshot/commit/lineage semantics are provided by layout):
  *
  * {{{
  * table/
  *   CURRENT               — "<k>" (atomically replaced pointer)
  *   manifest-v<k>.json    — snapshot id, parent, per-chunk files+rows, metrics
  *   v<k>/_chunk=<c>/      — committed data files
  *   _staging-v<k>/        — in-flight write (never visible to readers)
  * }}}
  *
  * Commit protocol (atomic + resumable):
  *  1. stage: one Spark job writes all chunks under `_staging-v<k>` and drops a
  *     `_STAGED` marker — restartable from scratch, invisible to readers;
  *  2. promote: per-chunk directory rename into `v<k>` — idempotent (already-
  *     promoted chunks are skipped on rerun);
  *  3. manifest: written to a temp name, atomically moved — the manifest IS the
  *     commit; a killed job before this point leaves the previous snapshot
  *     intact and a rerun with the same snapshot id completes it with no
  *     duplicate or missing chunks;
  *  4. CURRENT pointer swap.
  *
  * On a real cluster the same protocol runs over the HDFS/S3-committer rename
  * primitives; here `java.nio.file` stands in. Readers never list staging dirs.
  */
object Snapshot {

  private def currentVersion(table: Path): Option[Int] = {
    val cur = table.resolve("CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim.toInt) else None
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write `df` as snapshot `snapshotId` of `tablePath`, chunked by
    * `pmod(xxhash64(chunkKey), numChunks)`. Safe to re-invoke after a kill at
    * any point; a completed snapshot is a no-op. Returns observed metrics. */
  def write(df: DataFrame, tablePath: String, chunkKey: String,
            numChunks: Int, snapshotId: Int = -1,
            observation: Option[org.apache.spark.sql.Observation] = None): Map[String, Long] = {
    val spark = df.sparkSession
    val table = Paths.get(tablePath)
    Files.createDirectories(table)
    val k = if (snapshotId >= 0) snapshotId else currentVersion(table).getOrElse(-1) + 1
    val manifest = table.resolve(s"manifest-v$k.json")
    if (Files.exists(manifest)) return Map.empty // snapshot already committed

    val staging = table.resolve(s"_staging-v$k")
    val stagedMarker = staging.resolve("_STAGED")
    var observed = Map.empty[String, Long]

    // 1. stage (restart from scratch if the marker never landed)
    if (!Files.exists(stagedMarker)) {
      if (Files.exists(staging)) deleteRecursively(staging)
      df.withColumn("_chunk", pmod(xxhash64(col(chunkKey)), lit(numChunks)))
        .write.partitionBy("_chunk").mode("overwrite")
        .parquet(staging.resolve("data").toString)
      observed = observation.map(_.get.collect {
        case (key, v: Long) => key -> v
        case (key, v: Int) => key -> v.toLong
      }).getOrElse(Map.empty)
      Files.writeString(stagedMarker, "ok")
    }

    // 2. promote chunk dirs (idempotent)
    val dataDir = table.resolve(s"v$k")
    Files.createDirectories(dataDir)
    val stagedData = staging.resolve("data")
    val chunkDirs = Files.list(stagedData).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_chunk=")).toSeq.sortBy(_.toString)
    chunkDirs.foreach { cd =>
      val dst = dataDir.resolve(cd.getFileName.toString)
      if (!Files.exists(dst))
        Files.move(cd, dst, StandardCopyOption.ATOMIC_MOVE)
    }

    // 3. manifest = the commit. Per-chunk lineage: files + rows (parquet
    // footers only — metadata-count, no data scan).
    val perChunk = spark.read.parquet(dataDir.toString)
      .groupBy(col("_chunk")).agg(count(lit(1)).as("rows"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chunkJson = perChunk.toSeq.sortBy(_._1).map { case (c, rows) =>
      val files = Files.list(dataDir.resolve(s"_chunk=$c")).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq.sorted
      c.toString -> Json.obj(
        "rows" -> rows.toString,
        "files" -> Json.arr(files.map(Json.str)))
    }
    val parent = currentVersion(table).getOrElse(-1)
    atomicWrite(manifest, Json.obj(
      "snapshot" -> k.toString,
      "parent" -> parent.toString,
      "chunk_key" -> Json.str(chunkKey),
      "num_chunks" -> numChunks.toString,
      "metrics" -> Json.obj(observed.toSeq.sortBy(_._1)
        .map { case (key, v) => key -> v.toString }: _*),
      "chunks" -> Json.obj(chunkJson: _*)))

    // 4. pointer swap + staging cleanup
    atomicWrite(table.resolve("CURRENT"), k.toString)
    deleteRecursively(staging)
    observed
  }

  /** Read the CURRENT snapshot (or an explicit version) of a table. */
  def read(spark: SparkSession, tablePath: String, version: Int = -1): DataFrame = {
    val table = Paths.get(tablePath)
    val k = if (version >= 0) version
      else currentVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot at $tablePath"))
    spark.read.parquet(table.resolve(s"v$k").toString).drop("_chunk")
  }

  def manifestJson(tablePath: String, version: Int = -1): String = {
    val table = Paths.get(tablePath)
    val k = if (version >= 0) version else currentVersion(table).get
    Files.readString(table.resolve(s"manifest-v$k.json"))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
}
