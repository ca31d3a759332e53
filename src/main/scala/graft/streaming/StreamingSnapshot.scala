package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Snapshot

/** Streaming → Snapshot-table commit path: each micro-batch lands as ONE
  * delta snapshot of a `graft.sources.Snapshot` table (parent data files
  * hard-linked, only batch rows written — the metadata-only append that
  * keeps a 10^12-turn table's daily commit affordable).
  *
  * Exactly-once from an at-least-once engine: Structured Streaming's
  * foreachBatch re-delivers the in-flight batch after a crash, so each
  * commit carries the batch id as a manifest TAG; a replayed batch finds
  * its tag in `Snapshot.committedTags` and becomes a no-op. Combined with
  * the table's own staged-manifest-last protocol (kill-safe at every step),
  * a sink restart can duplicate work but never duplicate ROWS — the same
  * idempotent-commit contract Iceberg's `commitStagedChanges` gives a
  * streaming writer.
  *
  * Reference grounding: the reference pipeline re-runs whole scripts and
  * overwrites its committed CSVs (`Mutiple_CIS_Pdfs.py:77-79`); this is
  * that snapshotting habit made incremental, resumable, and duplicate-free
  * under the north rule's checkpoint/resume requirement. */
object StreamingSnapshot {

  /** Commit one micro-batch; returns false when the batch id was already
    * committed (crash replay) and nothing was written. */
  def appendBatch(batch: DataFrame, tablePath: String, batchId: Long,
                  chunkKey: String, numChunks: Int): Boolean = {
    val tag = s"batch-$batchId"
    if (Snapshot.committedTags(tablePath).contains(tag)) false
    else {
      Snapshot.append(batch, tablePath, chunkKey, numChunks, tag = tag)
      true
    }
  }

  /** Start the sink: stream → one tagged delta snapshot per micro-batch. */
  def sink(stream: DataFrame, tablePath: String, checkpointDir: String,
           chunkKey: String, numChunks: Int): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, tablePath, batchId, chunkKey, numChunks)
        ()
      }
      .start()
}
