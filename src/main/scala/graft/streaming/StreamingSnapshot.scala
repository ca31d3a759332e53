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
  * Operational contract (documented, matching `Snapshot.claimManifest`'s
  * single-writer stance):
  *  - ONE live query per (table, tagPrefix). Batch ids are only unique
  *    within one checkpoint lineage — resetting the checkpoint dir (or
  *    pointing a second query at the same table) restarts ids at 0, and
  *    the replay guard would silently discard the early batches as
  *    "already committed". Give each checkpoint lineage its own
  *    `tagPrefix` and the tag spaces cannot collide.
  *  - Zombie fencing is out of scope: a stalled old driver and its
  *    replacement can both pass the tag check before either commits (the
  *    classic two-live-writers race). True fencing needs a coordination
  *    service CAS on the tag, exactly as Iceberg requires of its catalog.
  *
  * Reference grounding: the reference pipeline re-runs whole scripts and
  * overwrites its committed CSVs (`Mutiple_CIS_Pdfs.py:77-79`); this is
  * that snapshotting habit made incremental, resumable, and duplicate-free
  * under the north rule's checkpoint/resume requirement. */
object StreamingSnapshot {

  /** Commit one micro-batch; returns false when the batch id was already
    * committed (crash replay) and nothing was written. */
  def appendBatch(batch: DataFrame, tablePath: String, batchId: Long,
                  chunkKey: String, numChunks: Int,
                  tagPrefix: String = "batch"): Boolean = {
    val tag = s"$tagPrefix-$batchId"
    if (Snapshot.committedTags(tablePath).contains(tag)) false
    else {
      Snapshot.append(batch, tablePath, chunkKey, numChunks, tag = tag)
      true
    }
  }

  /** Start the sink: stream → one tagged delta snapshot per micro-batch.
    *
    * `outputMode` must match the upstream plan ("append" for stateless /
    * watermark-finalized streams; "update" for `StreamingExtract`'s
    * re-emitting flatMapGroupsWithState — note update-mode batches contain
    * RE-EMITTED rows for updated keys, so pair them with a keyed
    * reconciliation read, not a blind row count). Empty micro-batches are
    * skipped — an idle 1 s-trigger stream must not mint 86k junk versions
    * a day. The committed-tag set is loaded from the manifests ONCE and
    * maintained in memory across batches (foreachBatch is serial within a
    * query), so per-commit cost stays O(1) in stream age instead of
    * re-listing every manifest per trigger. */
  def sink(stream: DataFrame, tablePath: String, checkpointDir: String,
           chunkKey: String, numChunks: Int,
           outputMode: String = "append",
           tagPrefix: String = "batch"): StreamingQuery = {
    val seen = scala.collection.mutable.Set.empty[String]
    var loaded = false
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!loaded) { seen ++= Snapshot.committedTags(tablePath); loaded = true }
        val tag = s"$tagPrefix-$batchId"
        if (!seen.contains(tag) && !batch.isEmpty) {
          Snapshot.append(batch, tablePath, chunkKey, numChunks, tag = tag)
          seen += tag
        }
        ()
      }
      .start()
  }
}
