package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the incremental form of `Dedup.exact`'s
  * keep-first: emit the FIRST arrival of each content hash, drop later
  * duplicates.
  *
  * Scale: plain `dropDuplicates` on a stream accumulates one state row per
  * key FOREVER (unbounded for a dedup key like a content hash);
  * `dropDuplicatesWithinWatermark` evicts a key's state once the watermark
  * passes its event time, bounding state to the duplicate horizon — the
  * standard contract for streaming corpus ingestion, where duplicates
  * cluster in time (re-crawls, retries). Keys are 128-bit content hashes,
  * so state rows are fixed-width regardless of document size. */
object StreamingDedup {

  /** `turns`: streaming DataFrame with an event-time column `tsCol` and a
    * content column `textCol`. Emits input rows + `text_hash`, first
    * arrival per hash only (within the watermark horizon). */
  def firstOccurrence(turns: DataFrame, tsCol: String = "ts",
                      textCol: String = "text",
                      watermark: String = "10 minutes"): DataFrame =
    turns.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")
}
