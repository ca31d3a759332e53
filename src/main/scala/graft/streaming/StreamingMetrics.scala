package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Event-time windowed streaming metrics over the transcript stream — the
  * watermark + windowed-aggregation surface of §2.9 (the A2 running-counter
  * family, incremental):
  *
  *  - `withWatermark(ts, …)` bounds state AND defines the late-data policy:
  *    a turn older than (max event time − watermark) is dropped, never
  *    double-counted — the property the append-mode sink relies on.
  *  - windows close (emit, in Append mode) only once the watermark passes
  *    their end, so every emitted row is final — an idempotent upsert key
  *    (window, role) for the metrics sink.
  *
  * Scale: state is one row per open (window, role) — independent of turn
  * volume; the aggregation is a streaming partial-agg (map-side combine)
  * exactly like the batch plan. */
object StreamingMetrics {

  /** Per-(event-time window, role) turn metrics. `turns` must be a streaming
    * DataFrame with (conv_id, turn_idx, role, text, ts). */
  def turnRate(turns: DataFrame, windowLen: String = "1 minute",
               watermark: String = "2 minutes"): DataFrame =
    turns.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        coalesce(sum(TextFunctions.tokenCount(col("text"))), lit(0L))
          .as("n_tokens")) // all-null-text window: 0 tokens, never a NULL metric
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("role"), col("n_turns"), col("n_tokens"))
}
