package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join (§2.9): correlate two live streams on a key
  * plus an event-time window — the shape behind "attach each tool event to
  * the assistant turn that triggered it" when BOTH sides arrive as streams.
  *
  * Both sides must be watermarked and the join condition must bound the
  * right timestamp relative to the left one; that pair is what lets Spark
  * EVICT join state (a side's row can be dropped once the other side's
  * watermark passes the interval), so state is bounded by
  * watermark + interval, not by stream length — the property that makes the
  * join runnable forever at transcript-firehose scale. The same plan runs
  * in batch mode, which is how the spec pins stream == batch. */
object StreamingJoin {

  /** Inner interval join: rows of `left`/`right` matching `keyCond` with
    * `rightTs ∈ [leftTs, leftTs + maxDelaySec]`. */
  def intervalJoin(left: DataFrame, leftTs: String, leftWm: String,
                   right: DataFrame, rightTs: String, rightWm: String,
                   keyCond: Column, maxDelaySec: Int): DataFrame = {
    require(maxDelaySec >= 0,
      s"maxDelaySec must be >= 0, got $maxDelaySec (a negative interval is unsatisfiable: the join silently emits nothing)")
    // bare col() refs in the interval condition resolve by NAME: any shared
    // column name across the two sides is ambiguous (or silently wrong) —
    // pre-rename one side, as turnToolEvents does with e_conv_id/ets
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      s"left/right share column names ${left.columns.toSet.intersect(right.columns.toSet).mkString(", ")} — rename one side before the interval join")
    left.withWatermark(leftTs, leftWm)
      .join(right.withWatermark(rightTs, rightWm),
        keyCond && col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelaySec SECONDS"))
  }

  /** Transcript flavor: each turn joined to the tool events of its
    * conversation arriving within `maxDelaySec` of the turn. `events` must
    * carry (e_conv_id, e_tool, ets) to keep the join output unambiguous. */
  def turnToolEvents(turns: DataFrame, events: DataFrame,
                     maxDelaySec: Int = 300): DataFrame =
    intervalJoin(turns, "ts", "2 minutes", events, "ets", "2 minutes",
      col("conv_id") === col("e_conv_id"), maxDelaySec)
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("e_tool"), col("ts"), col("ets"))
}
