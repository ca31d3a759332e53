package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream / transcript op of
  * splitting a key's ordered rows into sessions wherever the time gap to the
  * previous row exceeds a threshold. The reference has no temporal operators
  * at all (SURVEY §1.1: no time-series, no streams), but the north-rule
  * input is a timestamped transcript table, and session splits are the
  * canonical pre-pass for turning raw agent event logs into conversation
  * units.
  *
  * Two formulations, both single-shuffle:
  *  - `byGap`: window/lag + running sum (gaps-and-islands). Exposes a
  *    per-row 0-based `session_idx`, supports an explicit tie-break column,
  *    and its SQL shape replays verbatim in the DuckDB oracle. New session
  *    when gap > gapSeconds (strict).
  *  - `sessionWindows`: Spark's native `session_window` aggregation — the
  *    built-in operator designed for this, identical code path in batch and
  *    Structured Streaming. Windows merge while next.ts <= prev.ts + gap
  *    (an exactly-gap step stays in the session — same strict->split
  *    boundary as `byGap`, asserted by spec at the boundary).
  */
object Sessionize {

  /** Per-row session index per key (0-based), ordered by (ts, tieBreak). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
            gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    // NTZ-safe epoch seconds: TIMESTAMP_NTZ has no direct long cast
    val sec = col(tsCol).cast("timestamp").cast("long")
    val gap = sec - lag(sec, 1).over(w)
    val brk = when(gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_idx", sum(brk).over(w))
  }

  /** Session summary on top of `byGap`: one hash-agg per (key, session). */
  def sessionSummary(df: DataFrame, keyCol: String, tsCol: String,
                     tieBreak: String, gapSeconds: Long): DataFrame =
    byGap(df, keyCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))

  /** Native session_window aggregation: (key, session start/end, count). */
  def sessionWindows(df: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long): DataFrame =
    df.groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("n_events"))
}
