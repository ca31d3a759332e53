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
    require(!df.columns.contains("session_idx"),
      "byGap: input already has a 'session_idx' column")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    // exact epoch MICROSECONDS (integer, NTZ-safe): a floored whole-second
    // cast under-splits sub-second streams (gap 1800.05s floors to 1800 and
    // stays merged) relative to session_window's exact arithmetic; micros
    // match both session_window and the DuckDB oracle's epoch_us exactly
    val usec = unix_micros(col(tsCol).cast("timestamp"))
    val gap = usec - lag(usec, 1).over(w)
    val brk = when(gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    // null-ts rows are dropped: Spark's session_window injects an
    // isnotnull(ts) filter, and the two formulations must agree on counts
    df.filter(col(tsCol).isNotNull).withColumn("session_idx", sum(brk).over(w))
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
