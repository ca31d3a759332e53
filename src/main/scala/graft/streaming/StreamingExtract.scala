package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.{ConvParser, TurnResult, TurnSlim}

/** Structured-Streaming layer over the same stateless-per-turn core
  * (SURVEY §2.9: optional — the reference is batch-only; the per-turn
  * extraction core is stateless ACROSS conversations, so an incremental mode
  * layers cleanly on `flatMapGroupsWithState`).
  *
  * Semantics: conversation turns are buffered in group state; every
  * micro-batch that touches a conversation re-runs the FSM over the full
  * buffered, turn-ordered conversation and re-emits its `TurnResult`s
  * (Update mode — downstream keeps latest per (conv_id, turn_idx), exactly
  * the snapshot-upsert shape an Iceberg sink would apply). State is bounded
  * by one conversation (same bound as the batch path).
  *
  * The reference semantics (P8 gate = LAST "Recommendations 1 " hit) are
  * prefix-dependent: results for a conversation legitimately change as later
  * turns arrive — hence re-emit-on-update rather than append-once.
  *
  * State lifetime: per-conversation buffers live until evicted. The default
  * (no timeout) matches the batch plane bit-for-bit but grows state with
  * every conversation EVER seen — on an unbounded firehose pass
  * `idleTimeout = Some("2 hours")` (processing-time) so conversations idle
  * longer than that are evicted; a turn arriving after eviction restarts
  * its conversation from empty (prefix-dependent results then reflect only
  * the post-eviction suffix — the documented trade for bounded state).
  *
  * Source-duplicate rows (an upstream producer retry delivering the same
  * turn twice) are kept, not deduplicated: the batch plane parses
  * duplicates as-is, and stream == batch parity is the contract —
  * dedup belongs upstream or in `Transcripts.repair`. (Spark's own
  * checkpointed replays are NOT duplicates: a replayed micro-batch
  * re-applies against the pre-batch state snapshot.) */
object StreamingExtract {

  case class ConvBuffer(turns: List[TurnSlim])

  private def update(
      convId: String,
      rows: Iterator[TurnSlim],
      state: GroupState[ConvBuffer],
      idleTimeout: Option[String]): Iterator[TurnResult] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // null text ≡ empty page, matching the batch planes' degradation
    val incoming = rows.map(t => if (t.text == null) t.copy(text = "") else t).toList
    val buffered = state.getOption.map(_.turns).getOrElse(Nil) ++ incoming
    state.update(ConvBuffer(buffered))
    idleTimeout.foreach(state.setTimeoutDuration)
    ConvParser.parse(convId, buffered.sortBy(_.turn_idx).toIndexedSeq)
  }

  /** streamingTurns must be a streaming Dataset[TurnSlim] (e.g. from
    * readStream.parquet or MemoryStream). */
  def extract(streamingTurns: Dataset[TurnSlim],
              idleTimeout: Option[String] = None): Dataset[TurnResult] = {
    implicit val te: org.apache.spark.sql.Encoder[TurnResult] = Encoders.product[TurnResult]
    implicit val se: org.apache.spark.sql.Encoder[ConvBuffer] = Encoders.product[ConvBuffer]
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    streamingTurns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        update(_, _, _, idleTimeout))
  }
}
