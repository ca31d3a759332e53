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
  * turns arrive — hence re-emit-on-update rather than append-once. */
object StreamingExtract {

  case class ConvBuffer(turns: List[TurnSlim])

  private def update(
      convId: String,
      rows: Iterator[TurnSlim],
      state: GroupState[ConvBuffer]): Iterator[TurnResult] = {
    // null text ≡ empty page, matching the batch planes' degradation
    val incoming = rows.map(t => if (t.text == null) t.copy(text = "") else t).toList
    val buffered = state.getOption.map(_.turns).getOrElse(Nil) ++ incoming
    state.update(ConvBuffer(buffered))
    ConvParser.parse(convId, buffered.sortBy(_.turn_idx).toIndexedSeq)
  }

  /** streamingTurns must be a streaming Dataset[TurnSlim] (e.g. from
    * readStream.parquet or MemoryStream). */
  def extract(streamingTurns: Dataset[TurnSlim]): Dataset[TurnResult] = {
    implicit val te: org.apache.spark.sql.Encoder[TurnResult] = Encoders.product[TurnResult]
    implicit val se: org.apache.spark.sql.Encoder[ConvBuffer] = Encoders.product[ConvBuffer]
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    streamingTurns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
