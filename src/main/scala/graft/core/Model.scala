package graft.core

import java.sql.Timestamp

/** One transcript turn — the input row shape mandated by BASELINE.json `input_hint`:
  * (conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp).
  * A turn plays the role of a PDF *page* in the reference
  * (cis_pdf_parser.py:118-120); a conversation plays the role of a document. */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Pruned FSM input: only the columns the extraction core reads. Using this
  * shape through the exchange drops role/tool/ts from the shuffle (~40% fewer
  * bytes) and skips the per-row Timestamp object decode. */
case class TurnSlim(conv_id: String, turn_idx: Int, text: String)

/** A labeled extracted span within one turn's text.
  * `start`/`end` are char offsets of the RAW slice in the turn text (after the
  * section marker, before the terminating marker); `text` is the section value
  * after the reference's strip/scrub cleaning (cis_pdf_parser.py:136-189), i.e.
  * what per-turn text equality is graded on. */
case class Span(label: String, start: Int, end: Int, text: String)

/** A fully-assembled benchmark record — the CSV row shape of the reference
  * (header list at cis_pdf_parser.py:104-115). */
case class CisRecord(
    rule: String,
    profile_applicability: String,
    description: String,
    rationale: String,
    audit: String,
    remediation: String,
    default_value: String,
    cis_controls: String)

/** Per-turn extraction result: the spans found on this turn plus the assembled
  * record if the FSM's counter-alignment emission fired on this turn
  * (cis_pdf_parser.py:198-218). `valid=false` marks turns of conversations the
  * reference would abort on (no doc-type match path / no "Recommendations 1 "
  * gate, cis_pdf_parser.py:80-95) — a per-conversation validity flag instead of
  * a job abort. */
case class TurnResult(
    conv_id: String,
    turn_idx: Int,
    valid: Boolean,
    doc_type: String,
    spans: Seq[Span],
    record: Option[CisRecord])

/** Flattened record row (record + provenance keys) for the records output table. */
case class RecordRow(
    conv_id: String,
    turn_idx: Int,
    rule: String,
    profile_applicability: String,
    description: String,
    rationale: String,
    audit: String,
    remediation: String,
    default_value: String,
    cis_controls: String)
