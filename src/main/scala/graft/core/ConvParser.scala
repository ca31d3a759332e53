package graft.core

/** Per-conversation driver for the flagship FSM — the lifecycle of
  * `/root/reference/cis_pdf_parser.py main()` (":59-222") applied to one
  * conversation (= document), one turn (= page) at a time.
  *
  * This single class is both:
  *  - the pinned single-threaded ORACLE (SURVEY §5.1) used to generate goldens, and
  *  - the per-group worker the Spark pipeline runs inside `mapPartitions`
  *    (graft.operators.Extraction) — identical code on both planes, so golden
  *    equality tests the *distribution*, not two implementations.
  *
  * Buffers one conversation's texts: the P8 front-matter gate needs the LAST
  * `"Recommendations 1 "` hit before parsing can start (cis_pdf_parser.py:85-90
  * scans the whole doc first). Memory is bounded by the largest conversation
  * (heavy-tail cap handled by the pipeline's skew routing, SURVEY §7).
  */
object ConvParser {

  /** `turns` MUST be sorted by turn_idx ascending (stable turn ordering —
    * the north rule's window over (conv_id ORDER BY turn_idx)). */
  def parse(convId: String, turns: IndexedSeq[TurnSlim]): Iterator[TurnResult] = {
    if (turns.isEmpty) return Iterator.empty
    val cover = turns.head.text
    DocType.classify(cover) match {
      case u @ DocType.UnknownName(_) =>
        // reference: uncaught ValueError (":79") — we flag the conversation;
        // the label comes from ONE place (DocType.UnknownName.docType)
        turns.iterator.map(t =>
          TurnResult(convId, t.turn_idx, valid = false, u.docType, Nil, None))
      case DocType.Classified(docType, patternStr) =>
        DocType.firstContentOrdinal(turns.iterator.map(_.text)) match {
          case None =>
            // ":93-95" — not a benchmark conversation
            turns.iterator.map(t =>
              TurnResult(convId, t.turn_idx, valid = false, docType, Nil, None))
          case Some(first) =>
            val fsm = new RuleFsm(RuleFsm.compile(patternStr))
            turns.iterator.zipWithIndex.map { case (t, ord) =>
              if (ord < first)
                TurnResult(convId, t.turn_idx, valid = true, docType, Nil, None)
              else {
                val (spans, rec) = fsm.feed(t.text)
                TurnResult(convId, t.turn_idx, valid = true, docType, spans, rec)
              }
            }
        }
    }
  }

  def parse(convId: String, turns: IndexedSeq[Turn])(implicit d: DummyImplicit): Iterator[TurnResult] =
    parse(convId, turns.map(t => TurnSlim(t.conv_id, t.turn_idx, t.text)))

  /** Oracle convenience: parse a whole (unsorted) transcript collection on one
    * thread, grouped by conv_id, sorted by turn_idx — golden generator. */
  def parseAll(turns: Seq[Turn]): Seq[TurnResult] =
    turns.groupBy(_.conv_id).toSeq.sortBy(_._1).flatMap { case (cid, ts) =>
      parse(cid, ts.sortBy(_.turn_idx).toIndexedSeq)
    }
}
