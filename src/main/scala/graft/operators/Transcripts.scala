package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TextHashExpressions

/** Transcript-table hygiene operators — the validation/bookkeeping pass an
  * agent-transcript corpus needs BEFORE extraction or training-data curation
  * (the reference assumes well-formed page streams; real 10^12-turn
  * transcript tables do not arrive that way).
  *
  * Both operators are one-shuffle shapes on the conv_id key: a window or a
  * grouped fold over (conv_id ORDER BY turn_idx) — the same partitioning the
  * extraction pipeline already uses, so at scale they ride the SAME exchange
  * (compute them in the pass that repartitions for the FSM and the
  * validation is free). */
object Transcripts {

  /** Per-conversation well-formedness profile. One window (lag over the
    * stable turn order) + one hash-agg; no data beyond (conv_id, turn_idx,
    * role, tool, ts, empty-flag) moves — text itself never shuffles.
    *
    * Emitted violation counters (all 0 on a clean conversation):
    *  - `dup_idx`      duplicate turn_idx values (n_turns − distinct idx)
    *  - `idx_gaps`     missing indexes inside [min_idx, max_idx]
    *  - `min_idx`      first index (a well-formed conversation starts at 0)
    *  - `empty_turns`  null/blank text
    *  - `role_repeats` adjacent turns with the same role
    *  - `ts_regressions` adjacent turns with a backwards timestamp
    *  - `orphan_tool_turns` role='tool' turns not preceded by a tool call
    *    (previous turn's `tool` column null/empty)
    *  - `null_ts` / `null_idx` null timestamps / turn indexes — counted as
    *    their own violations because nulls MASK the adjacent-pair checks
    *    (a regression straddling a null ts compares to null → uncounted)
    *    and a null idx would otherwise misreport as a duplicate index
    *
    * Adjacent-pair checks order by (turn_idx, fingerprint64(text),
    * text-is-null, role, tool, ts) so duplicate indexes still compare
    * deterministically in any engine — the 8-byte fingerprint stands in for
    * text as the tie key (keeping text itself out of the exchange), and the
    * remaining keys make the order total up to fully interchangeable rows. */
  def wellFormed(df: DataFrame): DataFrame = {
    // the tie order must be TOTAL up to interchangeable rows: fp alone
    // collapses NULL text with '' (both hash ""), so a NULL/'' duplicate
    // pair at one turn_idx would order arbitrarily and flip the lag-based
    // counters between runs/engines — tnull, tool and ts complete the key
    // (rows still tied after all six are fully interchangeable for every
    // adjacent-pair counter). Spark asc = nulls-first; the oracle window
    // pins DuckDB to NULLS FIRST per key.
    val w = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx"), col("fp"), col("tnull"), col("role"),
        col("tool"), col("ts"))
    val stepped = df.select(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("ts"),
        graft.expressions.TextHashExpressions.fingerprint64(
          coalesce(col("text"), lit(""))).as("fp"),
        col("text").isNull.as("tnull"),
        (col("text").isNull ||
          trim(col("text"), " \t\r\n\u000B\f") === "").as("is_empty"),
        col("ts").isNull.as("ts_null"),
        col("turn_idx").isNull.as("idx_null"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_tool", lag(col("tool"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    stepped.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"),
      (count(lit(1)) - countDistinct(col("turn_idx"))).as("dup_idx"),
      (max(col("turn_idx")) - min(col("turn_idx")) + 1L -
        countDistinct(col("turn_idx"))).as("idx_gaps"),
      min(col("turn_idx")).cast("long").as("min_idx"),
      cnt(col("is_empty")).as("empty_turns"),
      cnt(col("prev_role").isNotNull && col("prev_role") === col("role"))
        .as("role_repeats"),
      cnt(col("prev_ts").isNotNull && col("ts") < col("prev_ts"))
        .as("ts_regressions"),
      cnt(col("role") === "tool" &&
          (col("prev_tool").isNull || col("prev_tool") === ""))
        .as("orphan_tool_turns"),
      cnt(col("ts_null")).as("null_ts"),
      cnt(col("idx_null")).as("null_idx"))
      .withColumn("well_formed",
        col("dup_idx") === 0L && col("idx_gaps") === 0L &&
          col("min_idx") === 0L && col("empty_turns") === 0L &&
          col("role_repeats") === 0L && col("ts_regressions") === 0L &&
          col("orphan_tool_turns") === 0L &&
          col("null_ts") === 0L && col("null_idx") === 0L)
  }

  /** The repair side of [[wellFormed]] — repairs the INDEX/BLANK/NULL-IDX
    * violation classes (dropping blank turns can itself surface adjacent
    * same-role turns, and keep-min dedup can surface ts regressions the
    * duplicate was hiding: re-run [[wellFormed]] on the output when the
    * role/ts classes matter) —
    *  1. drop null/blank turns,
    *  2. resolve duplicate (conv_id, turn_idx) pairs deterministically
    *     (keep the struct-min by (ts, text, role) — a partial-aggregatable
    *     keep-first, skew-safe like `TrainingData.chunkDedup`),
    *  3. re-sequence turn_idx contiguously from 0 in (turn_idx, ts, text)
    *     order, closing gaps.
    * One hash-agg + one window, both on the conv_id key the downstream FSM
    * repartitions by anyway. Emits the original index as `orig_turn_idx`
    * for lineage. */
  def repair(df: DataFrame): DataFrame = {
    val kept = df
      .filter(col("text").isNotNull &&
        trim(col("text"), " \t\r\n\u000B\f") =!= "")
      // a null turn_idx is an unknowable position: dropping it is the only
      // repair that cannot invent an ordering (and wellFormed counts it)
      .filter(col("turn_idx").isNotNull)
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(min(struct(col("ts"), col("text"), col("role"), col("tool"))).as("t"))
      .select(col("conv_id"), col("turn_idx").as("orig_turn_idx"),
        col("t.role").as("role"), col("t.text").as("text"),
        col("t.tool").as("tool"), col("t.ts").as("ts"))
    kept.withColumn("turn_idx",
        (row_number().over(Window.partitionBy("conv_id")
          .orderBy(col("orig_turn_idx"), col("ts"), col("text"))) - 1))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts",
        "orig_turn_idx")
  }

  /** Shared-prefix (branch / regeneration) detection: conversations that are
    * re-rolls of each other share an identical prefix of (role, text) turns
    * and diverge where the agent was re-sampled. For each conversation,
    * emits the DEEPEST depth d at which ≥ `minSiblings` conversations share
    * its exact d-turn prefix, the prefix-family hash at that depth, and the
    * family size (0/0/0 for conversations with no shared prefix).
    *
    * Shape: per-turn content hash (codegen, scan side) → per-conversation
    * ordered fold into a prefix-hash CHAIN ([[TextHashExpressions.PrefixChain]],
    * state = one long — the collect_list is bounded by conversation length,
    * the same bound `Extraction.conversationDocs` already carries) →
    * posexplode to (depth, prefix_hash) rows (≤ total turn count) → one
    * hash-agg on (depth, prefix_hash) for family sizes → join back + argmax
    * per conversation. Only 8-byte hashes shuffle; text never leaves the
    * scan. Family keys are (depth, chain-hash), so the candidate space never
    * pairs conversations — no quadratic blocking anywhere. */
  def branchPrefixes(df: DataFrame, minSiblings: Int = 2): DataFrame = {
    require(minSiblings >= 2,
      s"minSiblings must be >= 2 (1 would flag every conversation as its own full-depth family), got $minSiblings")
    val turnHash = TextHashExpressions.fingerprint64(
      concat(coalesce(col("role"), lit("")), lit("\u001F"),
        coalesce(col("text"), lit(""))))
    val chains = df
      .select(col("conv_id"), struct(col("turn_idx"), turnHash.as("h")).as("t"))
      .groupBy("conv_id")
      .agg(sort_array(collect_list(col("t"))).as("ts"))
      .select(col("conv_id"), posexplode(TextHashExpressions.prefix_chain(
        transform(col("ts"), t => t.getField("h")))))
      .select(col("conv_id"), (col("pos") + 1).cast("long").as("depth"),
        col("col").as("pref"))
    // chains feeds BOTH the family census and the per-conv readout; without
    // a persist the whole scan+fold subtree runs twice (it showed up twice
    // in the physical plan). Disk-backed: chain rows are ~24 B + conv_id,
    // far smaller than re-scanning the text table at 10^12 turns.
    chains.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // family sizes as a partial-combining hash-agg, NOT a count-over-window:
    // a window would buffer each (depth, pref) partition whole, and depth-1
    // families are skew magnets (every conversation opening with the same
    // system prompt lands in one partition)
    val fams = chains.groupBy("depth", "pref")
      .agg(count(lit(1)).as("n_siblings"))
      .filter(col("n_siblings") >= minSiblings)
    // left join keeps every conversation's depth-1 row, so the final agg
    // needs no separate distinct-conv_id pass: unshared conversations fall
    // out of the conditional argmax as null → 0/0/0
    val out = chains.join(fams, Seq("depth", "pref"), "left")
      .groupBy("conv_id")
      .agg(max(when(col("n_siblings").isNotNull,
        struct(col("depth"), col("pref"), col("n_siblings")))).as("m"))
      .select(col("conv_id"),
        coalesce(col("m.depth"), lit(0L)).as("branch_depth"),
        coalesce(col("m.pref"), lit(0L)).as("family_hash"),
        coalesce(col("m.n_siblings"), lit(0L)).as("n_siblings"))
    // Eager localCheckpoint, not persist(): the one-row-per-conversation
    // result must be materialized so the per-turn chain blocks can be
    // released HERE, but a persist() pins it in the CacheManager until an
    // unpersist nobody is contracted to call (one leaked entry per call on
    // a long-running driver — the incrementalNearDup failure mode). The
    // checkpointed blocks are reclaimed by the ContextCleaner once the
    // caller drops the returned frame.
    val outCp = out.localCheckpoint()
    outCp
    } finally { chains.unpersist(); () }
  }
}
