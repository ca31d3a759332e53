package graft.operators

import org.apache.spark.sql.{Dataset, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The north-rule operator: distributed per-conversation section extraction.
  *
  * Logical shape (SURVEY §3.1): scan → exchange on conv_id → within-partition
  * sort by (conv_id, turn_idx) → streaming per-conversation FSM
  * (`ConvParser`, identical code to the single-threaded oracle) → typed
  * `Dataset[TurnResult]`.
  *
  * Scale design:
  *  - ONE data shuffle total; the sort rides the shuffle
  *    (sortWithinPartitions after the repartition) — no extra exchange for
  *    ordering. The skew-aware plane adds a count pre-pass and a broadcast
  *    of the monster-id table, neither of which moves turn text.
  *  - A conversation NEVER splits across tasks (FSM state is sequential);
  *    skew from heavy-tail conversation lengths is handled by routing each
  *    "monster" conversation to its own dedicated partition while normal
  *    conversations hash into the rest (`extractSkewAware`). Only the heavy
  *    hitters are collected to the driver, and at most `maxMonsters` of them
  *    (top-M by turn count via TakeOrdered) — bounded even when a low
  *    threshold meets a 10^12-turn table; the uncapped tail hashes normally.
  *  - Memory per task is bounded by the largest single conversation (the P8
  *    front-matter gate needs one look-ahead pass over the conversation,
  *    cis_pdf_parser.py:85-90), not by partition size: the group iterator
  *    streams conversation-by-conversation.
  */
object Extraction {

  case class Config(
      numPartitions: Int = 32,
      /** conversations with more turns than this get dedicated partitions */
      monsterThreshold: Long = 2000L,
      /** hard cap on dedicated monster partitions: only the `maxMonsters`
        * HEAVIEST over-threshold conversations are isolated (TakeOrdered —
        * the driver sees at most this many ids, whatever the threshold or
        * table size); the remainder hash with the normal population.
        * Placement-only, so the cap is output-invisible. */
      maxMonsters: Int = 4096,
      /** strip HTML boilerplate from turn text before the FSM (north-rule
        * DOM-heuristic stage; off for reference-exact golden comparison) */
      stripHtml: Boolean = false)

  /** Groups a (conv_id, turn_idx)-sorted iterator into per-conversation runs
    * without materializing more than one conversation at a time. */
  private[operators] def groupedByConv(it: Iterator[TurnSlim]): Iterator[(String, IndexedSeq[TurnSlim])] =
    new Iterator[(String, IndexedSeq[TurnSlim])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (String, IndexedSeq[TurnSlim]) = {
        val cid = buf.head.conv_id
        val b = IndexedSeq.newBuilder[TurnSlim]
        while (buf.hasNext && buf.head.conv_id == cid) b += buf.next()
        (cid, b.result())
      }
    }

  private def parsePartition(cfg: Config)(it: Iterator[TurnSlim]): Iterator[TurnResult] =
    groupedByConv(it).flatMap { case (cid, ts) =>
      // null text ≡ empty page (defined degradation: real transcript tables
      // carry NULL cells; the FSM must not NPE mid-job on one of them).
      // ONE fused copy: a monster conversation must never hold 2-3 transient
      // copies of itself (the per-task memory bound is the largest conv)
      val cleaned = ts.map { t =>
        val raw = if (t.text == null) "" else t.text
        val txt = if (cfg.stripHtml) Boilerplate.stripHtml(raw) else raw
        if (txt eq t.text) t else t.copy(text = txt)
      }
      ConvParser.parse(cid, cleaned)
    }

  /** Dev-profiling hooks (graft.tools.Scratch). */
  def parsePartitionForProfiling(it: Iterator[TurnSlim]): Iterator[TurnResult] =
    parsePartition(Config())(it)
  def groupedForProfiling(it: Iterator[TurnSlim]): Iterator[(String, IndexedSeq[TurnSlim])] =
    groupedByConv(it)

  /** Default path: declarative exchange on conv_id; the FSM is the single
    * non-codegen stage in the middle. The partition count is EXPLICIT
    * (cfg.numPartitions) — AQE does not coalesce a user-specified
    * repartition, so size it for the target scale. */
  def extract(turns: Dataset[Turn], cfg: Config = Config()): Dataset[TurnResult] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select(col("conv_id"), col("turn_idx"), col("text")) // prune pre-shuffle
      .repartition(cfg.numPartitions, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .as[TurnSlim]
      .mapPartitions(parsePartition(cfg) _)
  }

  /** Skew-aware path: a cheap count pre-pass finds heavy-tail conversations
    * (partial map-side aggregation — the count shuffle moves one row per
    * conversation), then ONE range exchange routes turns: every monster
    * conversation gets its own partition id at the top of the key space,
    * normal conversations hash into the remainder. `repartitionByRange` on
    * the dense integer key stays on the DataFrame plane (Tungsten UnsafeRow
    * shuffle — no Java serialization), and the within-partition sort rides
    * `sortWithinPartitions`. Honest caveats of the range exchange: Spark
    * SAMPLES the child to pick bounds (one extra evaluation of the pruned
    * projection), and sampled bounds may co-locate two adjacent monster
    * keys in one task — equal keys always stay together (correctness
    * holds), but isolation is best-effort, not identity placement. */
  def extractSkewAware(turns: Dataset[Turn], cfg: Config = Config()): Dataset[TurnResult] = {
    val spark = turns.sparkSession
    import spark.implicits._

    val monsterIds: Array[String] = turns
      .filter(col("conv_id").isNotNull) // null convs hash normally (a null map key would NPE the driver sort)
      .groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > cfg.monsterThreshold)
      .orderBy(col("n").desc, col("conv_id"))   // TakeOrderedAndProject: ≤ maxMonsters rows reach the driver
      .limit(cfg.maxMonsters)
      .select("conv_id").as[String].collect().sorted

    if (monsterIds.isEmpty) return extract(turns, cfg)

    // monster lookup via BROADCAST HASH JOIN, not a typedLit map:
    // GetMapValue walks the literal's key array per row (O(maxMonsters)
    // string compares on every input row of a 10^12-turn scan)
    val normal = cfg.numPartitions
    val total = normal + monsterIds.length
    val midx = spark.createDataFrame(
      monsterIds.zipWithIndex.toSeq).toDF("conv_id", "_midx")
    val pkey = coalesce(col("_midx") + normal,
      pmod(xxhash64(col("conv_id")), lit(normal)).cast("int"))

    turns
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .join(broadcast(midx), Seq("conv_id"), "left")
      .select(col("conv_id"), col("turn_idx"), col("text"), pkey.as("_pkey"))
      .repartitionByRange(total, col("_pkey"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .drop("_pkey")
      .as[TurnSlim]
      .mapPartitions(parsePartition(cfg) _)
  }

  /** Bucketed-layout plane: co-located, exchange-free extraction.
    *
    * `writeBucketed` lays the transcript table out as a Spark bucketed table —
    * `hash(conv_id) mod buckets` picks the file, rows sorted by
    * `(conv_id, turn_idx)` within it. The pre-write `repartition(buckets,
    * conv_id)` uses the same Murmur3 `HashPartitioning` as the bucket-file
    * assignment, so every task holds exactly one bucket and each bucket is a
    * single sorted file — the layout Spark's scan reports as both partitioned
    * AND ordered.
    *
    * `extractBucketed` then runs the FSM via a *relational* group
    * (`groupBy(conv_id).as[K,V].flatMapGroups`): the MapGroups node's
    * ClusteredDistribution(conv_id) is satisfied by the bucketed scan itself,
    * so Catalyst plans NO shuffle exchange (asserted by spec). At 100 TB this
    * removes the default path's dominant cost — moving every text byte
    * through an exchange — for any re-extraction or downstream
    * per-conversation job over the same layout. Correctness never depends on
    * the layout: over a non-bucketed table the same code simply gets a
    * planned exchange, and the in-group `sortBy(turn_idx)` (conversation-
    * sized, cheap) keeps turn order right even if the scan's file-level
    * ordering is ever dropped (multi-file buckets). */
  def writeBucketed(turns: Dataset[Turn], tableName: String, path: String,
                    buckets: Int): Unit = {
    val spark = turns.sparkSession
    require(tableName.matches("[A-Za-z0-9_]+"),
      s"tableName must be a plain identifier, got '$tableName' (it is interpolated into DDL)")
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    turns
      .repartition(buckets, col("conv_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .option("path", path)
      .saveAsTable(tableName)
  }

  def extractBucketed(spark: SparkSession, tableName: String,
                      cfg: Config = Config()): Dataset[TurnResult] = {
    import spark.implicits._
    spark.table(tableName)
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[TurnSlim]
      .groupBy(col("conv_id")).as[String, TurnSlim]
      .flatMapGroups { (cid: String, it: Iterator[TurnSlim]) =>
        val ts = it.toIndexedSeq.sortBy(_.turn_idx)
          .map(t => if (t.text == null) t.copy(text = "") else t) // null ≡ empty page
        val cleaned =
          if (cfg.stripHtml) ts.map(t => t.copy(text = Boilerplate.stripHtml(t.text)))
          else ts
        ConvParser.parse(cid, cleaned)
      }
  }

  /** Turns → per-conversation document view: every turn's text concatenated
    * in stable (turn_idx) order — the materialization that feeds document-
    * level ops (dedup, quality, chunking) from the transcript table. One
    * hash-agg; the ordered reassembly is bounded by a single conversation's
    * own turns (same memory contract as the FSM plane), never a popularity-
    * sized group. */
  def conversationDocs(turns: Dataset[Turn]): DataFrame =
    turns.toDF.groupBy(col("conv_id")).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("turn_idx"), col("text")))),
        x => x("text"))).as("doc_text"),
      count(lit(1)).as("n_turns"))

  /** Loss-mask spans: each turn's [start_off, end_off) character offsets
    * inside the `conversationDocs` concatenation, plus the loss flag
    * (assistant turns carry loss; user/tool context doesn't) — what a
    * training pipeline needs to mask non-assistant tokens after packing.
    * One cumulative-sum window over the same (conv_id, turn_idx) ordering
    * the doc view uses; null-text turns are excluded exactly as
    * `concat_ws` skips them. Offsets are pinned against the doc view by
    * ExtractionSpec (substring(doc, start, len) == turn text). */
  def lossMaskSpans(turns: Dataset[Turn]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (turn_idx, text) matches conversationDocs' array_sort struct order, so
    // duplicate turn_idx rows accumulate offsets in the SAME peer order the
    // doc view concatenates them in
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"), col("text"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns.toDF
      .filter(col("text").isNotNull)
      .withColumn("start_off",
        coalesce(sum(length(col("text")) + 1).over(w), lit(0L)))
      .select(col("conv_id"), col("turn_idx"), col("start_off"),
        (col("start_off") + length(col("text"))).as("end_off"),
        coalesce(col("role") === "assistant", lit(false)).as("loss")) // null role: not a loss turn, never a null flag
  }

  /** Batch-incremental commit: extract ONLY the newly arrived conversations
    * and delta-append their per-turn results to the snapshot table
    * (`Snapshot.append` hard-links every existing data file — metadata-only
    * reuse, no recompute and no rewrite of prior work). Conversations are
    * the unit of increment: the FSM's state never crosses a conv_id, so an
    * append-only transcript corpus (the realistic case — finished
    * conversations don't mutate) makes incremental == full recompute, which
    * ExtractionSpec asserts. Returns the committed snapshot's metrics.
    *
    * `batchTag` (a stable id of the increment, e.g. the ingest day) makes
    * retries exactly-once: a replay whose tag already committed skips both
    * the extraction job and the append — without it, a retry issued after
    * the commit landed would re-extract and append the batch twice (see
    * `Snapshot.append`'s retry contract). */
  def incrementalCommit(newTurns: Dataset[Turn], tablePath: String,
                        cfg: Config = Config(),
                        numChunks: Int = 32,
                        batchTag: String = ""): Map[String, Long] = {
    if (batchTag.nonEmpty) {
      // tag replay: honor the "returns the committed snapshot's metrics"
      // contract on THIS path too (Snapshot.write/append already do on
      // theirs) — callers must not have to distinguish 'no-op replay'
      // from 'committed with zero metrics'
      val replayed = graft.sources.Snapshot.metricsOfTag(tablePath, batchTag)
      if (replayed.isDefined) return replayed.get
    }
    val results = extractSkewAware(newTurns, cfg)
    val (observedDf, obs) = observed(results)
    graft.sources.Snapshot.append(observedDf, tablePath, "conv_id", numChunks,
      observation = Some(obs), tag = batchTag)
  }

  def records(results: Dataset[TurnResult]): Dataset[RecordRow] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.flatMap { tr =>
      tr.record.map(r => RecordRow(tr.conv_id, tr.turn_idx, r.rule,
        r.profile_applicability, r.description, r.rationale, r.audit,
        r.remediation, r.default_value, r.cis_controls))
    }
  }

  /** Long-form span table (conv_id, turn_idx, label, start, end, text) —
    * the per-turn span-equality surface. */
  def spansLong(results: Dataset[TurnResult]): DataFrame =
    results.select(col("conv_id"), col("turn_idx"), explode(col("spans")).as("s"))
      .select(col("conv_id"), col("turn_idx"), col("s.label"), col("s.start"),
        col("s.end"), col("s.text"))

  /** Attach named extraction metrics (A2 counters as `observe` metrics —
    * collected by the snapshot writer into the manifest). The returned
    * Observation resolves once the first action on the frame completes. */
  def observed(results: Dataset[TurnResult]): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("extraction")
    val df = results.toDF.observe(obs,
      count(lit(1)).as("turns"),
      sum(when(col("valid"), 0L).otherwise(1L)).as("invalid_turns"),
      sum(when(col("record").isNotNull, 1L).otherwise(0L)).as("records"),
      sum(size(col("spans"))).as("spans"))
    (df, obs)
  }
}
