package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.TextHashExpressions.{minhash_bands, shingle_hashes, simhash64, sorted_jaccard, token_hashes}
import graft.expressions.VectorExpressions.{float_cosine, hyperplane_bucket}
import graft.functions.TextFunctions.hamming64

/** Deduplication family for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design principles (each operator follows all three):
  *  - Candidate generation is an EQUI-join on a blocking key (band / bucket /
  *    pigeonhole segment) — shuffle-hash/SMJ, never a cross join.
  *  - The candidate join moves (id, key) pairs ONLY; payloads (token-hash
  *    arrays, embeddings) are joined back onto the much smaller verified
  *    candidate set, so the band shuffle never carries document bodies.
  *  - The per-pair verify kernel is a compiled merge/bit loop over
  *    pre-computed per-row signatures (`token_hashes`, `simhash64`), computed
  *    once on the scan side — per-pair cost is O(|tokens|) long compares with
  *    zero allocation.
  *
  * Recall contracts: `simHashNearDup` is EXACT (pigeonhole bands guarantee
  * any pair within maxHamming shares ≥1 band); `ngramJaccardPairs` is exact
  * within its blocks; MinHash and hyperplane LSH are probabilistic and their
  * recall is measured against the exact baselines in DedupRecallSpec. */
object Dedup {

  // long-lived persists (minHashLsh / ngramJaccardPairs signature frames):
  // their results are returned LAZY, so the operator cannot unpersist
  // before the caller consumes them — registered here instead, released
  // deterministically via releaseCaches(). Weak-value-free by design:
  // entries live until released, matching the documented LRU stance.
  private val liveCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def registerCache(df: DataFrame): DataFrame = {
    liveCaches.add(df)
    df
  }

  /** Release every signature-frame cache a minHashLsh/ngramJaccardPairs
    * call has pinned in this session. Call AFTER fully consuming their
    * results (the frames back lazy plans; an early release just recomputes
    * the kernels on the next action — correct, only slower). Batch drivers
    * that loop over corpora should call this per iteration so disk-backed
    * blocks never outlive their corpus (plain LRU would otherwise let them
    * pressure spark.local.dir until eviction). */
  def releaseCaches(): Unit = {
    var df = liveCaches.poll()
    while (df != null) { df.unpersist(blocking = false); df = liveCaches.poll() }
  }

  /** Exact dedup: canonical representative per identical text (deterministic:
    * min id), plus group size. One hash-agg shuffle. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental exact dedup against a `graft.sources.Snapshot` table: the
    * daily-batch shape of [[exact]] at 10^12-turn scale, where re-deduping
    * the whole historical corpus per batch is not an option. The new batch
    * is (1) self-deduped (keep min id per content fingerprint), (2)
    * anti-joined on fingerprint against the table's CURRENT snapshot —
    * only the 8-byte `fp` column of history is read (column pruning) and
    * only fingerprints shuffle, never historical text — and (3) appended
    * as ONE tagged delta snapshot (parent data files hard-linked,
    * `StreamingSnapshot`'s idempotent-commit contract: a replayed batch
    * tag is a no-op). First batch bootstraps the table.
    *
    * Collision note: dedup by 64-bit fingerprint equates texts whose
    * fingerprints collide (~N²/2^65 false merges); the reference's exact
    * plane is available by verifying `textCol` equality on the (tiny)
    * fp-match set. Returns the number of new rows committed. */
  def incrementalExact(newBatch: DataFrame, tablePath: String,
                       idCol: String, textCol: String,
                       batchTag: String, numChunks: Int = 8): Long = {
    import graft.expressions.TextHashExpressions
    if (graft.sources.Snapshot.committedTags(tablePath).contains(batchTag))
      return 0L
    val withFp = newBatch.withColumn("fp",
      TextHashExpressions.fingerprint64(col(textCol)))
    val selfDeduped = withFp
      .groupBy(col("fp"))
      .agg(min(struct(col(idCol), col(textCol))).as("r"))
      .select(col("r").getField(idCol).as(idCol),
        col("r").getField(textCol).as(textCol), col("fp"))
    // bootstrap = nothing has ever COMMITTED (manifest scan, which repairs
    // a wedged CURRENT): testing the CURRENT file would mistake a table
    // killed between manifest write and pointer swap for an empty one,
    // skipping the anti-join and losing the batch inside append
    val bootstrap =
      graft.sources.Snapshot.committedVersion(tablePath).isEmpty
    val fresh =
      if (bootstrap) selfDeduped
      else {
        val seen = graft.sources.Snapshot
          .read(newBatch.sparkSession, tablePath).select(col("fp"))
        selfDeduped.join(seen, Seq("fp"), "left_anti")
      }
    // persist: count() and the append would otherwise run the anti-join
    // twice (at scale that is two passes over the batch)
    val cached = fresh.persist()
    try {
      val n = cached.count()
      // commit the tag EVEN when the batch contributed nothing: the no-op
      // delta (parent files hard-linked, zero new rows) is what makes a
      // replay of an all-duplicate batch skip the anti-join next time, and
      // it leaves an audit row that day-N was processed
      graft.sources.Snapshot.append(cached, tablePath, chunkKey = idCol,
        numChunks = numChunks, tag = batchTag)
      n
    } finally { cached.unpersist(); () }
  }

  /** Near-dup candidates via MinHash+LSH: k-shingle → signature → band keys →
    * self-equi-join per band on (id, band) ONLY → shingle-hash arrays joined
    * back onto the candidate set → exact k-shingle-set Jaccard verify (the
    * SAME measure the signature approximates, so the banding S-curve applies
    * directly: with r=2 rows/band, b=8 bands the 50%-candidate point sits at
    * j=(1/b)^(1/r)≈0.35; measured recall in DedupRecallSpec).
    * Emits (left_id, right_id, jaccard) with left<right, jaccard ≥ threshold. */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleK: Int = 3, numHashes: Int = 16, bands: Int = 8,
                 threshold: Double = 0.6): DataFrame = {
    // persist: the signature frame feeds the band join AND both verify
    // join-backs — unmarked, the shingle/minhash kernels re-run in three
    // scans of the input (the frame is (id, hashes) only, never text).
    // Registered for deterministic release via releaseCaches(); until
    // then LRU eviction bounds residency.
    val base = registerCache(df.select(col(idCol).as("id"),
      shingle_hashes(col(textCol), shingleK).as("th"),
      minhash_bands(col(textCol), shingleK, numHashes, bands).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val banded = base.select(col("id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"))
      .dropDuplicates("left_id", "right_id")
    val th = base.select(col("id"), col("th"))
    candidates
      .join(th.select(col("id").as("left_id"), col("th").as("lth")), "left_id")
      .join(th.select(col("id").as("right_id"), col("th").as("rth")), "right_id")
      .select(col("left_id"), col("right_id"),
        sorted_jaccard(col("lth"), col("rth")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental NEAR-dup against history: the [[minHashLsh]] analogue of
    * [[incrementalExact]]. A signature table (one `graft.sources.Snapshot`
    * row per kept doc: id, MinHash band keys, sorted shingle hashes)
    * accumulates across batches; each new batch
    *  1. computes its signatures ONCE (the same codegen kernels as
    *     [[minHashLsh]]),
    *  2. band-joins against history (history moves only (id, band) pairs
    *     + the candidate hash arrays — never text), verifies exact
    *     shingle-set Jaccard, and reports (new_id, dup_of, jaccard) pairs
    *     (in-batch near-dups are minHashLsh-on-the-batch's concern: here
    *     both members enter history),
    *  3. appends the NON-duplicate new docs' signatures as one tagged
    *     delta snapshot (replayed batch tags are no-ops, returning the
    *     empty pair set conservatively).
    *
    * Scale note: this reads the full history signature table per batch;
    * on a real lake the exploded (band_key → id) plane would be BUCKETED
    * by band key (the `Extraction.writeBucketed` layout) so a batch joins
    * only its own band buckets. Text never enters the table: storage is
    * O(numHashes + shingles) longs per kept doc. Returns the pair
    * DataFrame (new_id, dup_of, jaccard ≥ threshold). */
  def incrementalNearDup(newBatch: DataFrame, tablePath: String,
                         idCol: String, textCol: String, batchTag: String,
                         shingleK: Int = 3, numHashes: Int = 16,
                         bands: Int = 8, threshold: Double = 0.6,
                         numChunks: Int = 8): DataFrame = {
    import graft.sources.Snapshot
    val spark = newBatch.sparkSession
    val sigs = newBatch.select(col(idCol).cast("long").as("id"),
      shingle_hashes(col(textCol), shingleK).as("th"),
      minhash_bands(col(textCol), shingleK, numHashes, bands).as("bands"))
    if (Snapshot.committedTags(tablePath).contains(batchTag))
      return sigs.select(col("id").as("new_id"), col("id").as("dup_of"),
        lit(0.0).as("jaccard")).limit(0)

    // committed-manifest bootstrap test, same rationale as incrementalExact
    val bootstrap = Snapshot.committedVersion(tablePath).isEmpty
    val cached = sigs.persist()
    try {
      val dups =
        if (bootstrap) cached.select(col("id").as("new_id"),
          col("id").as("dup_of"), lit(0.0).as("jaccard")).limit(0)
        else {
          val hist = Snapshot.read(spark, tablePath)
          val nb = cached.select(col("id"),
            posexplode(col("bands")).as(Seq("band_idx", "band_key")))
          val hb = hist.select(col("id").as("hid"),
            posexplode(col("bands")).as(Seq("band_idx", "band_key")))
          val cand = nb.join(hb, Seq("band_idx", "band_key"))
            .select(col("id").as("new_id"), col("hid").as("dup_of"))
            .dropDuplicates("new_id", "dup_of")
          cand
            .join(cached.select(col("id").as("new_id"), col("th").as("lth")), "new_id")
            .join(hist.select(col("id").as("dup_of"), col("th").as("rth")), "dup_of")
            .select(col("new_id"), col("dup_of"),
              sorted_jaccard(col("lth"), col("rth")).as("jaccard"))
            .filter(col("jaccard") >= threshold)
        }
      // eager localCheckpoint, not persist(): the pair set is needed twice
      // (the signature-append anti-join below + the caller's read) but a
      // persist() pins it in the CacheManager until an unpersist nobody is
      // contracted to call — one leaked cache entry per ingested batch on a
      // long-running driver. The checkpointed blocks are reclaimed by the
      // ContextCleaner once the caller drops the returned frame.
      val dupsOut = dups.localCheckpoint()
      val fresh = cached.join(
        dupsOut.select(col("new_id").as("id")).distinct(), Seq("id"), "left_anti")
      Snapshot.append(fresh, tablePath, chunkKey = "id",
        numChunks = numChunks, tag = batchTag)
      dupsOut
    } finally { cached.unpersist(); () }
  }

  /** SimHash near-dup with EXACT recall: the 64-bit signature is split into
    * `maxHamming + 1` pigeonhole bands — a pair with Hamming distance ≤
    * maxHamming differs in at most maxHamming bands, so at least one band
    * matches exactly and the pair is always a candidate (Manku et al.,
    * WWW'07). Verified by full Hamming distance. */
  def simHashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame =
    hammingNearDup(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim")),
      maxHamming)

  /** Pigeonhole Hamming self-join over any 64-bit signature column
    * (`sigs`: (id, sim)) — shared by SimHash text near-dup and image
    * aHash near-dup. Exact recall within maxHamming. */
  def hammingNearDup(sigs: DataFrame, maxHamming: Int): DataFrame = {
    // 64 bands of width 1 is the maximum meaningful split: beyond it the
    // band width collapses to 0 and every row shares band key 0 — the
    // all-pairs cross product this operator exists to avoid
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val bands = maxHamming + 1
    val width = 64 / bands // last band also takes the remainder bits
    val bandStructs = array((0 until bands).map { b =>
      val shifted = shiftrightunsigned(col("sim"), b * width)
      val key = if (b == bands - 1) shifted
        else shifted.bitwiseAND(lit((1L << width) - 1))
      struct(lit(b).as("band_idx"), key.as("band_key"))
    }: _*)
    val banded = sigs
      .select(col("id"), col("sim"), explode(bandStructs).as("bk"))
      .select(col("id"), col("sim"),
        col("bk.band_idx").as("band_idx"), col("bk.band_key").as("band_key"))
    banded.as("l").join(banded.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"),
        col("l.sim").as("lsim"), col("r.sim").as("rsim"))
      .dropDuplicates("left_id", "right_id")
      .withColumn("hamming", hamming64(col("lsim"), col("rsim")))
      .filter(col("hamming") <= maxHamming)
      .select(col("left_id"), col("right_id"), col("hamming"))
  }

  /** n-gram Jaccard pair scores within explicit blocks (`blockCol`) — the
    * EXACT set-similarity join (same output as brute-force all-pairs, pair
    * for pair, over docs with a NON-EMPTY token set — docs whose text
    * yields zero token hashes have no shingles to block on and are
    * excluded, the standard LSH/PPJoin convention; note J(∅,∅) is
    * definitionally 1.0, so a brute force that includes them differs
    * exactly on empty-empty pairs), shaped as a PPJoin-style
    * prefix-filtered candidate join
    * (Xiao et al., WWW'08) instead of within-block all-pairs (the round-3
    * scale defect: blocks grow with the corpus, so block all-pairs is
    * O(n²/k) comparisons at 100×).
    *
    * Prefix filter: with token-hash sets in one global canonical order
    * (ascending 64-bit hash — `token_hashes` output is sorted distinct),
    * J(x,y) ≥ t implies x and y share a token inside BOTH prefixes of
    * length |s| − ⌈t·|s|⌉ + 1 (the first common token in canonical order
    * is preceded only by non-shared tokens, of which each side has at most
    * ⌊(1−t)·|s|⌋). Candidates are therefore generated by an equi-join on
    * (block, prefix-token) — shuffle keys only, the full signatures rejoin
    * by id afterwards — then length-ratio-pruned (t·|y| ≤ |x| ≤ |y|/t),
    * deduped, and verified by the same codegen [[sorted_jaccard]] merge
    * loop as before. The prefix length uses floor (≥ the tight bound, one
    * longer when t·|s| is integral), so double rounding can only ADD
    * candidates — exactness never depends on float luck.
    *
    * Prefix ORDER is ascending global document frequency (rare-first, hash
    * tiebreak) — the canonical PPJoin ordering, and the skew guard: the
    * prefix-filter theorem holds for ANY one global total order, so with
    * rare tokens first a boilerplate token shared by m rows sorts to the
    * END of every set and enters a prefix only when a row is too short to
    * avoid it — the m² hot-token candidate blowup of a frequency-agnostic
    * order never forms, and the final pair set is IDENTICAL (the verify
    * filter is unchanged; candidates are a superset of true pairs under
    * every valid order). The frequency key is a count-min ESTIMATE from a
    * ≤ depth·width broadcast sketch (one constant-width aggregation +
    * codegen per-row prefix selection, [[graft.expressions.TextHashExpressions.CmsRankPrefix]])
    * rather than exact df — a CMS only overestimates, so hot stays last,
    * and any deterministic (est, tok) key is a valid total order; this
    * removes the exact-df shape's two corpus-token-linear shuffles
    * (explode → df agg → join → per-row window).
    *
    * Scale shape: candidate volume tracks true near-duplicate density plus
    * rare-prefix-token collisions, not block size²; per-row work is one
    * scan-side signature + a bounded prefix explode. Residual skew
    * ceiling: m rows sharing a RARE prefix token still yield m²
    * candidates, but rare-first ordering makes such a token's df small by
    * construction — m is bounded by the df of a token that survived into
    * prefixes; pathological corpora should raise the threshold or
    * pre-dedup exact copies first ([[exact]]). */
  /* NOTE — eager builder: unlike most operators, CALLING this runs one
   * Spark job immediately (the CMS token-frequency sketch collect inside
   * ppjoinPrefixes — the heavyHitters state-rides-the-plan pattern), so
   * constructing the returned DataFrame is not free even if it is never
   * executed. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    // persist: (id, blk, hashes) feeds prefix candidates and both verify
    // join-backs — see minHashLsh's matching note (released by
    // releaseCaches())
    val s = registerCache(df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      token_hashes(col(textCol)).as("th"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tppm = math.round(threshold * 1000000L)
    val cand = ppjoinCandidates(ppjoinPrefixes(s, tppm), tppm)
    cand
      .join(s.select(col("id").as("left_id"), col("th").as("lth")), Seq("left_id"))
      .join(s.select(col("id").as("right_id"), col("th").as("rth")), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        sorted_jaccard(col("lth"), col("rth")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** PPJoin prefix frame (id, blk, sz, tok) over a signature frame
    * (id, blk, th:sorted-distinct hashes).
    *
    * Prefix length: the TIGHT bound is sz − ⌈t·sz⌉ + 1 — any shorter drops
    * pairs sitting exactly at J == t (and at t = 1.0 a shorter prefix is
    * EMPTY, missing even identical docs). ceil is computed in exact ppm
    * integer arithmetic: a double ceil(t·sz) can round UP on float error
    * (0.6·5 = 3.0000000000000004 → 4), silently shortening the prefix
    * below the bound.
    *
    * `rareFirst = true` (the operator's setting) selects each row's prefix
    * in ascending global-df order — the skew guard; `false` keeps the raw
    * ascending-hash order (the pre-guard shape, exact but hot-token-m²) so
    * the adversarial spec can contrast candidate volumes. */
  private[graft] def ppjoinPrefixes(s: DataFrame, tppm: Long,
                                    rareFirst: Boolean = true): DataFrame = {
    val sized = s.withColumn("sz", size(col("th")))
    val plen = (col("sz") - floor((lit(tppm) * col("sz") + 999999L) / 1000000L) + 1)
      .cast("int")
    if (!rareFirst)
      sized.select(col("id"), col("blk"), col("sz"),
        explode(slice(col("th"), lit(1), plen)).as("tok"))
    else {
      // global token-frequency order via a count-min sketch: (est(tok), tok)
      // is one TOTAL order shared by every row — the prefix theorem's only
      // requirement — with rare tokens first (see ngramJaccardPairs
      // scaladoc). The sketch state is ≤ depth·width longs built by ONE
      // constant-width aggregation (cmsSketch's partial agg collapses each
      // task before the exchange) and rides the serialized plan into a
      // codegen'd per-row prefix selection — replacing the previous exact-df
      // shape (full corpus-token explode → df agg → token join → per-row
      // window rank: two shuffles LINEAR in corpus tokens, the dominant
      // preprocessing cost at scale). A CMS only OVERestimates, so the hot
      // boilerplate token still sorts last; collisions reorder rare-vs-rare
      // only, and the final pair set is exact under any valid order (the
      // verify filter is unchanged; the skew spec pins candidate volume).
      val depth = 4
      val width = 1024
      val state = graft.operators.TrainingData.cmsState(
        s.select(explode(col("th")).as("tok")), col("tok"), depth, width)
      sized.select(col("id"), col("blk"), col("sz"),
        explode(graft.expressions.TextHashExpressions.cms_rank_prefix(
          col("th"), tppm, state, depth, width)).as("tok"))
    }
  }

  /** The PPJoin candidate equi-join over an exploded prefix frame
    * (id, blk, sz, tok) — split out so the skew-guard spec can count
    * candidates directly (a hot-token blowup is invisible in the final
    * pair set, which stays exact under any valid prefix order). */
  private[graft] def ppjoinCandidates(pref: DataFrame, tppm: Long): DataFrame =
    pref.as("l").join(pref.as("r"),
        col("l.blk") === col("r.blk") && col("l.tok") === col("r.tok") &&
          col("l.id") < col("r.id") &&
          // length-ratio prune: J ≥ t forces t·max(|x|,|y|) ≤ min(|x|,|y|)
          // (ppm integers — a float product could exclude boundary pairs)
          col("l.sz") * 1000000L >= lit(tppm) * col("r.sz") &&
          col("r.sz") * 1000000L >= lit(tppm) * col("l.sz"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"))
      .distinct()

  /** Cross-document repeated-line removal (the CCNet/RefinedWeb boilerplate
    * pass): a line whose trimmed form appears in ≥ `minDocs` DISTINCT
    * documents is dropped from every document; blank lines are kept. The
    * trim is whitespace-aware (space, tab, CR, VT, FF): on CRLF corpora a
    * split("\n") leaves "\r" on every line, and an ASCII-space-only trim
    * would count blank lines as a hot line (stripping every paragraph
    * break) while the same boilerplate in LF and CRLF docs counted as two
    * different norms. Three
    * key-partitioned shuffles — line-hash agg, line-hash join, doc
    * reassembly — and the only per-group materialization is one document's
    * own lines, so it scales with corpus size, not with line popularity.
    * Emits every input document: (id, cleaned, dropped). */
  def repeatedLines(df: DataFrame, textCol: String, idCol: String,
                    minDocs: Int = 2): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("li", "line")))
      .withColumn("norm", trim(col("line"), " \t\r\u000B\f"))
    val hot = lines.filter(col("norm") =!= "")
      .groupBy(col("norm")).agg(countDistinct(col("id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("norm"), lit(true).as("hot"))
    val marked = lines.join(hot, Seq("norm"), "left")
    val rebuilt = marked.groupBy(col("id")).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(when(col("hot").isNull,
          struct(col("li"), col("line"))))),
        x => x("line"))).as("cleaned"),
      sum(when(col("hot").isNotNull, 1L).otherwise(0L)).as("dropped"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .na.fill("", Seq("cleaned")).na.fill(0L, Seq("dropped"))
  }

  /** Cross-corpus duplicated-substring spans (exact substring dedup, the
    * suffix-array pass of large-scale LM pipelines): a character position is
    * covered iff the k-gram starting there occurs more than once in the
    * whole corpus (any document, any position) — which holds exactly for the
    * characters inside some duplicated substring of length ≥ k. Covered
    * positions merge into maximal [start, end) spans per document via one
    * gaps-and-islands window pass.
    *
    * Distributed shape: gram explosion → hash-agg for multi-occurrence keys
    * → equi-join back → window merge. Everything key-partitioned — no cross
    * join, no driver state. With `hashGrams` the gram pass is the codegen'd
    * `char_gram_hashes` kernel — ONE pass per document emitting (hash, pos),
    * ~20 bytes/row through the shuffle regardless of k, no per-position
    * substring seeks (a per-position `substr` plan is O(len²) per document:
    * each call re-seeks its char offset). The raw-gram mode exists for the
    * cross-engine oracle (identical output barring 64-bit collisions,
    * asserted by spec and by the oracle itself). */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 32, hashGrams: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed =
      if (hashGrams)
        df.filter(length(col(textCol)) >= k)
          .select(col(idCol).as("id"),
            posexplode(graft.expressions.TextHashExpressions
              .char_gram_hashes(col(textCol), k)).as(Seq("pos", "key")))
      else {
        val base = df.filter(length(col(textCol)) >= k)
          .select(col(idCol).as("id"), col(textCol).as("t"))
          .select(col("id"), col("t"),
            explode(sequence(lit(0), length(col("t")) - k)).as("pos"))
        base.select(col("id"), col("pos"),
          col("t").substr(col("pos") + 1, lit(k)).as("key"))
      }
    // ONE exchange: count-over-window on the gram key instead of
    // groupBy+self-join, which would shuffle the exploded gram set twice
    // AND recompute the explosion for each branch. WindowExec spills its
    // per-key buffer, so a pathologically hot gram degrades to disk, not OOM.
    val wk = Window.partitionBy("key")
    val cov = keyed.withColumn("nk", count(lit(1)).over(wk))
      .filter(col("nk") > 1).select("id", "pos")
    val w = Window.partitionBy("id").orderBy("pos")
    val brk = when(col("pos") - lag("pos", 1).over(w) > k, 1).otherwise(0)
    cov.withColumn("island", sum(brk).over(w))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("start"), (max(col("pos")) + k).as("end"))
      .select(col("id"), col("start"), col("end"))
  }

  /** Apply side of [[duplicateSpans]]: rebuild each document with its
    * duplicated spans cut out. Fully relational — the complement segments
    * come from one lag-window over the (small) span set plus a per-doc tail,
    * segments slice the text after an id equi-join, and the ordered
    * reassembly is a doc-bounded `collect_list` (same memory contract as
    * `repeatedLines`: one document's own pieces, never a popularity-sized
    * group). Emits every input doc: (id, cleaned, removed). */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 32, hashGrams: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spans feeds BOTH the mids and tails branches, but the expensive gram
    // exchange is deduplicated by ReuseExchange — no persist needed (and a
    // measured persist was a net loss: it forces an extra materialize+read).
    val spans = duplicateSpans(df, idCol, textCol, k, hashGrams)
    val w = Window.partitionBy("id").orderBy("start")
    val mids = spans.select(col("id"),
      coalesce(lag(col("end"), 1).over(w), lit(0)).as("seg_start"),
      col("start").as("seg_end"))
    val tails = spans.groupBy("id").agg(max(col("end")).as("seg_start"))
      .withColumn("seg_end", lit(Int.MaxValue))
    val docs = df.select(col(idCol).as("id"), col(textCol).as("t"))
    val segs = mids.unionByName(tails)
      .filter(col("seg_end") > col("seg_start"))
      .join(docs, "id")
      .withColumn("seg", col("t").substr(col("seg_start") + 1,
        greatest(lit(0), least(col("seg_end"), length(col("t"))) - col("seg_start"))))
    val rebuilt = segs.groupBy("id").agg(
      concat_ws("", transform(
        array_sort(collect_list(struct(col("seg_start"), col("seg")))),
        x => x("seg"))).as("cleaned"))
    docs.join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("cleaned"), col("t")).as("cleaned"),
        (length(col("t")) - length(coalesce(col("cleaned"), col("t"))))
          .cast("long").as("removed"))
  }

  /** Embedding-cosine near-dup: multi-table hyperplane-LSH blocking (a pair
    * is a candidate if it shares a bucket in ANY of `tables` independent
    * hash tables — OR-amplification recovers the recall a single table loses
    * at bucket boundaries) + exact cosine verify on vectors joined back onto
    * the candidate set. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String, dim: Int,
                       bits: Int = 8, tables: Int = 4,
                       threshold: Double = 0.95): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val tableStructs = array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        hyperplane_bucket(col("v"), bits, dim, seed = 42L + 1000L * t).as("bucket"))
    }: _*)
    val bucketed = base
      .select(col("id"), explode(tableStructs).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val candidates = bucketed.as("l").join(bucketed.as("r"),
        col("l.tbl") === col("r.tbl") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"))
      .dropDuplicates("left_id", "right_id")
    candidates
      .join(base.select(col("id").as("left_id"), col("v").as("lv")), "left_id")
      .join(base.select(col("id").as("right_id"), col("v").as("rv")), "right_id")
      .withColumn("cos", float_cosine(col("lv"), col("rv")))
      .filter(col("cos") >= threshold)
      .select(col("left_id"), col("right_id"), col("cos"))
  }

  /** Conversation-level near-dup: Jaccard similarity over each
    * conversation's SET of distinct turn-text hashes — the dedup unit for
    * SFT corpora, where re-rolled conversations share most turns verbatim.
    *
    * Candidates are blocked on a SHARED EXACT TURN (equi-join on the
    * 32-hex turn hash), so only conversations with at least one identical
    * turn are ever paired — never all-pairs. The one scale hazard of that
    * blocking is a boilerplate turn shared by millions of conversations
    * (quadratic within its hash block); `dfCap` drops turn hashes whose
    * conversation-frequency exceeds it BEFORE pairing — the standard
    * stop-shingle guard — and set sizes are computed after the drop so the
    * Jaccard stays consistent. Threshold compares in exact integer
    * cross-multiplication (`inter * 10^6 >= union * thrPpm`): no float
    * boundary, bit-identical cross-engine. Only (conv_id, hash) pairs
    * shuffle — never turn text. */
  def convNearDup(turns: DataFrame, thrPpm: Long, dfCap: Int): DataFrame = {
    val th = turns.filter(col("text").isNotNull)
      .select(col("conv_id"), md5(col("text")).as("th")).distinct()
    val kept = th.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("th"))))
      .filter(col("df") <= dfCap).drop("df")
    val sizes = kept.groupBy("conv_id").agg(count(lit(1)).as("n"))
    kept.as("l")
      .join(kept.as("r"),
        col("l.th") === col("r.th") && col("l.conv_id") < col("r.conv_id"))
      .groupBy(col("l.conv_id").as("cid1"), col("r.conv_id").as("cid2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("conv_id").as("cid1"), col("n").as("n1")), "cid1")
      .join(sizes.select(col("conv_id").as("cid2"), col("n").as("n2")), "cid2")
      .filter(col("inter") * 1000000L >=
        (col("n1") + col("n2") - col("inter")) * thrPpm)
      .select(col("cid1"), col("cid2"), col("inter"), col("n1"), col("n2"))
  }

  /** Cluster assignment over a near-dup pair list — the step a dedup
    * pipeline actually needs after candidate scoring: connected components,
    * labeling every paired doc with the MIN doc id reachable through the
    * pair graph ("keep the representative, drop the rest").
    *
    * Iterative min-label propagation WITH pointer doubling (lbl <- lbl(lbl),
    * Kiveris et al., MapReduce CC): each round is one edge equi-join + one
    * min-agg + one label-lookup join over (id, label) pairs only, and label
    * chains collapse in O(log diameter) rounds; `localCheckpoint` truncates
    * the lineage so the plan does not grow with rounds. Singleton docs (no
    * pair) are not emitted; null-id edges are dropped (no identity). Works
    * for any id type (numeric or string).
    *
    * Converges to the exact fixpoint (per-row lbl-vs-prev diff checked each
    * round), so the output is deterministic and DuckDB-oracle-comparable. */
  def nearDupClusters(pairs: DataFrame, leftCol: String = "left_id",
                      rightCol: String = "right_id",
                      maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(leftCol).as("a"), col(rightCol).as("b"))
      .unionAll(pairs.select(col(rightCol).as("a"), col(leftCol).as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull) // null ids carry no identity
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    // fixpoint witness: the round's OWN previous label rides the min-agg as
    // a second aggregate (`prev` = the label of the id's own row, tagged
    // `own`; every id always has exactly one), so convergence is an EXACT
    // per-row `lbl != prev` filter over the already-checkpointed result —
    // no separate anti-join shuffle per round (r6: that join was one of
    // three actions each round of an O(log d)-round loop). Type-agnostic —
    // string ids work, unlike a decimal label sum which nulls out on
    // non-numeric ids (and NPEs outright on an EMPTY pair list, a
    // perfectly normal clean-corpus outcome). isEmpty is limit(1).
    var round = 0
    var converged = labels.isEmpty // zero pairs: already at the fixpoint
    while (!converged && round < maxRounds) {
      val prop = edges.join(labels.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), col("lbl"))
      val stepped = labels
        .select(col("id"), col("lbl"), lit(true).as("own"))
        .unionAll(prop.select(col("id"), col("lbl"), lit(false).as("own")))
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"),
          min(when(col("own"), col("lbl"))).as("prev"))
        // checkpoint BEFORE the self-join: the materialized RDD backs both
        // join sides without recompute and severs the union lineage
        .localCheckpoint()
      // pointer-doubling shortcut (Kiveris et al., "Connected Components in
      // MapReduce and Beyond"): lbl ← lbl(lbl). Every label IS a node id of
      // the same set and lbl(x) ≤ x invariantly, so the lookup only lowers
      // labels — monotone convergence to the per-component min is preserved —
      // while label chains collapse in O(log diameter) rounds instead of
      // O(diameter): the difference between ~40 and ~6 shuffle rounds on a
      // re-rolled-conversation family a few dozen hops deep. The mapping
      // side is rebuilt from the checkpointed RDD with FRESH attributes
      // (createDataFrame): a plain self-join here trips Catalyst's
      // union-constraint rewrite on the shared expression ids.
      val mapping = stepped.sparkSession
        .createDataFrame(stepped.rdd, stepped.schema)
        .select(col("id").as("m_id"), col("lbl").as("m_lbl"))
      val next = stepped
        .join(mapping, col("lbl") === col("m_id"), "left")
        // the pointer-double lookup only LOWERS labels, so the fixpoint
        // test `lbl != prev` is exact after it too
        .select(col("id"), coalesce(col("m_lbl"), col("lbl")).as("lbl"),
          col("prev"))
        .localCheckpoint()
      converged = next.filter(col("lbl") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("lbl"))
      round += 1
    }
    require(converged, s"nearDupClusters: no fixpoint after $maxRounds rounds")
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Near-dup RETENTION policy — the step that turns [[nearDupClusters]]'
    * cluster map into the deduplicated corpus: keep exactly ONE member of
    * each duplicate cluster (the argmax of `keepBy`, ties broken by lowest
    * id — e.g. keep the longest / highest-quality member, the usual
    * RefinedWeb/FineWeb policy) and every unclustered document. Emits ALL
    * ids with a `kept` verdict rather than only survivors, so the same
    * frame drives both the filtered corpus (`kept`) and removal telemetry.
    *
    * Scale shape: the window runs ONLY over clustered docs (the join with
    * `clusters` is inner) — near-dup clusters are a small fraction of a web
    * corpus, and the unclustered bulk takes the anti-join path with no
    * window at all. Windowing the full corpus instead would funnel every
    * unclustered row into one NULL-cluster partition — a single-task skew
    * bomb at 10^12 rows. Cluster sizes bound the window partitions (a
    * cluster is a connected component of the pair graph, already capped by
    * the pairing operator's blocking). */
  def keepBestPerCluster(df: DataFrame, clusters: DataFrame, idCol: String,
                         keepBy: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), keepBy.as("keep_score"))
    val cl = clusters.select(col("doc_id").as(idCol), col("cluster"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("keep_score").desc, col(idCol))
    val clustered = base.join(cl, idCol)
      .withColumn("kept", row_number().over(w) === 1)
    val singletons = base.join(cl, Seq(idCol), "left_anti")
      .withColumn("cluster",
        lit(null).cast(clustered.schema("cluster").dataType))
      .withColumn("kept", lit(true))
    clustered.select(col(idCol), col("cluster"), col("keep_score"), col("kept"))
      .unionByName(singletons.select(
        col(idCol), col("cluster"), col("keep_score"), col("kept")))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup INSIDE embedding
    * clusters. Every vector is assigned to its max-cosine centroid (the
    * IVF plane's deterministic fingerprint-ranked seeds + codegen'd
    * one-pass `CentroidArgmax` — no corpus shuffle for assignment); within
    * each cluster, any pair with cosine ≥ threshold marks the member
    * CLOSER to its centroid as the duplicate (the paper's
    * keep-low-centroid-similarity rule; ties break by id, lower kept).
    *
    * Scale shape: the per-cluster self-join is the algorithm's inherent
    * O(Σ|cluster|²) — bounded by choosing nlist ∝ corpus size so clusters
    * stay ~constant-sized; the join key is the cluster id and both
    * centroid-cosines ride the rows, so the verify needs no second
    * lookup. All cosines are ppm-floored so the dominance rule has no
    * float boundary. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, nlist: Int,
               thresholdPpm: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = SimilaritySearch.trainIvfCentroids(base, nlist, lloydIters = 0)
    val centDf = cents.zipWithIndex.toSeq.map { case (v, i) => (i, v) }
      .toDF("cluster", "centv")
    val assigned = base
      .withColumn("cluster",
        graft.expressions.VectorExpressions.centroid_argmax(col("vec"), cents))
      .join(broadcast(centDf), "cluster")
      .withColumn("ccos_ppm",
        floor(float_cosine(col("vec"), col("centv")) * 1000000L).cast("long"))
      .select(col("id"), col("vec"), col("cluster"), col("ccos_ppm"))
    val l = assigned.select(col("cluster"), col("id").as("l_id"),
      col("vec").as("l_vec"), col("ccos_ppm").as("l_ccos"))
    val r = assigned.select(col("cluster"), col("id").as("r_id"),
      col("vec").as("r_vec"), col("ccos_ppm").as("r_ccos"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("l_id") =!= col("r_id"))
      .filter(floor(float_cosine(col("l_vec"), col("r_vec")) * 1000000L)
        .cast("long") >= thresholdPpm)
      .filter(col("r_ccos") < col("l_ccos") ||
        (col("r_ccos") === col("l_ccos") && col("r_id") < col("l_id")))
      .select(col("l_id").as("id")).distinct()
    assigned
      .join(dropped.withColumn("is_dup", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("ccos_ppm"),
        coalesce(col("is_dup"), lit(0)).as("is_dup"))
  }
}
