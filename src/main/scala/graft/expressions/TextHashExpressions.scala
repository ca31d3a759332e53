package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.TextStats

/** Custom Catalyst expressions for the text-fingerprint hot paths (MinHash
  * band keys, SimHash, rolling fingerprint).
  *
  * Why custom: the pure-HOF formulation (transform/aggregate over shingle
  * arrays, see `TextFunctions`) is correct but CodegenFallback AND gets
  * duplicated by Catalyst's projection collapse — measured ~30ms/row on
  * sf0.01 documents. Each of these expressions is one compiled pass per row
  * (tokenize → shingle → hash) and participates in whole-stage codegen via a
  * static `compute` call. Semantics follow `graft.core.TextStats` exactly, so
  * the ScalaTest oracles pin them. */
object TextHashExpressions {

  /** Analysis-time input type check for the string-child kernels: without
    * this, `simhash64(42)` fails at task runtime (or in Janino) instead of
    * with a clean AnalysisException. */
  private[expressions] trait StringInput { self: UnaryExpression =>
    override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires a string argument, got ${other.catalogString}")
    }
  }

  /** Analysis-time check for array<bigint> children — anything else would be
    * read through ArrayData.getLong as silent garbage (e.g. array<int>
    * elements span half a long slot each). */
  private[expressions] trait LongArrayInput { self: UnaryExpression =>
    override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires array<bigint>, got ${other.catalogString}")
    }
  }

  /** Analysis-time check for a bigint child — the Bloom kernels read the
    * value as a raw 64-bit fingerprint; a narrower integer would silently
    * hash a different bit pattern than the [[Fingerprint]] chain emits. */
  private[expressions] trait LongInput { self: UnaryExpression =>
    override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires a bigint argument, got ${other.catalogString}")
    }
  }

  /** text → array<long> of LSH band keys (MinHash signature banded+hashed). */
  case class MinHashBands(child: Expression, shingleK: Int, numHashes: Int, bands: Int)
      extends UnaryExpression with StringInput {
    require(shingleK >= 1, s"shingleK must be >= 1, got $shingleK")
    require(numHashes >= 1 && bands >= 1,
      s"numHashes/bands must be >= 1, got $numHashes/$bands")
    // non-divisible bands would silently ignore the numHashes % bands
    // trailing signature rows (skewing the S-curve); bands > numHashes
    // would give rowsPerBand = 0 — every doc the same constant band keys
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(MinHashBands.compute(
        v.asInstanceOf[UTF8String].toString, shingleK, numHashes, bands))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.minhashBands(" +
          s"$v.toString(), $shingleK, $numHashes, $bands));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object MinHashBands {
    def compute(text: String, k: Int, numHashes: Int, bands: Int): Array[Long] = {
      val sig = TextStats.minHash(TextStats.shingles(text, k), numHashes)
      val rowsPerBand = numHashes / bands
      Array.tabulate(bands) { b =>
        var h = 0xCBF29CE484222325L ^ b.toLong
        var i = b * rowsPerBand
        val end = i + rowsPerBand
        while (i < end) { h = TextStats.mix64(h ^ sig(i)); i += 1 }
        h
      }
    }
  }

  /** text → 64-bit SimHash over whitespace tokens (lowercased). */
  case class SimHash(child: Expression) extends UnaryExpression with StringInput {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      SimHash.compute(v.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.Kernels.simhash($v.toString());")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object SimHash {
    def compute(text: String): Long =
      TextStats.simHash(TextStats.wsTokens(
        text.toLowerCase(java.util.Locale.ROOT))) // JVM-locale-independent
  }

  /** text → [dup2gram_ppm, dup3gram_ppm, dupline_char_ppm] in ONE compiled
    * pass (TextStats.repetitionStats; the HOF column trees in TextFunctions
    * are CodegenFallback with per-element re-evaluation — 40s → sub-second
    * for the sf0.1 repetition sweep). */
  case class RepetitionStats(child: Expression) extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.repetitionStats(
        v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.repetitionStats($v.toString()));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → 64-bit rolling document fingerprint (TextStats.fingerprint). */
  case class Fingerprint(child: Expression) extends UnaryExpression with StringInput {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextStats.fingerprint(v.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.core.TextStats.fingerprint($v.toString());")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → sorted distinct array<long> of 64-bit word k-shingle hashes
    * (TextStats.shingleHashes; k=1 ≡ the token set) — computed ONCE per row
    * on the scan side of the candidate join so the per-pair similarity work
    * is a plain merge loop. */
  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.shingleHashes(v.asInstanceOf[UTF8String].toString, k))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.shingleHashes($v.toString(), $k));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-position k-char-gram hashes (ordered, NOT deduped — index i is the
    * gram starting at code point i), one pass per row. The scan-side kernel
    * of substring dedup: emits 8 bytes per position instead of a k-char
    * substring, and avoids per-position substring seeks. */
  case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.charGramHashes(v.asInstanceOf[UTF8String].toString, k))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.charGramHashes($v.toString(), $k));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → [n_codepoints, quantized entropy sum] in one compiled pass
    * (TextStats.charEntropyTerms) — the per-row histogram lives entirely
    * inside the kernel, so no explode/groupBy shuffle per (doc, char). */
  case class CharEntropy(child: Expression) extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.charEntropyTerms(
        v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.charEntropyTerms($v.toString()));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → array<long> of hashed-bigram feature buckets
    * (TextStats.bigramBuckets) — the DSIR feature extractor as one compiled
    * pass. */
  case class BigramBuckets(child: Expression, numBuckets: Int)
      extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.bigramBuckets(
        v.asInstanceOf[UTF8String].toString, numBuckets))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.bigramBuckets($v.toString(), $numBuckets));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → ordered conditional-bigram LM keys (TextStats.bigramPairKeys)
    * in one compiled pass — the map side of the CCNet-style perplexity
    * filter: token buckets u,v packed as u*V+v per adjacent pair, document
    * order preserved (unlike the sorted-set ShingleHashes). */
  case class BigramPairKeys(child: Expression, numBuckets: Int)
      extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.bigramPairKeys(
        v.asInstanceOf[UTF8String].toString, numBuckets))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.bigramPairKeys($v.toString(), $numBuckets));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** value-string → [hll bucket, hll rank] (TextStats.hllBucketRank) in one
    * compiled pass — the map side of the approx-distinct sketch; the whole
    * sketch is then one 2^p-row hash aggregation. */
  case class HllBucketRank(child: Expression, p: Int) extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.hllBucketRank(
        v.asInstanceOf[UTF8String].toString, p))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.hllBucketRank($v.toString(), $p));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** value-string → [depth] count-min-sketch buckets (TextStats.cmsBuckets)
    * in one compiled pass — the map side of the CMS frequency sketch; the
    * whole sketch is then one depth×width-row hash aggregation. */
  case class CmsBuckets(child: Expression, depth: Int, width: Int)
      extends UnaryExpression with StringInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.cmsBuckets(
        v.asInstanceOf[UTF8String].toString, depth, width))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.cmsBuckets($v.toString(), $depth, $width));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** value-string → CMS point estimate against a PLAN-EMBEDDED sketch state
    * (≤ depth×width longs, row-major — constant-size whatever the corpus,
    * shipped to executors with the serialized plan like a broadcast hint).
    * This is the map-side gate of the sketch-gated heavy-hitter pass: only
    * tokens whose estimate clears the threshold reach the exact-count
    * shuffle, and the estimate is an upper bound, so the gate never drops a
    * true heavy hitter. */
  // state is a Seq (not Array) so case-class equality is STRUCTURAL: two
  // expressions built from the same collected sketch compare semanticEquals
  // and canonicalize together (subexpression elimination, cached-plan reuse);
  // an Array field would compare by reference and always miss.
  case class CmsEstimate(child: Expression, state: Seq[Long],
                         depth: Int, width: Int)
      extends UnaryExpression with StringInput {
    require(state.length == depth * width, "cms state shape mismatch")
    @transient private lazy val stateArr: Array[Long] = state.toArray
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextStats.cmsEstimateFromState(
        v.asInstanceOf[UTF8String].toString, stateArr, depth, width)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsState", stateArr, "long[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.core.TextStats.cmsEstimateFromState(" +
          s"$v.toString(), $ref, $depth, $width);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit fingerprint → array<long> of its k Bloom bit positions
    * ([[graft.core.TextStats.bloomPositions]]) — the BUILD-side kernel of
    * the Bloom sketch: positions explode into rows that partial-aggregate
    * to a ≤ mBits-bit word table, so the exchange is constant-width no
    * matter how large the inserted set is. */
  case class BloomPositions(child: Expression, mBits: Int, k: Int)
      extends UnaryExpression with LongInput {
    BloomChecks.validate(prettyName, mBits, k)
    override def prettyName: String = "bloom_positions"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(TextStats.bloomPositions(v.asInstanceOf[Long], mBits, k))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.core.TextStats.bloomPositions($v, $mBits, $k));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit fingerprint → membership in a word-packed Bloom bit array that
    * rides the serialized plan (the [[CmsEstimate]] state-rides-the-plan
    * pattern): true iff all k probe bits are set. One codegen'd k-probe per
    * row, no join — the PROBE-side kernel of Bloom-gated decontamination. */
  case class BloomContains(child: Expression, state: Seq[Long], mBits: Int, k: Int)
      extends UnaryExpression with LongInput {
    BloomChecks.validate(prettyName, mBits, k)
    require(state.length == (mBits >>> 6),
      s"bloom state has ${state.length} words, mBits=$mBits needs ${mBits >>> 6}")
    @transient private lazy val stateArr: Array[Long] = state.toArray
    override def prettyName: String = "bloom_contains"
    override def dataType: DataType = BooleanType
    override def nullSafeEval(v: Any): Any =
      TextStats.bloomContains(v.asInstanceOf[Long], stateArr, mBits, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomState", stateArr, "long[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.core.TextStats.bloomContains($v, $ref, $mBits, $k);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private[expressions] object BloomChecks {
    /** mBits a power of two in [64, 2^30]: ≥64 so the word table is
      * non-empty, ≤2^30 so the probe array stays a sane broadcast (128 MB
      * ceiling), power of two so JVM `&` and SQL unsigned `%` coincide.
      * k ≤ 64 ≤ mBits keeps the distinct-positions guarantee (odd step,
      * see [[graft.core.TextStats.bloomPositions]]). */
    def validate(name: String, mBits: Int, k: Int): Unit = {
      require(mBits >= 64 && mBits <= (1 << 30) && (mBits & (mBits - 1)) == 0,
        s"$name mBits must be a power of two in [64, 2^30], got $mBits")
      require(k >= 1 && k <= 64, s"$name k must be in [1, 64], got $k")
    }
  }

  /** sorted-distinct token-hash array → the PPJoin PREFIX under the
    * ascending (CMS-estimated document frequency, token) order, one codegen
    * pass per row against a broadcast ≤ depth×width sketch state (the
    * [[graft.operators.TrainingData.heavyHitters]] state-rides-the-plan
    * pattern). Prefix length replicates `ppjoinPrefixes`' exact-ppm integer
    * bound `sz − ⌈t·sz⌉ + 1` (floor-division form; a double ceil can round
    * up on float error and silently shorten below the bound), capped at sz.
    *
    * Why an ESTIMATED order is enough: the prefix-filter theorem holds for
    * ANY one global total order, and (est(tok), tok) IS one — est is a
    * deterministic pure function of the token under a fixed state. A CMS
    * only OVERestimates, so a boilerplate token keeps an estimate ≥ its
    * true df and still sorts last; a rare token promoted by bucket
    * collisions merely reorders rare-vs-rare (candidate quality degrades
    * gracefully with ε, exactness of the final pair set never depends on
    * it). The estimate key is the token's DECIMAL STRING (Spark long→string
    * cast ≡ Long.toString), matching the `cmsSketch` build exactly. */
  case class CmsRankPrefix(child: Expression, tppm: Long, state: Seq[Long],
                           depth: Int, width: Int)
      extends UnaryExpression with LongArrayInput {
    require(state.length == depth * width, "cms state shape mismatch")
    require(tppm >= 1 && tppm <= 1000000L, s"threshold ppm out of (0,1]: $tppm")
    @transient private lazy val stateArr: Array[Long] = state.toArray
    override def prettyName: String = "cms_rank_prefix"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(CmsRankPrefix.compute(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        tppm, stateArr, depth, width))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsState", stateArr, "long[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.cmsRankPrefix($v, ${tppm}L, $ref, $depth, $width));")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object CmsRankPrefix {
    def compute(th: org.apache.spark.sql.catalyst.util.ArrayData, tppm: Long,
                state: Array[Long], depth: Int, width: Int): Array[Long] = {
      val sz = th.numElements()
      if (sz == 0) return Array.emptyLongArray
      val toks = new Array[Long](sz)
      var i = 0
      while (i < sz) {
        if (th.isNullAt(i))
          throw new IllegalArgumentException(
            "cms_rank_prefix: null element in token-hash array")
        toks(i) = th.getLong(i)
        i += 1
      }
      // exact-ppm prefix bound, capped at sz (tppm = 10^6 ⇒ plen = 1)
      val plen = (sz.toLong - (tppm * sz + 999999L) / 1000000L + 1L).toInt
      if (plen >= sz) return toks
      val idx = Array.range(0, sz)
      val est = toks.map(t =>
        graft.core.TextStats.cmsEstimateFromState(
          java.lang.Long.toString(t), state, depth, width))
      // ascending (est, tok): one total order shared by every row
      val sorted = idx.sortBy(j => (est(j), toks(j)))
      val out = new Array[Long](plen)
      i = 0
      while (i < plen) { out(i) = toks(sorted(i)); i += 1 }
      out
    }
  }

  /** Jaccard of two SORTED distinct array<long> columns → double. One merge
    * loop per pair, no hashing, no allocation — this is the verify kernel of
    * every set-similarity join (exact blocked, MinHash-candidate, …). */
  case class SortedLongJaccard(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"sorted_jaccard requires two array<bigint> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
      }
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      SortedLongJaccard.compute(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.sortedJaccard($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object SortedLongJaccard {
    /** Called from generated code — keep signature stable. */
    def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
                b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb) {
        // getLong on a null slot silently reads 0 — fail loud instead of
        // letting two phantom zeros count as an intersection hit
        if (a.isNullAt(i) || b.isNullAt(j))
          throw new IllegalArgumentException(
            "sorted_jaccard: null element in input array")
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      val uni = na + nb - inter
      if (uni == 0) 1.0 else inter.toDouble / uni
    }
  }

  /** array<long> of per-element hashes → array<long> of rolling prefix-chain
    * hashes: chain(i) = chain(i-1) * 0x100000001B3 + h(i) in wraparound
    * int64 (== mod 2^64 on the bit pattern), seed 0. The multiplier is the
    * FNV-1a prime — odd, so the multiply is a bijection mod 2^64 and two
    * prefixes collide only through the additive hash terms. Order-sensitive
    * by construction: chain(i) identifies the exact SEQUENCE of the first
    * i+1 elements, which is what shared-prefix (branch/regeneration)
    * detection over conversation turns needs. Cross-engine replayable with
    * the split-multiply HUGEINT arithmetic the other hash oracles use. */
  case class PrefixChain(child: Expression) extends UnaryExpression with LongArrayInput {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(PrefixChain.compute(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.prefixChain($v));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object PrefixChain {
    final val Prime = 1099511628211L // 0x100000001B3 (FNV-1a)
    def compute(hs: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
      val n = hs.numElements()
      val out = new Array[Long](n)
      var acc = 0L
      var i = 0
      while (i < n) {
        // a null slot would read as hash 0, emitting a valid-looking chain
        // for a sequence with a hole — fail loud
        if (hs.isNullAt(i))
          throw new IllegalArgumentException(
            "prefix_chain: null element in input array")
        acc = acc * Prime + hs.getLong(i)
        out(i) = acc
        i += 1
      }
      out
    }
  }

  /** text → array<string> of DISTINCT space-joined word n-grams, first-
    * occurrence order — byte-identical to the HOF tree
    * `array_distinct(transform(sequence(1, size(toks)-(n-1)), i ⇒
    * concat_ws(" ", slice(toks, i, n))))` with `toks = split(text, " ")`
    * (single-space regex, limit -1: consecutive separators yield EMPTY
    * tokens and trailing empties are KEPT — both preserved here), and to
    * the contamination oracle's DuckDB replica. Why custom: inside the HOF
    * lambda, `slice(split(text), i, n)` re-evaluates the `split` PER GRAM
    * POSITION (the Generate's argument embeds `split(text#…)` inside the
    * lambdafunction — visible in `.explain`), turning an O(L) tokenize
    * into O(L·positions) re-splits per row, and the whole tree is
    * CodegenFallback; this kernel splits once and participates in
    * whole-stage codegen (measured: the sf0.1 contamination probe-side
    * Generate drops ~2.8 s → ~0.1 s). Fewer than n tokens → empty array
    * (the HOF tree's `when(size < n, [])` guard). */
  case class WordGrams(child: Expression, n: Int)
      extends UnaryExpression with StringInput {
    require(n >= 1, s"n must be >= 1, got $n")
    override def prettyName: String = "word_grams"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(WordGrams.compute(v.asInstanceOf[UTF8String].toString, n))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.wordGrams($v.toString(), $n));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordGrams {
    def compute(text: String, n: Int): Array[AnyRef] = {
      val toks = text.split(" ", -1)
      if (toks.length < n) return Array.empty[AnyRef]
      // distinct preserving first occurrence — array_distinct's contract
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      out
    }
  }

  /** text → array<string> of fixed-token-count chunks in document order —
    * byte-identical to the HOF tree `transform(sequence(0, ceil(size/k)-1),
    * i ⇒ concat_ws(" ", slice(toks, i*k+1, k)))` over `split(text, " ")`
    * (last chunk short; empty-token/trailing-empty split semantics as
    * [[WordGrams]]). `posexplode` over the result reproduces the 0-based
    * `chunk_idx` of the HOF formulation. Same per-position re-split /
    * CodegenFallback motivation as [[WordGrams]]. */
  case class WordChunks(child: Expression, k: Int)
      extends UnaryExpression with StringInput {
    require(k >= 1, s"k must be >= 1, got $k")
    override def prettyName: String = "word_chunks"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(WordChunks.compute(v.asInstanceOf[UTF8String].toString, k))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.wordChunks($v.toString(), $k));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordChunks {
    /** Disjoint chunks ≡ windows with stride == chunk size:
      * ceil(len/k) == (len>k ? ceil((len-k)/k)+1 : 1) for len ≥ 1. */
    def compute(text: String, k: Int): Array[AnyRef] =
      WordWindows.compute(text, k, k)
  }

  /** text → array<string> of OVERLAPPING token windows (`chunkTokens` wide,
    * advancing by `strideTokens`, last window clamped at the end) — byte-
    * identical to the HOF tree in [[graft.operators.TrainingData.slidingChunks]]'s
    * previous formulation (`transform(sequence(0, nStarts-1), i ⇒
    * concat_ws(" ", slice(toks, i*stride+1, chunk)))`, `nStarts =
    * len > chunk ? ceil((len-chunk)/stride)+1 : 1`). Same split-once /
    * whole-stage-codegen motivation as [[WordGrams]]. */
  case class WordWindows(child: Expression, chunkTokens: Int, strideTokens: Int)
      extends UnaryExpression with StringInput {
    require(strideTokens >= 1 && chunkTokens >= strideTokens,
      s"need chunkTokens >= strideTokens >= 1, got $chunkTokens/$strideTokens")
    override def prettyName: String = "word_windows"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(WordWindows.compute(
        v.asInstanceOf[UTF8String].toString, chunkTokens, strideTokens))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.expressions.Kernels.wordWindows($v.toString(), $chunkTokens, $strideTokens));")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object WordWindows {
    def compute(text: String, chunk: Int, stride: Int): Array[AnyRef] = {
      val toks = text.split(" ", -1) // never empty: "".split -> [""]
      val len = toks.length
      val nStarts =
        if (len > chunk) (len - chunk + stride - 1) / stride + 1 else 1
      val out = new Array[AnyRef](nStarts)
      val sb = new java.lang.StringBuilder
      var c = 0
      while (c < nStarts) {
        sb.setLength(0)
        var j = c * stride
        val end = math.min(j + chunk, len)
        var firstTok = true
        while (j < end) {
          if (!firstTok) sb.append(' ')
          sb.append(toks(j))
          firstTok = false
          j += 1
        }
        out(c) = UTF8String.fromString(sb.toString)
        c += 1
      }
      out
    }
  }

  // ---- Column-level API ----------------------------------------------------
  def minhash_bands(text: Column, shingleK: Int, numHashes: Int, bands: Int): Column =
    column(MinHashBands(expression(text), shingleK, numHashes, bands))

  def simhash64(text: Column): Column = column(SimHash(expression(text)))

  def fingerprint64(text: Column): Column = column(Fingerprint(expression(text)))

  def repetition_stats(text: Column): Column = column(RepetitionStats(expression(text)))

  def token_hashes(text: Column): Column = column(ShingleHashes(expression(text), 1))

  def shingle_hashes(text: Column, k: Int): Column = column(ShingleHashes(expression(text), k))

  def char_gram_hashes(text: Column, k: Int): Column = column(CharGramHashes(expression(text), k))

  def prefix_chain(hashes: Column): Column = column(PrefixChain(expression(hashes)))

  def sorted_jaccard(a: Column, b: Column): Column =
    column(SortedLongJaccard(expression(a), expression(b)))

  def char_entropy_terms(text: Column): Column =
    column(CharEntropy(expression(text)))

  def bigram_buckets(text: Column, numBuckets: Int): Column =
    column(BigramBuckets(expression(text), numBuckets))

  def bigram_pair_keys(text: Column, numBuckets: Int): Column =
    column(BigramPairKeys(expression(text), numBuckets))

  def hll_bucket_rank(value: Column, p: Int): Column =
    column(HllBucketRank(expression(value), p))

  def cms_buckets(value: Column, depth: Int, width: Int): Column =
    column(CmsBuckets(expression(value), depth, width))

  def cms_estimate(value: Column, state: Array[Long], depth: Int, width: Int): Column =
    column(CmsEstimate(expression(value), state.toIndexedSeq, depth, width))

  def word_grams(text: Column, n: Int): Column = column(WordGrams(expression(text), n))

  def word_chunks(text: Column, k: Int): Column = column(WordChunks(expression(text), k))

  def word_windows(text: Column, chunkTokens: Int, strideTokens: Int): Column =
    column(WordWindows(expression(text), chunkTokens, strideTokens))

  def cms_rank_prefix(th: Column, tppm: Long, state: Array[Long],
                      depth: Int, width: Int): Column =
    column(CmsRankPrefix(expression(th), tppm, state.toIndexedSeq, depth, width))

  def bloom_positions(fp: Column, mBits: Int, k: Int): Column =
    column(BloomPositions(expression(fp), mBits, k))

  def bloom_contains(fp: Column, state: Array[Long], mBits: Int, k: Int): Column =
    column(BloomContains(expression(fp), state.toIndexedSeq, mBits, k))
}
