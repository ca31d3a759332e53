package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TrainingData

class TrainingDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiRedact: all four PII classes counted and redacted; clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk now ip 10.2.3.4 ssn 123-45-6789 tel +1-555-0147"),
      (2L, "no pii here, just words and 42 numbers")
    ).toDF("id", "text")
    val out = TrainingData.piiRedact(df, "text")
      .select("id", "n_email", "n_ssn", "n_phone", "n_ip", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert((r1.getInt(1), r1.getInt(2), r1.getInt(3), r1.getInt(4)) == (1, 1, 1, 1))
    assert(r1.getString(5) == "mail <EMAIL> now ip <IP> ssn <SSN> tel <PHONE>")
    val r2 = out(2L)
    assert((r2.getInt(1), r2.getInt(2), r2.getInt(3), r2.getInt(4)) == (0, 0, 0, 0))
    assert(r2.getString(5) == "no pii here, just words and 42 numbers")
  }

  test("ngramLmScore == naive local bigram LM; unk fold; partition-invariant") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "a rare pangolin token"),   // mostly out-of-vocab at topVocab=4
      (4L, "solo"),                    // single token: 0 positions
      (5L, "   ")                      // whitespace-only: 0 positions
    ).toDF("doc_id", "text")
    val got = TrainingData.ngramLmScore(df, "doc_id", "text", topVocab = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // naive local model, written independently of the operator
    val toks = Map(
      1L -> "the cat sat on the mat", 2L -> "the cat sat on the cat",
      3L -> "a rare pangolin token", 4L -> "solo", 5L -> "   "
    ).view.mapValues(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(4).map(_._1).toSet
    val mapped = toks.view.mapValues(_.map(t => if (vocab(t)) t else "<unk>")).toMap
    val u1 = mapped.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val b2 = mapped.values.flatMap(m => m.zip(m.drop(1))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val s = vocab.size + 1
    val expect = mapped.map { case (id, m) =>
      val qs = m.zip(m.drop(1)).map { p =>
        math.floor(math.log((b2(p) + 1).toDouble / (u1(p._1) + s).toDouble) * 10000.0).toLong
      }
      id -> ((qs.size.toLong, qs.sum))
    }
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got(4L) == ((0L, 0L)) && got(5L) == ((0L, 0L)))
    // repartition invariance
    val got5 = TrainingData.ngramLmScore(df.repartition(5), "doc_id", "text", topVocab = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got5 == got)
    // a natural doc scores strictly better per position than a rare-token doc
    def avg(x: (Long, Long)) = if (x._1 == 0) 0.0 else x._2.toDouble / x._1
    assert(avg(got(1L)) > avg(got(3L)), "LM must separate in-vocab from oov text")
  }

  test("chunkDedup: duplicate chunks keep first (id, idx); uniques survive") {
    val words = (1 to 50).map(i => s"w$i").mkString(" ") // 2 chunks of 25
    val df = Seq(
      (10L, words),                 // chunks 0,1
      (20L, words),                 // exact clone — both chunks dup
      (30L, (51 to 60).map(i => s"w$i").mkString(" ")) // 1 unique chunk
    ).toDF("doc_id", "text")
    val kept = TrainingData.chunkDedup(df, "doc_id", "text", 25)
      .select("doc_id", "chunk_idx").as[(Long, Long)].collect().toSet
    assert(kept == Set((10L, 0L), (10L, 1L), (30L, 0L)))
  }

  test("slidingChunks == naive sliding model; overlap, clamp, short/empty docs") {
    def model(id: Long, text: String, chunk: Int, stride: Int): Seq[(Long, Long, Long, String)] = {
      val toks = text.split(" ", -1)
      val ns = if (toks.length > chunk)
        math.ceil((toks.length - chunk).toDouble / stride).toInt + 1 else 1
      (0 until ns).map { i =>
        (id, i.toLong, (i * stride).toLong,
          toks.slice(i * stride, i * stride + chunk).mkString(" "))
      }
    }
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks: starts 0,24,48,72 (clamped last)
      (2L, (1 to 32).map(i => s"v$i").mkString(" ")),  // exactly one window
      (3L, "a b c"),                                    // shorter than chunk
      (4L, "")                                          // empty -> one empty chunk
    )
    val got = TrainingData.slidingChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 32, strideTokens = 24)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == docs.flatMap { case (id, t) => model(id, t, 32, 24) }.toSet)
  }

  test("contamination: only docs sharing an n-gram with the bench slice are flagged") {
    val eight = "a b c d e f g h"
    val df = Seq(
      (0L, s"$eight tail words here"),   // bench doc (0 % 97 == 0)
      (1L, s"prefix $eight"),            // contaminated: shares the 8-gram
      (2L, "totally different content with many distinct words okay")
    ).toDF("doc_id", "text")
    val out = TrainingData.contamination(df, "doc_id", "text", 8,
      col("doc_id") % 97 === 0).as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L)
    assert(out(0L) >= 1L)   // self-overlap
    assert(!out.contains(2L))
  }

  test("bloomPositions/bloomContains: distinct in-range positions; odd-step full cycle; no false negatives") {
    import graft.core.TextStats
    val rnd = new scala.util.Random(7)
    val fps = Array.fill(500)(rnd.nextLong())
    for (fp <- fps) {
      val ps = TextStats.bloomPositions(fp, 4096, 6)
      assert(ps.length == 6 && ps.distinct.length == 6 &&
        ps.forall(p => p >= 0 && p < 4096))
    }
    // k == m == 64: the odd step is invertible mod 2^6, so the k positions
    // cycle through EVERY residue exactly once
    assert(TextStats.bloomPositions(rnd.nextLong(), 64, 64).sorted.toSeq ==
      (0L until 64L))
    // insert all, probe all: a Bloom filter has NO false negatives
    val words = new Array[Long](4096 >> 6)
    fps.foreach(fp => TextStats.bloomPositions(fp, 4096, 6).foreach(p =>
      words((p >> 6).toInt) |= 1L << (p & 63).toInt))
    assert(fps.forall(fp => TextStats.bloomContains(fp, words, 4096, 6)))
    // empty state contains nothing
    val zero = new Array[Long](4096 >> 6)
    assert(fps.forall(fp => !TextStats.bloomContains(fp, zero, 4096, 6)))
  }

  test("bloomSketch: words == kernel replica; bit_or shard merge; partition-invariant") {
    val values = (0 until 3000).map(i => s"tok-${i % 1100}")
    def run(xs: Seq[String], parts: Int = 4) =
      TrainingData.bloomSketch(
          xs.map(Tuple1(_)).toDF("v").repartition(parts), col("v"),
          mBits = 2048, k = 4)
        .as[(Long, Long)].collect().toMap
    val got = run(values)
    val expect = {
      val words = new Array[Long](2048 >> 6)
      values.distinct.foreach { v =>
        graft.core.TextStats.bloomPositions(
            graft.core.TextStats.fingerprint(v), 2048, 4)
          .foreach(p => words((p >> 6).toInt) |= 1L << (p & 63).toInt) }
      words.zipWithIndex.collect { case (w, i) if w != 0L => (i.toLong, w) }.toMap
    }
    assert(got == expect)
    assert(run(values, parts = 13) == got)            // partition-invariant
    // shard merge: bit-OR of shard sketches == sketch of the union
    val (l, r) = values.splitAt(1000)
    val merged = (run(l).toSeq ++ run(r).toSeq).groupBy(_._1)
      .map { case (w, xs) => w -> xs.map(_._2).reduce(_ | _) }
    assert(merged == got)
  }

  test("contaminationBloom: equals exact contamination at wide m; deterministic FP superset at tiny m") {
    val eight = "a b c d e f g h"
    val docs = (0L until 120L).map { i =>
      if (i % 97 == 0) (i, s"$eight bench tail marker$i")
      else if (i % 3 == 0) (i, s"prefix $eight and some words w$i")
      else (i, s"doc $i " + (0 until 12).map(j => s"w${i}_$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val benchPred = col("doc_id") % 97 === 0
    val exact = TrainingData.contamination(df, "doc_id", "text", 8, benchPred)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    // 2^20 bits over a handful of bench grams: FP mass is ~0 — identical
    val wide = TrainingData.contaminationBloom(df, "doc_id", "text", 8,
      benchPred, mBits = 1 << 20, k = 6).as[(Long, Long)].collect().toMap
    assert(wide == exact)
    // m=64, k=1 saturates the filter: still no false negatives (per-doc
    // counts dominate exact), and FPs MUST appear — deterministically
    val tiny = TrainingData.contaminationBloom(df, "doc_id", "text", 8,
      benchPred, mBits = 64, k = 1).as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) => assert(tiny.getOrElse(id, 0L) >= n) }
    assert(tiny.values.sum > exact.values.sum)
    val tiny2 = TrainingData.contaminationBloom(df.repartition(7), "doc_id",
      "text", 8, benchPred, mBits = 64, k = 1).as[(Long, Long)].collect().toMap
    assert(tiny2 == tiny)                             // partition-invariant, FPs included
    // analysis-time contract: a string fingerprint is rejected, not hashed
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.expressions.TextHashExpressions.bloom_contains(
        col("text"), new Array[Long](1), 64, 1)).collect()
    }
    assert(err.getMessage.contains("bloom_contains"))
  }

  test("stratifiedSample: deterministic under repartitioning; rates ordered by stratum") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 500000)
    def run(d: org.apache.spark.sql.DataFrame) =
      TrainingData.stratifiedSample(d, "doc_id", "lang", rates, defaultPpm = 50000)
        .select("doc_id").as[Long].collect().toSet
    val a = run(df)
    val b = run(df.repartition(13))
    assert(a == b)                                    // partition-invariant
    val en = a.count(_ % 2 == 0); val zh = a.count(_ % 2 == 1)
    assert(en > 400 && en < 600)                      // ~50% of 1000
    assert(zh > 20 && zh < 90)                        // ~5% of 1000
  }

  test("sequencePack: matches single-threaded greedy fold; capacity respected") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i =>
      (i, if (i % 3 == 0) "en" else "de", 10L + rnd.nextInt(90)))
    val df = rows.toDF("doc_id", "lang", "w")
    val out = TrainingData.sequencePack(df, "lang", "doc_id", col("w"), 256)
      .select("lang", "doc_id", "n_tok", "bin_idx")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // oracle: sequential fold per group
    val expect = rows.groupBy(_._2).flatMap { case (g, rs) =>
      var bin = 0L; var used = 0L; var first = true
      rs.sortBy(_._1).map { case (id, _, w) =>
        if (first) { first = false; used = w }
        else if (used + w > 256) { bin += 1; used = w }
        else used += w
        (g, id) -> (w, bin)
      }
    }
    assert(out == expect)
    // bins never exceed capacity (every weight here is < capacity)
    val binLoads = out.toSeq.groupBy { case ((g, _), (_, b)) => (g, b) }
      .map { case (_, xs) => xs.map(_._2._1).sum }
    assert(binLoads.forall(_ <= 256))
  }

  test("weightedSample: == naive A-ES race; equal weights degenerate to bottom-k; partition-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 800L).map(i => (i, 1L + rnd.nextInt(500).toLong))
    val df = rows.toDF("doc_id", "n_chars")
    def run(d: org.apache.spark.sql.DataFrame, k: Int) =
      TrainingData.weightedSample(d, "doc_id", col("n_chars"), k)
        .select("doc_id", "pri").as[(Long, Long)].collect()
    val got = run(df, 60)
    // naive replica: fetch (fp, bucket) via the pinned fingerprint
    // expression (its own oracle is q_fingerprint), then race in plain Scala
    val fps = df.select(col("doc_id"),
        graft.expressions.TextHashExpressions.fingerprint64(col("doc_id").cast("string")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val naive = rows.map { case (id, w) =>
      val fp = fps(id)
      val bucket = ((fp % 1000000L) + 1000000L) % 1000000L
      val qln = math.floor(math.log((bucket + 1).toDouble / 1000000.0) * -10000.0).toLong
      (qln * 1000000L / w, -w, fp, id)
    }.sorted.take(60).map { case (pri, _, _, id) => (id, pri) }
    assert(got.sortBy(_._2).map(_._1).toSeq == naive.map(_._1).toSeq)
    assert(got.toMap == naive.toMap)
    // partition invariance
    assert(run(df.repartition(17), 60).toSet == got.toSet)
    // equal weights: the race reduces to bottom-k by quantized -ln(u) —
    // i.e. the LARGEST buckets win (small bucket = small u = late arrival)
    val eq = TrainingData.weightedSample(
        df.withColumn("n_chars", lit(7L)), "doc_id", col("n_chars"), 40)
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    val eqNaive = rows.map { case (id, _) =>
      val fp = fps(id)
      val bucket = ((fp % 1000000L) + 1000000L) % 1000000L
      val qln = math.floor(math.log((bucket + 1).toDouble / 1000000.0) * -10000.0).toLong
      (qln * 1000000L / 7L, -7L, fp, id)
    }.sorted.take(40).map(_._4).toSet
    assert(eq.map(_._1).toSet == eqNaive)
    assert(eq.map(_._2).min > 800000L) // winners are all large-u rows
    // heavier rows win more often: duplicate the race with weight 1 vs 500
    val heavy = (0L until 400L).map(i => (i, if (i < 200) 1L else 500L)).toDF("doc_id", "n_chars")
    val kept = run(heavy, 100).map(_._1)
    assert(kept.count(_ >= 200) > 80, s"heavy kept ${kept.count(_ >= 200)}")
    // non-positive / null weights dropped
    val withBad = df.withColumn("n_chars",
      when(col("doc_id") < 10L, lit(0L)).otherwise(col("n_chars")))
    assert(run(withBad, 800).map(_._1).forall(_ >= 10L))
  }

  test("temperatureSample: rates scale as sqrt(n_max/n_l), capped; deterministic") {
    // 1600 en vs 400 zh → zh rate = en rate * sqrt(4) = 2×
    val df = (0L until 2000L).map(i => (i, if (i % 5 == 4) "zh" else "en"))
      .toDF("doc_id", "lang")
    val kept = TrainingData.temperatureSample(df, "doc_id", "lang", topRatePpm = 300000)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val en = kept.count(_._2 == "en"); val zh = kept.count(_._2 == "zh")
    // en ~ 30% of 1600 = 480, zh ~ 60% of 400 = 240
    assert(en > 400 && en < 560, s"en=$en")
    assert(zh > 190 && zh < 290, s"zh=$zh")
    // tiny stratum → rate capped at 100%
    val df2 = df.unionAll(Seq((99999L, "xx")).toDF("doc_id", "lang"))
    val kept2 = TrainingData.temperatureSample(df2, "doc_id", "lang", 300000)
      .select("lang").as[String].collect()
    assert(kept2.count(_ == "xx") == 1)
  }

  test("sourceCap: at most cap per source; selection is fingerprint-ranked, not id order") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = TrainingData.sourceCap(df, "doc_id", "source", cap = 10)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(out.length == 30)
    assert(out.groupBy(_._2).forall(_._2.length == 10))
    // fingerprint order ≠ id order: the kept set must not be ids 0..29
    assert(out.map(_._1).toSet != (0L until 30L).toSet)
    // deterministic under repartitioning
    val again = TrainingData.sourceCap(df.repartition(7), "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("tokenBudget: keeps the quality-ordered prefix within the budget exactly") {
    val df = Seq((1L, 5L, 100L), (2L, 7L, 90L), (3L, 4L, 80L), (4L, 10L, 70L))
      .toDF("doc_id", "w", "qual")
    // order by qual desc: 1(5),2(7),3(4),4(10) → cum 5,12,16,26; budget 16
    val out = TrainingData.tokenBudget(df, "doc_id", col("w"), col("qual"), 16)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 5L, 2L -> 12L, 3L -> 16L))
  }

  test("WordGrams/WordChunks/WordWindows kernels == HOF column trees on fixture + crafted edges") {
    import graft.expressions.{TextHashExpressions => TX}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val crafted = Seq(
      (9001L, ""),                       // "".split(" ",-1) -> [""] — 1 token
      (9002L, " "),                      // two empty tokens
      (9003L, "a  b   c"),               // interior empty tokens join as "a  b"
      (9004L, "a b c d e f g h"),        // exactly n=8 tokens -> one gram
      (9005L, "a b c d e f g"),          // n-1 tokens -> no grams
      (9006L, "x y z x y z x y z x y"),  // repeats -> array_distinct dedup
      (9007L, "trailing space "),        // trailing empty token kept
      (9008L, "tab\tis one token"),      // only ' ' splits, not \t
      (9009L, "😀 b 😀 b 😀 b 😀 b 😀"), // astral chars
      (9010L, "a\nb c\nd e f g h i j"))  // newlines inside tokens
      .toDF("doc_id", "text")
    val all = docs.unionAll(crafted)
    val toks = split(col("text"), " ")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // grams: kernel vs the previous HOF formulation (posexplode pins ORDER too)
    val n = 8
    val hofGrams = rowsOf(all.select(col("doc_id"), posexplode(array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))).as(Seq("p", "g"))))
    val kGrams = rowsOf(all.select(col("doc_id"),
      posexplode(TX.word_grams(col("text"), n)).as(Seq("p", "g"))))
    assert(kGrams == hofGrams)
    // chunks: kernel vs HOF
    val k = 3
    val nChunks = ceil(size(toks).cast("double") / k).cast("int")
    val hofChunks = rowsOf(all.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * k + 1, lit(k))))).as(Seq("p", "c"))))
    val kChunks = rowsOf(all.select(col("doc_id"),
      posexplode(TX.word_chunks(col("text"), k)).as(Seq("p", "c"))))
    assert(kChunks == hofChunks)
    // windows: kernel vs HOF (chunk 5, stride 2)
    val (cw, st) = (5, 2)
    val nStarts = when(size(toks) > cw,
      ceil((size(toks) - cw).cast("double") / st).cast("int") + 1).otherwise(lit(1))
    val hofWin = rowsOf(all.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), nStarts - 1),
        i => concat_ws(" ", slice(toks, i * st + 1, lit(cw))))).as(Seq("p", "w"))))
    val kWin = rowsOf(all.select(col("doc_id"),
      posexplode(TX.word_windows(col("text"), cw, st)).as(Seq("p", "w"))))
    assert(kWin == hofWin)
    // null text -> no rows from explode on either formulation
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(nulls.select(posexplode(TX.word_grams(col("text"), 2))).count() == 0)
    assert(nulls.select(posexplode(TX.word_chunks(col("text"), 2))).count() == 0)
  }

  test("RepetitionStats kernel == HOF column trees on fixture docs and crafted edge cases") {
    import graft.functions.{TextFunctions => TF}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val crafted = Seq((9001L, "a b a b a b"), (9002L, ""), (9003L, "  x  "),
      (9004L, "l1\nl1\n l1 \nl2\n\nl3"), (9005L, "one two three two one two"),
      // trailing non-space whitespace: split(-1) keeps an empty token (the
      // kernel once dropped it and diverged from the column trees here)
      (9006L, "a a a\n"), (9007L, "x y\tx y\t"),
      // astral chars: char accounting is code points, not UTF-16 units
      (9008L, "😀😀\na\na\n😀😀"),
      // \x0B is Java-\s but not RE2-\s: a token boundary here (the oracles
      // mirror with explicit [\s\x0B] classes)
      (9009L, "a aa a"))
      .toDF("doc_id", "text")
    val all = docs.unionAll(crafted)
    val hof = all.select(col("doc_id"),
        TF.dupNgramPpm(col("text"), 2).as("d2"),
        TF.dupNgramPpm(col("text"), 3).as("d3"),
        TF.dupLineCharPpm(col("text")).as("dl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val kernel = all.select(col("doc_id"),
        graft.expressions.TextHashExpressions.repetition_stats(col("text")).as("rs"))
      .collect().map { r =>
        val a = r.getSeq[Long](1); r.getLong(0) -> (a(0), a(1), a(2))
      }.toMap
    assert(kernel == hof)
  }

  test("nearDupClusters: chain graph converges to min-reachable label; components separate") {
    // chain 1-2-3-4-5 (diameter 4 → several propagation rounds) + pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("left_id", "right_id")
    val out = graft.operators.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("keepBestPerCluster: argmax-by-score survivor per cluster, id tie-break; singletons kept untouched") {
    // docs 1..5 chain-clustered (cluster 1), 10-11 paired (cluster 10),
    // 20/21 unclustered; scores pick 3 (chain max) and 11 (pair max);
    // 4 ties 3's score -> lower id 3 wins
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("left_id", "right_id")
    val clusters = graft.operators.Dedup.nearDupClusters(pairs)
    val docs = Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 9L), (5L, 2L),
      (10L, 1L), (11L, 4L), (20L, 8L), (21L, 0L)).toDF("doc_id", "score")
    val out = graft.operators.Dedup.keepBestPerCluster(
        docs, clusters, "doc_id", col("score"))
      .as[(Long, Option[Long], Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out.size == 9)
    assert(out.filter(_._2._2).keySet == Set(3L, 11L, 20L, 21L))
    assert(out(3L) == ((Some(1L), true)) && out(4L) == ((Some(1L), false)))
    assert(out(20L) == ((None, true)) && out(21L) == ((None, true)))
    // partition-invariant
    val out2 = graft.operators.Dedup.keepBestPerCluster(
        docs.repartition(7), clusters, "doc_id", col("score"))
      .as[(Long, Option[Long], Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out2 == out)
  }

  test("temperatureSample: NULL strata sample like any other stratum (null-safe join)") {
    import spark.implicits._
    val rows = (0L until 300L).map(i =>
      (i, if (i < 200) null.asInstanceOf[String] else "en"))
    val out = TrainingData.temperatureSample(rows.toDF("doc_id", "lang"),
      "doc_id", "lang", topRatePpm = 500000L)
      .select("doc_id", "lang").as[(Long, Option[String])].collect()
    // the (larger) null stratum must appear in the output, at the top rate's
    // scaled-down share, not silently vanish
    val nullKept = out.count(_._2.isEmpty)
    assert(nullKept > 0, "null-stratum rows dropped")
    // rates: null stratum is n_max (200) → rate 0.5; en gets 0.5*sqrt(200/100)
    assert(out.count(_._2.contains("en")) > 0)
  }

  test("ngramLmScore: idCol named 'id' and NULL text both work") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, null.asInstanceOf[String]), (3L, "a b"))
      .toDF("id", "text")
    val out = TrainingData.ngramLmScore(df, "id", "text", topVocab = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 3)
    assert(out(2L) == ((0L, 0L))) // null text: zero positions, zero sum
    assert(out(1L)._1 == 2L) // "a b a": two bigram positions
  }

  test("ngramJaccardPairs == brute force at boundary thresholds (t·|s| integral, t = 1.0)") {
    import spark.implicits._
    import graft.expressions.TextHashExpressions.{token_hashes, sorted_jaccard}
    // deterministic word-soup corpus with heavy overlap so J == t pairs occur
    val words = Vector("ape", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibis", "jay")
    val docs = (0 until 30).map { i =>
      val n = 2 + i % 5
      (i.toLong, "b", (0 until n).map(j => words((i * 3 + j) % words.length)).mkString(" "))
    } ++ Seq((100L, "b", "ape bee cat dog elk"), (101L, "b", "cat dog elk"), // J = 3/5 = 0.6
      (102L, "b", "ape bee cat dog elk"))                                   // J(100,102) = 1.0
    val df = docs.toDF("id", "blk", "text")
    for (t <- Seq(0.5, 0.6, 1.0)) {
      val got = graft.operators.Dedup.ngramJaccardPairs(df, "text", "id", "blk", t)
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      val s = df.select(col("id"), col("blk"), token_hashes(col("text")).as("th"))
        .filter(size(col("th")) > 0)
      val brute = s.as("l").join(s.as("r"),
          col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
        .select(col("l.id"), col("r.id"),
          sorted_jaccard(col("l.th"), col("r.th")).as("j"))
        .filter(col("j") >= t).as[(Long, Long, Double)]
        .collect().map(x => (x._1, x._2)).toSet
      assert(got == brute, s"t=$t: missing=${brute -- got} extra=${got -- brute}")
      if (t == 0.6) assert(got.contains((100L, 101L)), "exact-boundary pair dropped")
      if (t == 1.0) assert(got.contains((100L, 102L)), "identical pair dropped at t=1.0")
    }
  }

  test("nearDupClusters: empty pair list and string ids both work (no decimal-sum NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("left_id", "right_id")
    assert(graft.operators.Dedup.nearDupClusters(empty).collect().isEmpty)
    val strPairs = Seq(("convB", "convA"), ("convC", "convB")).toDF("left_id", "right_id")
    val got = graft.operators.Dedup.nearDupClusters(strPairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("convA" -> "convA", "convB" -> "convA", "convC" -> "convA"))
  }

  test("repeatedLines: CRLF corpora keep blank lines and unify boilerplate norms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "header line\r\n\r\nbody one\r\n"),
      (2L, "header line\r\n\r\nbody two\r\n"),
      (3L, "header line\n\nbody three\n")) // LF sibling: same boilerplate norm
    val out = graft.operators.Dedup.repeatedLines(docs.toDF("doc_id", "text"),
        "text", "doc_id", minDocs = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    // the shared header is dropped from ALL THREE (LF and CRLF agree on norm)
    out.values.foreach { case (_, cleaned, dropped) =>
      assert(!cleaned.contains("header line"), cleaned)
      assert(dropped == 1L)
    }
    // blank lines survive (they must never count as a hot line)
    assert(out(1L)._2.split("\n", -1).exists(_.trim.isEmpty))
  }

  test("hammingNearDup rejects out-of-range maxHamming") {
    import spark.implicits._
    val sigs = Seq((1L, 7L), (2L, 7L)).toDF("id", "sim")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingNearDup(sigs, 64).collect()
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingNearDup(sigs, -1).collect()
    }
    assert(graft.operators.Dedup.hammingNearDup(sigs, 0).count() == 1) // identical sigs
  }

  test("nearDupClusters: pointer doubling collapses a 64-chain within O(log d) rounds") {
    // a 64-node path has diameter 63: plain min-propagation needs ~63
    // rounds, pointer doubling must finish well within 10 — maxRounds = 10
    // FAILS (require) if the shortcut ever regresses to linear rounds
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val out = graft.operators.Dedup.nearDupClusters(pairs, maxRounds = 10)
      .as[(Long, Long)].collect()
    assert(out.length == 64 && out.forall(_._2 == 0L))
  }

  test("sequencePackSharded: per-(group,shard) packs respect capacity and cover all rows") {
    val rows = (0L until 300L).map(i => (i, "en", 10L + (i % 80)))
    val df = rows.toDF("doc_id", "lang", "w")
    val out = TrainingData.sequencePackSharded(df, "lang", "doc_id", col("w"),
        capacity = 256, shards = 4)
      .select("lang", "shard", "doc_id", "n_tok", "bin_idx")
      .as[(String, Int, Long, Long, Long)].collect()
    assert(out.length == 300)
    assert(out.map(_._1).toSet == Set("en"))
    val loads = out.groupBy(r => (r._2, r._5)).map(_._2.map(_._4).sum)
    assert(loads.forall(_ <= 256))
  }

  test("sftPairs == naive model: K-capped context, first-turn excluded, null text skipped") {
    val ts0 = new java.sql.Timestamp(1700000000000L)
    // conv A: 6 alternating turns (assistant at 1,3,5); conv B: assistant
    // FIRST (no context -> excluded) then a null-text user turn that must be
    // skipped inside the next assistant's prompt
    val turns = Seq(
      ("A", 0, "user", "hi"), ("A", 1, "assistant", "hello"),
      ("A", 2, "user", "q1"), ("A", 3, "assistant", "a1"),
      ("A", 4, "user", "q2"), ("A", 5, "assistant", "a2"),
      ("B", 0, "assistant", "greeting"), ("B", 1, "user", null),
      ("B", 2, "assistant", "resp")
    ).map { case (c, i, r, t) => (c, i, r, t, null: String, ts0) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

    val k = 2
    val got = TrainingData.sftPairs(turns, contextTurns = k)
      .as[(String, Int, String, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

    // independent naive model
    val byConv = Seq(
      "A" -> Seq((0, "user", "hi"), (1, "assistant", "hello"), (2, "user", "q1"),
        (3, "assistant", "a1"), (4, "user", "q2"), (5, "assistant", "a2")),
      "B" -> Seq((0, "assistant", "greeting"), (1, "user", null), (2, "assistant", "resp")))
    val want = byConv.flatMap { case (c, ts) =>
      ts.zipWithIndex.collect { case ((idx, "assistant", txt), pos) if pos > 0 =>
        val ctx = ts.slice(math.max(0, pos - k), pos)
          .collect { case (_, r, t) if t != null => s"$r: $t" }
        (c, idx) -> ((ctx.mkString("\n\n"), txt))
      }
    }.filter(_._2._1.nonEmpty).toMap
    assert(got == want)
    // K cap is live: A@5's prompt holds turns 3,4 only, not turn 2
    assert(got(("A", 5))._1 == "assistant: a1\n\nuser: q2")
    // null context turn skipped, assistant-first excluded
    assert(got(("B", 2))._1 == "assistant: greeting")
    assert(!got.contains(("B", 0)))
  }

  test("toolStats: role counts, sorted distinct tools (empty when none), epoch span") {
    val t = (ms: Long) => new java.sql.Timestamp(ms)
    val turns = Seq(
      ("A", 0, "user", "x", null, t(1700000001500L)),
      ("A", 1, "assistant", "y", null, t(1700000032000L)),
      ("A", 2, "tool", "z", "grep", t(1700000063000L)),
      ("A", 3, "tool", "z2", "bash", t(1700000094000L)),
      ("A", 4, "tool", "z3", "bash", t(1700000125999L)),
      ("B", 0, "user", "only", null, t(1700000000000L))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val got = TrainingData.toolStats(turns)
      .as[(String, Long, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == ("A", 5L, 1L, 3L, "bash,grep", 1700000001L, 1700000125L))
    assert(got("B") == ("B", 1L, 0L, 0L, "", 1700000000L, 1700000000L))
  }

  test("urlHostStats: canonicalization (case, www, fragment, empty path) and per-host counts") {
    val df = Seq(
      (1L, "see https://WWW.Example.COM/a/b#frag and http://example.com/a/b plus junk"),
      (2L, "https://example.com text http://www.Example.com more"),
      (3L, "port http://bar.net:8080/x/y#top and plain https://bar.net/x/y"),
      (4L, "no urls at all"),
      (5L, "scheme-less www.example.com/skip is NOT extracted")
    ).toDF("doc_id", "text")
    val got = TrainingData.urlHostStats(df, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // example.com: urls = 2 (doc1) + 2 (doc2); paths {/a/b, /}; docs {1,2}
    assert(got("example.com") == ("example.com", 4L, 2L, 2L))
    // bar.net: port stripped from host by the host regex capture; both
    // URLs canonicalize to path /x/y
    assert(got("bar.net") == ("bar.net", 2L, 1L, 1L))
    assert(got.size == 2) // doc4 no urls; doc5 scheme-less not extracted
  }

  test("convNearDup: shared-turn blocking, df-cap stop-shingle, integer Jaccard threshold edge") {
    val mk = (c: String, texts: Seq[String]) =>
      texts.zipWithIndex.map { case (t, i) => (c, i, t) }
    val boiler = "I am a helpful assistant."
    val turns = (
      mk("A", Seq("t1", "t2", "t3", "t4", "t5", boiler)) ++
      mk("B", Seq("t1", "t2", "t3", "t4", boiler)) ++      // J(A,B)=4/6 ≥ 0.6 (boiler df-capped out: n=5 vs 4, inter 4)
      mk("C", Seq("t1", "x2", "x3", "x4", "x5", boiler)) ++ // J(A,C)=1/9 < 0.6 — candidate via t1, filtered
      mk("D", Seq("z1", "z2", boiler))                      // only boiler shared → no candidate at all
    ).toDF("conv_id", "turn_idx", "text")
    // boiler appears in 4 convs; dfCap=3 drops it from every set
    val got = graft.operators.Dedup.convNearDup(turns, thrPpm = 600000L, dfCap = 3)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(("A", "B", 4L, 5L, 4L)))
    // threshold boundary is exact integer math: J(A,B) = 4/5 ≥ 0.8 passes at 800000ppm...
    val atEdge = graft.operators.Dedup.convNearDup(turns, thrPpm = 800000L, dfCap = 3)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(atEdge == Set(("A", "B", 4L, 5L, 4L)))
    // ...and fails one ppm above it
    val above = graft.operators.Dedup.convNearDup(turns, thrPpm = 800001L, dfCap = 3)
      .collect()
    assert(above.isEmpty)
  }

  test("bpePairCounts == naive pair model; short tokens skipped; deterministic top-k ties") {
    val df = Seq(
      (1L, "abab ab"),
      (2L, "  abba x "),   // leading/trailing whitespace; "x" too short
      (3L, "ba")
    ).toDF("doc_id", "text")
    // naive model: pairs from tokens of each text
    val naive = Seq("abab", "ab", "abba", "x", "ba")
      .filter(_.length >= 2)
      .flatMap(t => t.sliding(2).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TrainingData.bpePairCounts(df, "text", 3)
      .as[(String, Long)].collect()
    assert(got.toMap.forall { case (p, n) => naive(p) == n })
    // top-3 by (n desc, pair): ab=4(abab:2+ab:1+abba:1), ba=3(abab:1+abba... )
    val expect = naive.toSeq.sortBy { case (p, n) => (-n, p) }.take(3)
    assert(got.toSeq == expect)
  }

  test("lengthHistogram: integer bit-length buckets; zero bucket; counts and sums") {
    val df = Seq(
      ("s1", 0L), ("s1", 1L), ("s1", 1L), ("s1", 2L), ("s1", 3L),
      ("s1", 4L), ("s2", 1023L), ("s2", 1024L)
    ).toDF("source", "n_chars")
    val got = TrainingData.lengthHistogram(df, "source", col("n_chars"))
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("s1", 0)) == ((1L, 0L)))   // size 0
    assert(got(("s1", 1)) == ((2L, 2L)))   // sizes {1,1}
    assert(got(("s1", 2)) == ((2L, 5L)))   // sizes {2,3}
    assert(got(("s1", 3)) == ((1L, 4L)))   // size 4
    assert(got(("s2", 10)) == ((1L, 1023L)))
    assert(got(("s2", 11)) == ((1L, 1024L)))
    assert(got.size == 6)
  }

  test("preferencePairs: argmax/argmin with deterministic tie-break; singletons dropped") {
    val df = Seq(
      ("p1", "a", "ra", 3L),
      ("p1", "b", "rb", 5L),
      ("p1", "c", "rc", 5L),  // tie with b → chosen = max id "c"
      ("p2", "x", "rx", 1L),  // singleton → no pair
      ("p3", "m", "rm", 7L),
      ("p3", "n", "rn", 2L)
    ).toDF("prompt", "cand_id", "response", "score")
    val got = TrainingData.preferencePairs(df, "prompt", "response",
        col("score"), "cand_id")
      .as[(String, String, Long, String, String, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("p1") == ("p1", "rc", 5L, "c", "ra", 3L, "a", 3L))
    assert(got("p3") == ("p3", "rm", 7L, "m", "rn", 2L, "n", 2L))
    assert(!got.contains("p2"))
  }

  test("c4Clean: line rules (punct, >=3 words, markers) and doc rules (sentences, lorem, brace)") {
    val df = Seq(
      // 5 good sentences → kept doc; bad lines dropped
      (1L, "One good line stays here.\nshort.\nEnable JavaScript now please!\n" +
        "See the privacy policy for details.\nSecond good line is fine.\n" +
        "Third good line is fine.\nFourth good line is fine.\n" +
        "Fifth good line right here.\nSixth good line right here."),
      // enough sentences but contains lorem ipsum → doc dropped
      (2L, "Lorem ipsum dolor sit amet sentence one.\nGood two is here now.\n" +
        "Good three is here now.\nGood four is here now.\nGood five is here now."),
      // brace → doc dropped
      (3L, "Func body { return } stays kept.\nGood two is here now.\nGood three is here now.\n" +
        "Good four is here now.\nGood five is here now.\nGood six is here now."),
      // < 5 sentences after cleaning → doc dropped
      (4L, "Only one kept sentence here.\nno terminal punct line\nab.")
    ).toDF("doc_id", "text")
    val got = TrainingData.c4Clean(df, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept", "n_sentences", "doc_keep", "clean_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getString(5)))).toMap
    assert(got(1L)._1 == 9L && got(1L)._2 == 6L && got(1L)._4 == 1)
    assert(!got(1L)._5.contains("JavaScript") && !got(1L)._5.contains("privacy"))
    assert(!got(1L)._5.contains("short."))
    assert(got(2L)._4 == 0 && got(2L)._2 == 5L)      // lorem ipsum doc-drop
    assert(got(3L)._4 == 0)                          // brace doc-drop
    assert(got(4L) == ((3L, 1L, 1L, 0, "Only one kept sentence here.")))
  }

  test("gopherQuality: integer ratio flags match a naive local model") {
    val goodWords = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and that have with"
    val df = Seq(
      (1L, goodWords),                          // passes everything
      (2L, "tiny doc the of"),                  // fails word count
      (3L, ("x " * 60).trim),                   // mean len 1 → fails meanlen; no stopwords
      (4L, goodWords + "\n- b one\n- b two\n- b three\ntrailing thought...\n" +
        "more thought…\n### hash line.")
    ).toDF("doc_id", "text")
    val got = TrainingData.gopherQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long, name: String): Int =
      got(id).getInt(got(id).fieldIndex(name))
    def c(id: Long, name: String): Long =
      got(id).getLong(got(id).fieldIndex(name))
    assert(f(1L, "gopher_pass") == 1)
    assert(f(2L, "pass_words") == 0 && f(2L, "gopher_pass") == 0)
    assert(f(3L, "pass_meanlen") == 0 && f(3L, "pass_stop") == 0)
    assert(c(4L, "n_lines") == 7L && c(4L, "n_bullet") == 3L)
    assert(c(4L, "n_ellipsis") == 2L)
    assert(c(4L, "n_symbols") == 2L + 3L)   // '...' + '…' + '###'→3 hashes
    assert(c(1L, "n_stop_hits") == 6L)
    // cross-mult identity: symbols*10 <= words ⇔ pass_symbol
    assert((c(4L, "n_symbols") * 10 <= c(4L, "n_words")) == (f(4L, "pass_symbol") == 1))
  }

  test("urlHostFilter: canonical-host membership; docs without urls unblocked") {
    val df = Seq(
      (1L, "see https://WWW.Bad.com/x and http://ok.org/page"),
      (2L, "only http://ok.org/a here"),
      (3L, "no urls at all"),
      (4L, "https://bad.com plain and https://sub.bad.com/q")
    ).toDF("doc_id", "text")
    val got = TrainingData.urlHostFilter(df, "doc_id", "text", Seq("bad.com"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 1)))   // www.Bad.com canonicalizes to bad.com
    assert(got(2L) == ((1L, 0)))
    assert(got(3L) == ((0L, 0)))
    assert(got(4L) == ((2L, 1)))   // sub.bad.com is NOT bad.com; bare bad.com is
  }

  test("linkExtract: positional (href, anchor) pairs, anchors whitespace-normalized") {
    val df = Seq(
      ("c1", 0, """<html><a href="/a">first  link</a><p>x</p><a class="z" href="/b?q=1"> two
                  |words </a></html>""".stripMargin),
      ("c1", 1, "<html>no anchors</html>")
    ).toDF("conv_id", "turn_idx", "text")
    val got = TrainingData.linkExtract(df, Seq("conv_id", "turn_idx"), "text")
      .as[(String, Int, Long, String, String)].collect().sortBy(r => (r._2, r._3))
    assert(got.toSeq == Seq(
      ("c1", 0, 0L, "/a", "first link"),
      ("c1", 0, 1L, "/b?q=1", "two words")))
  }

  test("sniffMime: magic-byte routing incl. RIFF/AVI near-miss and short payloads") {
    import graft.operators.Multimodal
    val rows = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 0, 0, 0, 1)),
      (2L, "RIFF1234WAVEfmt ".getBytes("US-ASCII")),
      (3L, "RIFF1234AVI LIST".getBytes("US-ASCII")),
      (4L, "YUV4MPEG2 W4 H4".getBytes("US-ASCII")),
      (5L, "%PDF-1.4".getBytes("US-ASCII")),
      (6L, "<!DOCTYPE html>".getBytes("US-ASCII")),
      (7L, "<html><p>t</p>".getBytes("US-ASCII")),
      (8L, "just text".getBytes("US-ASCII")),
      (9L, Array[Byte](0x89.toByte, 0x50))  // short: not enough magic → octet
    ).toDF("media_id", "payload")
    val got = Multimodal.sniffMime(rows, "media_id", "payload")
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> "image/png", 2L -> "audio/x-wav",
      3L -> "application/octet-stream", 4L -> "video/x-y4m",
      5L -> "application/pdf", 6L -> "text/html", 7L -> "text/html",
      8L -> "application/octet-stream", 9L -> "application/octet-stream"))
  }

  test("dsirWeights: hashed-bigram likelihood ratios match a naive local model") {
    val data = Map(
      1L -> (("en", "the quick brown fox jumps")),
      2L -> (("en", "the quick blue fox")),
      3L -> (("de", "the quick brown fox jumps")), // raw doc overlapping target
      4L -> (("de", "der schnelle braune fuchs")),
      5L -> (("de", "solo")),                      // no bigrams → (0, 0)
      6L -> (("fr", "")))                          // empty → (0, 0)
    val df = data.toSeq.map { case (id, (l, t)) => (id, l, t) }
      .toDF("doc_id", "lang", "text")
    val got = TrainingData.dsirWeights(df, "doc_id", "text",
        col("lang") === "en", numBuckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val B = 64
    def bigr(t: String): Seq[String] = {
      val tk = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < 2) Seq.empty else tk.sliding(2).map(_.mkString(" ")).toSeq
    }
    def bucket(g: String): Long = {
      val fp = graft.core.TextStats.fingerprint(g)
      ((fp % B) + B) % B
    }
    val targetF = data.filter(_._2._1 == "en").values.flatMap(v => bigr(v._2))
      .map(bucket).toSeq
    val rawDocs = data.filter(_._2._1 != "en")
    val rawF = rawDocs.values.flatMap(v => bigr(v._2)).map(bucket).toSeq
    val ct = targetF.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rawF.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (targetF.size.toLong, rawF.size.toLong)
    val expect = rawDocs.map { case (id, (_, t)) =>
      val bs = bigr(t).map(bucket)
      val q = bs.map { b =>
        math.floor(math.log(
          ((ct.getOrElse(b, 0L) + 1) * (tr + B)).toDouble /
            ((cr.getOrElse(b, 0L) + 1) * (tt + B)).toDouble) * 10000.0).toLong
      }
      id -> ((bs.size.toLong, q.sum))
    }
    assert(got == expect)
    assert(got(5L) == ((0L, 0L)) && got(6L) == ((0L, 0L)))
    // the target-overlapping raw doc must outscore the disjoint one
    assert(got(3L)._2 > got(4L)._2)
  }

  test("lmPerplexity: conditional bigram LM NLL matches a naive local model") {
    val data = Map(
      1L -> (("en", "the quick brown fox jumps over the quick dog")),
      2L -> (("en", "the quick blue fox sleeps")),
      3L -> (("de", "the quick brown fox jumps")), // in-model phrases → low NLL
      4L -> (("de", "der schnelle braune fuchs springt")), // all-unseen → high
      5L -> (("de", "solo")),                      // one token → (0, 0, 0)
      6L -> (("fr", "")))                          // empty → (0, 0, 0)
    val df = data.toSeq.map { case (id, (l, t)) => (id, l, t) }
      .toDF("doc_id", "lang", "text")
    val got = TrainingData.lmPerplexity(df, "doc_id", "text",
        col("lang") === "en", numBuckets = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val B = 64L
    def buckets(t: String): Seq[Long] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.map { w =>
        val fp = graft.core.TextStats.fingerprint(w)
        ((fp % B) + B) % B
      }
    def pairKeys(t: String): Seq[Long] = {
      val b = buckets(t)
      if (b.length < 2) Seq.empty
      else b.zip(b.tail).map { case (u, v) => u * B + v }
    }
    val target = data.filter(_._2._1 == "en").values.flatMap(v => pairKeys(v._2)).toSeq
    val cUV = target.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cU = target.map(_ / B).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = data.filter(_._2._1 != "en").map { case (id, (_, t)) =>
      val ks = pairKeys(t)
      val nll = ks.map { k =>
        -math.floor(math.log(
          (cUV.getOrElse(k, 0L) + 1).toDouble /
            (cU.getOrElse(k / B, 0L) + B).toDouble) * 10000.0).toLong
      }.sum
      val n = ks.size.toLong
      id -> ((n, nll, if (n == 0) 0L else nll / n))
    }
    assert(got == expect)
    assert(got(5L) == ((0L, 0L, 0L)) && got(6L) == ((0L, 0L, 0L)))
    // in-model phrasing must be cheaper per token than all-unseen text
    assert(got(3L)._3 < got(4L)._3)
  }

  test("bpeTrainMerges + bpeEncode == naive reference BPE (merge order, ties, encode)") {
    val corpus = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low new low"),
      (4L, "   "),          // whitespace-only → 0 words / 0 tokens
      (5L, "x"),            // single char word
      // consecutive-occurrence runs: merging (a,n) in "banana" must yield
      // [b,an,an,a] and (a,a) in "aaaa" must yield [aa,aa] — a shared-
      // delimiter replace consumes the first match's trailing separator
      // and misses the run (ADVICE r2 high finding)
      (6L, "banana banana banana banana bananas aaaa aaaa aaaa nananana"))
    val df = corpus.toDF("doc_id", "text")
    val m = 6

    // naive reference, independent of the operator
    def mergeWord(sy: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) { out += (l + r); i += 2 }
        else { out += sy(i); i += 1 }
      }
      out.result()
    }
    val wordCounts = corpus.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var repr: Map[String, Vector[String]] =
      wordCounts.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val expMerges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (rank <- 0 until m) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, n) <- wordCounts; sy = repr(w); i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l + "\u001F" + r) }.head
        expMerges += ((rank, l, r, l + r, cnt))
        repr = repr.view.mapValues(mergeWord(_, l, r)).toMap
      }
    }
    val gotMerges = TrainingData.bpeTrainMerges(df, "text", m)
    assert(gotMerges == expMerges.toSeq, s"got $gotMerges\nexp $expMerges")

    val enc = TrainingData.bpeEncode(df, "doc_id", "text",
        gotMerges.map(x => (x._2, x._3)))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val expEnc = corpus.map { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val encoded = ws.map { w =>
        expMerges.foldLeft(w.map(_.toString).toVector) {
          case (sy, (_, l, r, _, _)) => mergeWord(sy, l, r)
        }
      }
      val toks = encoded.flatten
      id -> ((ws.size.toLong, toks.size.toLong, toks.mkString(" ").take(80)))
    }.toMap
    assert(enc == expEnc, s"got $enc\nexp $expEnc")
    assert(enc(4L) == ((0L, 0L, "")))
  }

  test("bpeTrainMerges: driver-side and distributed arms produce identical merges") {
    // vocab with tie groups, runs, multi-byte chars (é = 2 UTF-8 bytes —
    // exercises the UTF-8-byte tie order both arms must share)
    val df = Seq(
      (1L, "low lower lowest low low banana aaaa"),
      (2L, "café cafés café naïve naïve naïve"),
      (3L, "ab ab ba ba")).toDF("doc_id", "text")
    val local = TrainingData.bpeTrainMerges(df, "text", 8)
    val dist = TrainingData.bpeTrainMerges(df, "text", 8, collectVocabLimit = 0)
    assert(local == dist, s"local $local\ndist $dist")
  }

  test("charEntropyTerms: histogram quantized-log identity on crafted strings") {
    import graft.core.TextStats
    // uniform 4-char string: H = ln 4 exactly; each term floor(1e4*ln(4/1))
    val u = TextStats.charEntropyTerms("abcd")
    assert(u(0) == 4L && u(1) == 4L * math.floor(math.log(4.0) * 10000.0).toLong)
    // single repeated char: ln(1) = 0
    assert(TextStats.charEntropyTerms("aaaa").toSeq == Seq(4L, 0L))
    // naive independent model on a mixed string (incl. a surrogate pair)
    val s = "aab😀😀 x"
    val cps = s.codePoints.toArray
    val n = cps.length.toLong
    val expect = cps.groupBy(identity).values.map { g =>
      g.length * math.floor(math.log(n.toDouble / g.length) * 10000.0).toLong
    }.sum
    val got = TextStats.charEntropyTerms(s)
    assert(got(0) == n && got(1) == expect)
    // expression plane agrees with the kernel
    val df = Seq((1L, "abcd"), (2L, s)).toDF("id", "t")
      .select(col("id"),
        graft.expressions.TextHashExpressions.char_entropy_terms(col("t")).as("e"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(df(1L) == Seq(4L, 4L * math.floor(math.log(4.0) * 10000.0).toLong))
    assert(df(2L) == Seq(n, expect))
  }

  test("hllSketch: state == brute-force replica; shard merge exact; estimate sane") {
    import graft.core.TextStats
    val p = 8
    // 3000 values, ~2400 distinct (collisions by construction)
    val values = (0 until 3000).map(i => s"val-${i % 2400}")
    val df = values.map(Tuple1(_)).toDF("v")
    val sketch = TrainingData.hllSketch(df, col("v"), p)
      .as[(Long, Long)].collect().sorted.toSeq
    // brute-force replica over the kernel — distinctness must not matter
    val expect = values.distinct
      .map(v => { val br = TextStats.hllBucketRank(v, p); (br(0), br(1)) })
      .groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }
      .toSeq.sorted
    assert(sketch == expect)
    // mergeability: sketches of two shards union (max per bucket) to the whole
    val (l, r) = values.splitAt(1100)
    def sk(xs: Seq[String]) = TrainingData.hllSketch(
      xs.map(Tuple1(_)).toDF("v"), col("v"), p)
      .as[(Long, Long)].collect().toMap
    val merged = (sk(l).toSeq ++ sk(r).toSeq).groupBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).max) }.toSeq.sorted
    assert(merged == sketch)
    // readout: within 3 standard errors (1.04/sqrt(256) ≈ 6.5% → 20%)
    val est = TrainingData.hllEstimate(sketch, p)
    assert(math.abs(est - 2400.0) / 2400.0 < 0.20, s"estimate $est vs 2400")
    // rank kernel edges: bucket in [0, 2^p), rank in [1, 64-p+1]
    values.take(50).foreach { v =>
      val br = TextStats.hllBucketRank(v, p)
      assert(br(0) >= 0 && br(0) < (1 << p) && br(1) >= 1 && br(1) <= 64 - p + 1)
    }
  }

  test("kmvSketch: bottom-k == naive replica; shard merge EXACT; estimate sane") {
    import graft.core.TextStats
    val k = 64
    val values = (0 until 3000).map(i => s"val-${i % 900}") // 900 distinct > k
    val df = values.map(Tuple1(_)).toDF("v")
    val sketch = TrainingData.kmvSketch(df, col("v"), k)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // naive replica: distinct fingerprints, unsigned order, first k
    val expect = values.distinct.map(TextStats.fingerprint)
      .distinct.sortBy(_ ^ Long.MinValue).take(k).zipWithIndex
      .map { case (fp, i) => ((i + 1).toLong, fp) }
    assert(sketch == expect)
    // mergeability is EXACT (not just approximate): bottom-k of two shard
    // sketches == the whole-corpus sketch, row for row
    val (l, r) = values.splitAt(1100)
    def sk(xs: Seq[String]) =
      TrainingData.kmvSketch(xs.map(Tuple1(_)).toDF("v"), col("v"), k)
    val merged = TrainingData.kmvMerge(sk(l), sk(r), k)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged == sketch)
    // readout: within 3 standard errors (1/sqrt(k-2) ≈ 12.7% → 38%)
    val est = TrainingData.kmvEstimate(sketch, k)
    assert(math.abs(est - 900.0) / 900.0 < 0.38, s"estimate $est vs 900")
    // fewer distincts than k → the sketch is the exact distinct count
    val tiny = TrainingData.kmvSketch(
      Seq("a", "b", "c", "a").map(Tuple1(_)).toDF("v"), col("v"), k)
      .as[(Long, Long)].collect().toSeq
    assert(tiny.size == 3 && TrainingData.kmvEstimate(tiny, k) == 3.0)
    // null values must not enter the sketch: fingerprint64(null) is null,
    // and Spark's asc (nulls FIRST) would hand it rank 1, evicting a real
    // fingerprint and diverging from a NULLS-LAST oracle engine
    val withNull = TrainingData.kmvSketch(
      Seq(Some("a"), None, Some("b")).toDF("v"), col("v"), k)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val expectNn = Seq("a", "b").map(TextStats.fingerprint)
      .sortBy(_ ^ Long.MinValue).zipWithIndex
      .map { case (fp, i) => ((i + 1).toLong, fp) }
    assert(withNull == expectNn)
  }

  test("kmv_agg: per-group native aggregate == per-group kmvSketch; partition-invariant") {
    import graft.expressions.{SketchAggregates, TextHashExpressions}
    val k = 16
    // 3 groups with > k distinct values each, plus dupes and a null
    val rows = (0 until 900).map(i => (s"g${i % 3}", s"v-${i % 300}")) ++
      Seq(("g0", null))
    val df = rows.toDF("g", "v")
      .select(col("g"), TextHashExpressions.fingerprint64(col("v")).as("fp"))
    def run(parts: Int) = df.repartition(parts)
      .groupBy(col("g")).agg(SketchAggregates.kmv_agg(col("fp"), k).as("sk"))
      .select(col("g"), col("sk"))
      .as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
    val one = run(1)   // single partition: no merge path
    val many = run(7)  // multi-partition: partial buffers + merge
    assert(one == many)
    // each group's sketch == the standalone kmvSketch operator on that group
    for (g <- Seq("g0", "g1", "g2")) {
      val expect = TrainingData.kmvSketch(
        rows.filter(r => r._1 == g && r._2 != null).map(r => Tuple1(r._2))
          .toDF("v"), col("v"), k)
        .orderBy("rank").as[(Long, Long)].collect().map(_._2).toSeq
      assert(one.find(_._1 == g).get._2 == expect, s"group $g")
    }
  }

  test("topk_agg: per-group top-k == row_number window; ties, nulls, dup pairs, partition-invariant") {
    import graft.expressions.RankAggregates
    import org.apache.spark.sql.expressions.Window
    // 40 groups, rank collisions within groups (i % 7), some groups smaller
    // than k, plus nulls in each argument and one exactly-duplicated pair
    val rows = (0 until 400).map(i =>
      (s"g${i % 40}", Option((i % 7).toLong), Option(s"id-$i"))) ++
      Seq(("g0", None: Option[Long], Option("id-null-rank")),
          ("g0", Option(99L), None: Option[String]),
          ("g1", Option(6L), Option("id-6")),   // dup pair with itself:
          ("g1", Option(6L), Option("id-6")))   // counts ONCE (set semantics)
    val df = rows.toDF("g", "r", "id")
    val k = 3
    def agg(parts: Int, desc0: Boolean) = df.repartition(parts)
      .groupBy(col("g"))
      .agg((if (desc0) RankAggregates.topk_agg(col("r"), col("id"), k)
            else RankAggregates.bottomk_agg(col("r"), col("id"), k)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).cast("long").as("rn"),
        col("e.rank").as("r"), col("e.id").as("id"))
      .as[(String, Long, Long, String)].collect().sorted.toSeq
    // window replica over DISTINCT non-null (g, r, id) — the aggregate's
    // documented semantics
    def win(desc0: Boolean) = {
      val ord = if (desc0) Seq(col("r").desc, col("id").asc)
                else Seq(col("r").asc, col("id").asc)
      df.na.drop().distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(ord: _*)).cast("long"))
        .filter(col("rn") <= k).select(col("g"), col("rn"), col("r"), col("id"))
        .as[(String, Long, Long, String)].collect().sorted.toSeq
    }
    assert(agg(1, desc0 = true) == win(desc0 = true))
    assert(agg(7, desc0 = true) == win(desc0 = true))    // partial + merge path
    assert(agg(7, desc0 = false) == win(desc0 = false))  // bottom-k arm
    // dup-pair group: id-6 appears once despite two input rows
    assert(agg(7, desc0 = true).filter(t => t._1 == "g1" && t._4 == "id-6").size == 1)
  }

  test("q_lang_profile: count+sum+topk+sample fuse into ONE aggregate pass (single Exchange)") {
    val df = SparkEntry.queries("q_lang_profile")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // all four aggregates ride one partial/final ObjectHashAggregate pair:
    // exactly one Exchange in the whole plan, both rank aggregates partial
    assert(plan.contains("partial_topk_agg") &&
      plan.contains("partial_bottomk_agg"), plan)
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges\n$plan")
    // and the fused numbers agree with independently-computed parts
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("tc"),
        max(col("n_chars")).as("mx"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    df.collect().foreach { r =>
      val (n, tc, mx) = (expected(r.getString(0))._2,
        expected(r.getString(0))._3, expected(r.getString(0))._4)
      assert(r.getLong(1) == n && r.getLong(2) == tc && r.getLong(4) == mx)
      assert(r.getString(5).split(",").length == math.min(2, n))
    }
  }

  test("kmvResemblance: sketch-only Jaccard == naive replica; sub-k EXACT") {
    import graft.core.TextStats
    val k = 64
    // two overlapping sets, each > k distinct → truncation path on both
    // sides AND on the union
    val as = (0 until 600).map(i => s"a-$i") ++ (0 until 400).map(i => s"s-$i")
    val bs = (0 until 500).map(i => s"b-$i") ++ (0 until 400).map(i => s"s-$i")
    def sk(xs: Seq[String]) =
      TrainingData.kmvSketch(xs.map(Tuple1(_)).toDF("v"), col("v"), k)
    val out = TrainingData.kmvResemblance(sk(as), sk(bs), k)
      .as[(Long, Long, Long)].collect().toSeq
    // naive replica: per-side bottom-k fingerprint sets, bottom-k of the
    // union as the coordinated sample, membership count in both
    def fps(xs: Seq[String]) = xs.distinct.map(TextStats.fingerprint).distinct
    val ua = fps(as).sortBy(_ ^ Long.MinValue).take(k).toSet
    val ub = fps(bs).sortBy(_ ^ Long.MinValue).take(k).toSet
    val un = (ua ++ ub).toSeq.sortBy(_ ^ Long.MinValue).take(k)
    val nI = un.count(x => ua(x) && ub(x)).toLong
    assert(out == Seq((un.size.toLong, nI, nI * 1000000L / un.size)))
    // estimate sanity: true J = 400/1500 ≈ 0.267; 3σ ≈ 3·√(J(1−J)/k) ≈ 0.17
    val j = out.head._3 / 1e6
    assert(math.abs(j - 400.0 / 1500.0) < 0.17, s"jaccard $j vs 0.267")
    // sub-k sketches → the estimate is EXACT: |{y,z}| / |{w,x,y,z,q}|
    val exact = TrainingData.kmvResemblance(
      sk(Seq("x", "y", "z", "w")), sk(Seq("y", "z", "q")), k)
      .as[(Long, Long, Long)].collect().toSeq
    assert(exact == Seq((5L, 2L, 400000L)))
  }
}
