package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{TextStats, Turn}
import graft.operators.Transcripts

class TranscriptsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("wellFormed: each violation class counted exactly; clean conv flagged well_formed") {
    val rows = Seq(
      // clean conversation: contiguous from 0, alternating roles, tool turn
      // preceded by a tool call, monotonic ts
      Turn("ok", 0, "user", "hi", null, ts(0)),
      Turn("ok", 1, "assistant", "hello", "search", ts(1)),
      Turn("ok", 2, "tool", "result", "search", ts(2)),
      Turn("ok", 3, "assistant", "done", null, ts(3)),
      // messy conversation: starts at 1 (min_idx), gap at 3, duplicate idx 2
      // (different text), blank turn, role repeat, ts regression, orphan tool
      Turn("bad", 1, "user", "a", null, ts(10)),
      // dup idx + role repeat; EQUAL ts so the count is independent of the
      // fingerprint tie order between the two duplicates
      Turn("bad", 2, "assistant", "b", null, ts(11)),
      Turn("bad", 2, "assistant", "c", null, ts(11)),
      Turn("bad", 4, "user", "  ", null, ts(5)),      // gap(3), blank, ts back
      Turn("bad", 5, "tool", "orphan", null, ts(13))  // prev turn has no tool
    )
    val got = Transcripts.wellFormed(rows.toDF())
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("ok") == (("ok", 4L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, true)))
    //                 conv  n  dup gap min empty rr  tsr orph nts nidx wf
    assert(got("bad") == (("bad", 5L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 0L, 0L, false)))
  }

  test("wellFormed: null ts and null turn_idx are their own violations, not masked") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("tool", StringType), StructField("ts", TimestampType)))
    // a ts regression STRADDLING a null ts would count 0 regressions —
    // the null_ts counter is what keeps the conversation flagged
    val rows = Seq(
      Row("nt", 0, "user", "a", null, ts(10)),
      Row("nt", 1, "assistant", "b", null, null),
      Row("nt", 2, "user", "c", null, ts(5)),
      Row("ni", null, "user", "x", null, ts(0)),
      Row("ni", 0, "assistant", "y", null, ts(1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = Transcripts.wellFormed(df)
      .select("conv_id", "null_ts", "null_idx", "well_formed")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("nt") == (("nt", 1L, 0L, false)))
    assert(got("ni")._3 == 1L && !got("ni")._4)
    // repair drops the unknowable-position null-idx turn
    val rep = Transcripts.repair(df.filter(org.apache.spark.sql.functions.col("conv_id") === "ni"))
      .select("text").as[String].collect().toSet
    assert(rep == Set("y"))
  }

  test("wellFormed: NULL-text vs ''-text duplicates order deterministically (total tie key)") {
    // both texts hash fingerprint64("") — fp alone ties completely, and the
    // lag counters would then depend on partition order; tnull (and ts)
    // complete the key: '' (tnull=false) sorts BEFORE NULL (tnull=true)
    val rows = Seq(
      Turn("nn", 0, "user", "x", null, ts(0)),
      Turn("nn", 1, "assistant", null, null, ts(5)),
      Turn("nn", 1, "assistant", "", null, ts(3)))
    def run(parts: Int) = Transcripts.wellFormed(rows.toDF().repartition(parts))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().head
    val one = run(1)
    assert(one == run(7)) // partition invariance
    // pinned order is ('' ts3) then (NULL ts5): monotone → 0 regressions;
    // the flipped order would count 1
    assert(one == (("nn", 3L, 1L, 0L, 0L, 2L, 1L, 0L, 0L, 0L, 0L, false)))
  }

  test("repair: blanks dropped, dup idx resolved keep-min, contiguous re-sequencing") {
    val rows = Seq(
      Turn("m", 1, "user", "a", null, ts(10)),
      Turn("m", 2, "assistant", "b", null, ts(12)), // loses dup: ts later
      Turn("m", 2, "assistant", "c", null, ts(11)), // wins dup (min ts)
      Turn("m", 4, "user", "  ", null, ts(13)),     // blank → dropped
      Turn("m", 5, "tool", "r", "srch", ts(14)))
    val got = Transcripts.repair(rows.toDF())
      .as[(String, Int, String, String, String, java.sql.Timestamp, Int)]
      .collect().sortBy(_._2).toSeq
    // columns: conv_id, turn_idx, role, text, tool, ts, orig_turn_idx
    assert(got.map(r => (r._2, r._4, r._7)) ==
      Seq((0, "a", 1), (1, "c", 2), (2, "r", 5)))
    // the repaired table passes the index/blank checks of wellFormed
    val wf = Transcripts.wellFormed(Transcripts.repair(rows.toDF())
        .drop("orig_turn_idx"))
      .select("dup_idx", "idx_gaps", "min_idx", "empty_turns")
      .as[(Long, Long, Long, Long)].collect().head
    assert(wf == ((0L, 0L, 0L, 0L)))
  }

  test("branchPrefixes == naive replica; singletons 0; exact dup = full-depth family") {
    // family F: three conversations sharing 2 turns, two of them sharing 3
    val rows = Seq(
      Turn("f1", 0, "user", "q", null, ts(0)),
      Turn("f1", 1, "assistant", "a", null, ts(1)),
      Turn("f1", 2, "assistant", "x", null, ts(2)),
      Turn("f2", 0, "user", "q", null, ts(0)),
      Turn("f2", 1, "assistant", "a", null, ts(1)),
      Turn("f2", 2, "assistant", "x", null, ts(2)), // f1 == f2 exactly (dup)
      Turn("f3", 0, "user", "q", null, ts(0)),
      Turn("f3", 1, "assistant", "a", null, ts(1)),
      Turn("f3", 2, "assistant", "y", null, ts(2)), // diverges at depth 3
      Turn("s", 0, "user", "q2", null, ts(0)),      // singleton
      // role change alone must break the prefix (hash covers role + text)
      Turn("r", 0, "assistant", "q", null, ts(0)))
    val got = Transcripts.branchPrefixes(rows.toDF())
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // naive replica: chain per conv, family counts per (depth, prefix)
    val P = graft.expressions.TextHashExpressions.PrefixChain.Prime
    val byConv = rows.groupBy(_.conv_id).view.mapValues { ts0 =>
      val hs = ts0.sortBy(_.turn_idx)
        .map(t => TextStats.fingerprint(t.role + "\u001F" + t.text))
      hs.scanLeft(0L)((a, h) => a * P + h).drop(1)
    }.toMap
    val fam = byConv.toSeq
      .flatMap { case (c, ch) => ch.zipWithIndex.map { case (p, i) => (i + 1, p, c) } }
      .groupBy { case (d, p, _) => (d, p) }.view.mapValues(_.size).toMap
    val expect = byConv.map { case (c, ch) =>
      val shared = ch.zipWithIndex
        .map { case (p, i) => (i + 1L, p, fam((i + 1, p)).toLong) }
        .filter(_._3 >= 2)
      c -> (if (shared.isEmpty) (0L, 0L, 0L)
            else shared.maxBy(_._1) match { case (d, p, n) => (d, p, n) })
    }
    assert(got == expect)
    assert(got("s") == ((0L, 0L, 0L)) && got("r") == ((0L, 0L, 0L)))
    assert(got("f1")._1 == 3L && got("f1")._3 == 2L) // full-depth dup with f2
    assert(got("f3")._1 == 2L && got("f3")._3 == 3L) // 3-way family, depth 2
  }

  test("keySkewProfile: exact stats on a planted distribution; quantile edge rule") {
    // 10 keys with 1 row, 5 with 10, 1 monster with 1000:
    // n_keys=16, n_rows=1060, p50 = smallest c with cum*1e6 >= 16e6*0.5
    // (cum(1)=10 >= 8 → p50=1); p99: need cum >= 15.84 → c=1000
    val rows =
      (0 until 10).map(k => (f"a$k%02d", 1)) ++
      (0 until 5).flatMap(k => Seq.fill(10)((f"b$k%02d", 1))) ++
      Seq.fill(1000)(("monster", 1))
    val df = rows.toDF("conv_id", "x")
    val got = graft.operators.Diagnostics.keySkewProfile(df, "conv_id")
      .as[(Long, Long, Long, Long, Long, String, Long, Long)].collect().head
    //         n_keys n_rows max  p50 p99  top       top_c  skew_ppm
    assert(got == ((16L, 1060L, 1000L, 1L, 1000L, "monster", 1000L, 1000000000L)))
  }

  test("saltedJoin == plain join; salt spreads the hot key; partition invariance") {
    import org.apache.spark.sql.functions._
    val left = ((0 until 500).map(i => ("hot", i)) ++
      (0 until 20).map(i => (f"k$i%02d", i))).toDF("k", "v")
    val right = (Seq(("hot", "H")) ++ (0 until 20).map(i => (f"k$i%02d", "c")))
      .toDF("k", "attr")
    val plain = left.join(right, "k").orderBy("k", "v").collect().toSeq
    val salted = graft.operators.Matching
      .saltedJoin(left, right, "k", 8, concat(col("k"), lit("#"), col("v")))
      .orderBy("k", "v").collect().toSeq
    assert(salted == plain)
    val salted13 = graft.operators.Matching
      .saltedJoin(left.repartition(13), right, "k", 8,
        concat(col("k"), lit("#"), col("v")))
      .orderBy("k", "v").collect().toSeq
    assert(salted13 == plain)
    // the hot key's 500 rows must actually split across many salt values
    val salts = left.filter(col("k") === "hot")
      .select(pmod(graft.expressions.TextHashExpressions.fingerprint64(
        concat(col("k"), lit("#"), col("v")).cast("string")), lit(8L)))
      .distinct().count()
    assert(salts >= 6, s"hot key only hit $salts of 8 salt buckets")
  }

  test("bm25Scores == naive replica; absent terms contribute 0; empty doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick quick quick brown"),
      (3L, "nothing relevant here at all"),
      (4L, "   "),
      (5L, "fox")).toDF("doc_id", "text")
    val terms = Seq("quick", "fox", "zebra")
    val got = graft.operators.TfIdfMatch.bm25Scores(docs, "doc_id", "text", terms)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val toks = Map(
      1L -> "the quick brown fox jumps over the lazy dog".split("\\s+").toSeq,
      2L -> Seq("quick", "quick", "quick", "brown"),
      3L -> "nothing relevant here at all".split("\\s+").toSeq,
      4L -> Seq.empty[String], 5L -> Seq("fox"))
    val n = toks.size.toDouble
    val sumDl = toks.values.map(_.size).sum.toDouble
    def score(id: Long): Long = terms.map { t =>
      val df = toks.values.count(_.contains(t)).toDouble
      val tf = toks(id).count(_ == t).toDouble
      val dl = toks(id).size.toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tfc = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl * n) / sumDl))
      math.floor(idf * tfc * 10000.0).toLong
    }.sum
    toks.keys.foreach { id =>
      assert(got(id) == ((toks(id).size.toLong, score(id))), s"doc $id")
    }
    assert(got(4L) == ((0L, 0L)))          // empty doc scores 0
    assert(got(3L)._2 == 0L)               // no query term present
    assert(got(2L)._2 > got(1L)._2)        // tf dominance on 'quick'
  }

  test("bm25Rerank: coverage > adjacency > tf precedence; candidate gating") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "quick fox zebra and more words here"), // cov 3, adj 2 (qf + fz)
      (2L, "quick fox quick fox quick fox"),       // cov 2, adj 3, tf 6
      (3L, "zebra elsewhere quick"),               // cov 2, adj 0, tf 2
      (4L, "quick quick quick quick quick quick quick quick"), // cov 1, tf 8
      (5L, "irrelevant text entirely"),            // score 0 — drops at k=5
      (6L, "fox")).toDF("doc_id", "text")          // cov 1, tf 1
    val terms = Seq("quick", "fox", "zebra")
    val got = graft.operators.TfIdfMatch
      .bm25Rerank(docs, "doc_id", "text", terms, k = 5, m = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    val byId = got.map(r => r._2 -> r).toMap
    assert(byId(1L)._4 == 3L && byId(1L)._5 == 2L) // coverage, adjacency
    assert(byId(2L)._4 == 2L && byId(2L)._5 == 3L)
    assert(byId(3L)._4 == 2L && byId(3L)._5 == 0L)
    // rank 4 decided by tf: doc 4 (tf 8) beats doc 6 (tf 1) at cov 1 / adj 0
    assert(byId(4L)._4 == 1L)
    // candidate gating: at k=2 the rerank may only ever see stage-1's top-2
    val top2 = graft.operators.TfIdfMatch
      .bm25Scores(docs, "doc_id", "text", terms)
      .orderBy(col("bm25_q4").desc, col("doc_id")).limit(2)
      .select("doc_id").as[Long].collect().toSet
    val rer2 = graft.operators.TfIdfMatch
      .bm25Rerank(docs, "doc_id", "text", terms, k = 2, m = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(rer2 == top2)
  }

  test("branchPrefixes: partition-count invariance") {
    val rows = (0 until 40).flatMap { c =>
      (0 until 6).map(i => Turn(f"c$c%02d", i, "user",
        s"t${if (c % 4 == 0 && i >= 3) c else i}", null, ts(i)))
    }
    val a = Transcripts.branchPrefixes(rows.toDF().repartition(1))
      .orderBy("conv_id").collect().toSeq
    val b = Transcripts.branchPrefixes(rows.toDF().repartition(13))
      .orderBy("conv_id").collect().toSeq
    assert(a == b)
  }
}
