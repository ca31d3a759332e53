package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** GraftExtensions: the custom expressions must be reachable from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom expressions registered as SQL functions via SparkSessionExtensions") {
    // extensions are builder-time: when another suite's session already
    // exists in this JVM, getOrCreate reuses it WITHOUT them — so always
    // follow with registerOn, the retrofit path for existing sessions
    // (which this test then also covers).
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.registerOn(spark)
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
      emb.createOrReplaceTempView("emb_ext_test")
      val rows = spark.sql(
        """SELECT a.vec_id, float_cosine(a.embedding, a.embedding) AS self_cos,
                  hyperplane_bucket(a.embedding, 4, 64) AS bk
           FROM emb_ext_test a""").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // self-cosine == 1
        assert(r.getLong(2) >= 0 && r.getLong(2) < 16)
      }
      val h = spark.sql(
        "SELECT simhash64('the quick brown fox'), fingerprint64('abc'), " +
        "minhash_bands('a b c d e f', 3, 16, 4)").collect().head
      assert(h.getLong(0) == graft.core.TextStats.simHash(
        graft.core.TextStats.wsTokens("the quick brown fox")))
      assert(h.getLong(1) == graft.core.TextStats.fingerprint("abc"))
      assert(h.getSeq[Long](2).length == 4)
      val sk = spark.sql(
        "SELECT hll_bucket_rank('abc', 8), cms_buckets('abc', 4, 1024)")
        .collect().head
      assert(sk.getSeq[Long](0) ==
        graft.core.TextStats.hllBucketRank("abc", 8).toSeq)
      assert(sk.getSeq[Long](1) ==
        graft.core.TextStats.cmsBuckets("abc", 4, 1024).toSeq)
      val pk = spark.sql(
        "SELECT bigram_pair_keys('the quick brown fox', 64)").collect().head
      assert(pk.getSeq[Long](0) ==
        graft.core.TextStats.bigramPairKeys("the quick brown fox", 64).toSeq)
      // the aggregate path: kmv_agg from plain SQL with GROUP BY
      val ag = spark.sql(
        """SELECT g, kmv_agg(fingerprint64(v), 4) AS sk FROM (
             SELECT 'a' AS g, 'x1' AS v UNION ALL SELECT 'a', 'x2' UNION ALL
             SELECT 'a', 'x3' UNION ALL SELECT 'a', 'x4' UNION ALL
             SELECT 'a', 'x5' UNION ALL SELECT 'a', 'x1' UNION ALL
             SELECT 'b', 'y1')
           GROUP BY g ORDER BY g""").collect()
      val expectA = Seq("x1", "x2", "x3", "x4", "x5")
        .map(graft.core.TextStats.fingerprint)
        .sortBy(_ ^ Long.MinValue).take(4)
      assert(ag(0).getSeq[Long](1) == expectA)
      assert(ag(1).getSeq[Long](1) ==
        Seq(graft.core.TextStats.fingerprint("y1")))
      // topk_agg / bottomk_agg from plain SQL, plus the partial-agg plan
      // shape (ObjectHashAggregate with a partial_topk_agg map-side step)
      val tkDf = spark.sql(
        """SELECT g, topk_agg(r, id, 2) AS tk, bottomk_agg(r, id, 2) AS bk
           FROM (SELECT 'a' AS g, 5L AS r, 'd1' AS id UNION ALL
                 SELECT 'a', 7L, 'd2' UNION ALL SELECT 'a', 5L, 'd0' UNION ALL
                 SELECT 'b', 1L, 'x')
           GROUP BY g ORDER BY g""")
      val plan = tkDf.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), plan)
      assert(plan.contains("partial_topk_agg"), plan)
      val tk = tkDf.collect()
      def pairs(row: org.apache.spark.sql.Row, i: Int) =
        row.getSeq[org.apache.spark.sql.Row](i).map(e => (e.getLong(0), e.getString(1)))
      assert(pairs(tk(0), 1) == Seq((7L, "d2"), (5L, "d0")))   // desc, id tie-break
      assert(pairs(tk(0), 2) == Seq((5L, "d0"), (5L, "d1")))   // asc bottom-k
      assert(pairs(tk(1), 1) == Seq((1L, "x")) && pairs(tk(1), 2) == Seq((1L, "x")))
      // word_grams / word_chunks / word_windows from plain SQL == kernels
      val wg = spark.sql(
        "SELECT word_grams('a b a b c', 2), word_chunks('a b c d e', 2), " +
        "word_windows('a b c d e', 3, 2)").collect().head
      assert(wg.getSeq[String](0) == Seq("a b", "b a", "b c")) // distinct, first-occurrence
      assert(wg.getSeq[String](1) == Seq("a b", "c d", "e"))   // last chunk short
      assert(wg.getSeq[String](2) == Seq("a b c", "c d e"))    // stride 2, clamped
      // bloom_positions from plain SQL == kernel (over the fingerprint chain)
      val bp = spark.sql(
        "SELECT bloom_positions(fingerprint64('needle'), 4096, 5)").collect().head
      assert(bp.getSeq[Long](0) == graft.core.TextStats.bloomPositions(
        graft.core.TextStats.fingerprint("needle"), 4096, 5).toSeq)
      val pc = spark.sql("SELECT prefix_chain(array(3L, 5L, 7L))").collect().head
      val P = graft.expressions.TextHashExpressions.PrefixChain.Prime
      assert(pc.getSeq[Long](0) == Seq(3L, 3L * P + 5L, (3L * P + 5L) * P + 7L))

      // zorder2: kernel equals a naive bit-by-bit interleave; binary sort
      // order is monotone per dimension and signed-correct
      def naiveZ(a: Long, b: Long): Array[Byte] = {
        val ua = a ^ Long.MinValue; val ub = b ^ Long.MinValue
        val out = new Array[Byte](16)
        for (i <- 0 until 64; (v, pos) <- Seq((ua, 2 * i), (ub, 2 * i + 1))) {
          val bit = ((v >>> (63 - i)) & 1L).toInt
          out(pos / 8) = (out(pos / 8) | (bit << (7 - pos % 8))).toByte
        }
        out
      }
      val zCases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (-1L, 1L),
        (Long.MaxValue, Long.MinValue), (123456789L, -987654321L))
      zCases.foreach { case (a, b) =>
        assert(java.util.Arrays.equals(
          graft.expressions.ZOrder.ZOrder2.compute(a, b), naiveZ(a, b)),
          s"zorder2($a, $b) != naive")
      }
      def cmpZ(x: Array[Byte], y: Array[Byte]) =
        java.util.Arrays.compareUnsigned(x, y)
      val z = graft.expressions.ZOrder.ZOrder2.compute _
      assert(cmpZ(z(1L, 5L), z(2L, 5L)) < 0)   // monotone in a, b fixed
      assert(cmpZ(z(5L, -3L), z(5L, -2L)) < 0) // monotone in b incl. sign
      assert(cmpZ(z(-1L, 0L), z(0L, 0L)) < 0)  // signed order preserved
      val zr = spark.sql("SELECT zorder2(3L, 9L)").collect().head
      assert(java.util.Arrays.equals(zr.getAs[Array[Byte]](0), z(3L, 9L)))
      // fractional rank would silently truncate to 0 under the implicit
      // numeric->long coercion — must be a loud analysis error instead
      val fracErr = intercept[Exception] {
        spark.sql(
          "SELECT topk_agg(score, id, 2) FROM (SELECT 0.91d AS score, 'a' AS id)"
        ).collect()
      }
      assert(fracErr.getMessage.contains("integral"), fracErr.getMessage)

      // wrong argument count: named error, not a bare IndexOutOfBounds
      val arityErr = intercept[Exception] {
        spark.sql("SELECT topk_agg(1L, 'a') FROM (SELECT 1)").collect()
      }
      assert(arityErr.getMessage.contains("topk_agg") &&
        arityErr.getMessage.contains("3"), arityErr.getMessage)
    } finally {
      // do not stop: the underlying SparkContext is shared with TestSpark's
      // session in this JVM; stopping would kill other suites' session.
    }
  }
}
