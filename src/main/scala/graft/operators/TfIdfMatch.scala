package graft.operators

import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J9/A4: the union-fit TF-IDF matcher family (`cosine_similarity.py:19-36`,
  * `ML_Model.py:17-55`, `Similarity.py:13-23`).
  *
  * Reference shape reproduced Spark-first: fit the IDF model on the UNION of
  * both sides' text (J9 — the reference fits the vectorizer on
  * `left ++ right`), transform each side, score all pairs with sparse cosine,
  * keep the per-left argmax (J2) — broadcast nested loop over the small side,
  * window group-limit for the reduction. */
object TfIdfMatch {

  private val dotUdf = udf { (a: SparseVector, b: SparseVector) =>
    var i = 0; var j = 0
    var dot = 0.0
    val ai = a.indices; val av = a.values
    val bi = b.indices; val bv = b.values
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { dot += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    dot
  }
  private val normUdf = udf { (a: SparseVector) =>
    var s = 0.0
    var i = 0
    while (i < a.values.length) { s += a.values(i) * a.values(i); i += 1 }
    math.sqrt(s)
  }

  /** Exact-vocabulary TF-IDF best match — the reference's TfidfVectorizer
    * semantics (cosine_similarity.py:19-27: token_pattern `\w\w+` lowercased;
    * NOTE the `\w` here is ASCII on both engines while sklearn's is
    * Unicode-aware — "café" tokenizes to "caf" in this plane, a documented
    * divergence the cross-engine oracle cannot observe because both engines
    * share it —
    * raw tf, smooth idf ln((1+n)/(1+df))+1 fitted on the UNION of both sides,
    * l2-normalized cosine, argmax per left). Two deliberate differences from
    * the HashingTF variant below:
    *
    *  - NO hashing: the vocabulary is exact (like sklearn's), so there is no
    *    collision error, and the whole pipeline is relational — term explode
    *    + hash joins — meaning the dot product only materializes (left,
    *    right) pairs that SHARE a term instead of a dense cross join. At
    *    scale that is the difference between |L|·|R| work and
    *    Σ_term df_L(term)·df_R(term).
    *  - Weights are quantized to 1e-4 integer units before any aggregation,
    *    so every sum is EXACT integer arithmetic: the result is
    *    order-independent, reproducible across engines (the DuckDB oracle
    *    recomputes it bit-for-bit), and the only floating point left is
    *    sqrt/divide on exact integers — correctly-rounded IEEE either side.
    *    (The quantization shifts scores by <1e-3 relative — fine for a
    *    matcher; keep `bestMatch` when exact sklearn floats matter.)
    *
    * Ties and no-shared-term lefts resolve to the smallest right_id (the
    * reference's argmax over an all-zero row returns position 0).
    * Returns (left_id, right_id, score_ppm). */
  def bestMatchExact(left: DataFrame, right: DataFrame): DataFrame = {
    def terms(df: DataFrame, idc: String): DataFrame = df
      .select(col("id").as(idc),
        explode(expr("regexp_extract_all(lower(text), '\\\\w\\\\w+', 0)")).as("term"))
      .groupBy(col(idc), col("term")).agg(count(lit(1)).as("tf"))
    val lt = terms(left, "left_id")
    val rt = terms(right, "right_id")
    // corpus size as a LAZY 1-row frame: two eager count() jobs would scan
    // both (possibly expensive, uncached) inputs once more each
    val nDf = left.agg(count(lit(1)).as("nl"))
      .crossJoin(right.agg(count(lit(1)).as("nr")))
      .select((col("nl") + col("nr")).as("n"))
    val idf = lt.select(col("term")).unionAll(rt.select(col("term")))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDf))
      .select(col("term"), (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0).as("idf"))
    def weigh(t: DataFrame, idc: String): DataFrame = t.join(idf, "term")
      .select(col(idc), col("term"),
        floor(col("tf") * col("idf") * 10000).cast("long").as("w"))
    val lw = weigh(lt, "left_id")
    val rw = weigh(rt, "right_id")
    // DECIMAL(38,0) accumulation: the oracle sums BIGINT into HUGEINT, and a
    // long-wrapped w*w (one term repeated ~400k times) would silently turn
    // the "exact integer" norms negative on the Spark side only
    val wd = col("w").cast("decimal(38,0)")
    val nl = lw.groupBy("left_id").agg(sum(wd * col("w")).as("sl"))
    val nr = rw.groupBy("right_id").agg(sum(wd * col("w")).as("sr"))
    val dot = lw.join(rw.withColumnRenamed("w", "rw"), "term")
      .groupBy("left_id", "right_id").agg(sum(wd * col("rw")).as("dot"))
    val scored = dot.join(nl, "left_id").join(nr, "right_id")
      .select(col("left_id"), col("right_id"),
        floor(col("dot").cast("double") /
          (sqrt(col("sl").cast("double")) * sqrt(col("sr").cast("double"))) * 1000000L)
          .cast("long").as("score_ppm"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score_ppm"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score_ppm"))
    // lefts sharing no term with any right: score 0, smallest right_id
    val fallback = left.select(col("id").as("left_id"))
      .join(best.select(col("left_id")), Seq("left_id"), "left_anti")
      .crossJoin(broadcast(right.agg(min(col("id")).as("right_id"))))
      .filter(col("right_id").isNotNull) // empty right: emit nothing, not (left, NULL, 0)
      .withColumn("score_ppm", lit(0L))
    best.unionByName(fallback)
  }

  /** Best TF-IDF match per left row. `left`/`right`: (id, text). */
  def bestMatch(left: DataFrame, right: DataFrame, numFeatures: Int = 1 << 16): DataFrame = {
    // null text ≡ empty doc (ML Tokenizer NPEs on NULL cells otherwise)
    val l = left.select(col("id").as("left_id"),
      coalesce(col("text"), lit("")).as("left_text"))
    val r = right.select(col("id").as("right_id"),
      coalesce(col("text"), lit("")).as("right_text"))

    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    // Tokenizer splits on \s, and "".split / " x".split mint "" tokens —
    // an all-null/empty doc would carry a REAL one-token vector and score
    // cosine 1.0 against every other empty doc; drop empty tokens so empty
    // docs are zero vectors (score 0, the sklearn all-zero-row behavior)
    def toksOf(df: DataFrame): DataFrame =
      tok.transform(df).withColumn("words",
        filter(col("words"), w => length(w) > 0))
    // J9: vocabulary statistics fitted on the union of both sides
    val corpus = tf.transform(toksOf(
      l.select(col("left_text").as("text")).unionByName(
        r.select(col("right_text").as("text")))))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(corpus)

    def vectorize(df: DataFrame, textCol: String, out: String): DataFrame =
      idf.transform(tf.transform(toksOf(df.withColumn("text", col(textCol)))))
        .withColumnRenamed("tfidf", out).drop("text", "words", "tf")
        // per-row norm ONCE: recomputing both norms inside the pair UDF
        // costs O(|L|·|R|·nnz) pure waste on the cross-join hot path
        .withColumn(out + "_n", normUdf(col(out)))

    val lv = vectorize(l, "left_text", "lv")
    val rv = vectorize(r, "right_text", "rv")
    val scored = lv.crossJoin(broadcast(rv))
      .withColumn("score",
        when(col("lv_n") === 0.0 || col("rv_n") === 0.0, 0.0)
          .otherwise(dotUdf(col("lv"), col("rv")) / (col("lv_n") * col("rv_n"))))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score"))
  }

  /** The ONE BM25 tokenizer, shared by retrieval ([[bm25Scores]]) and
    * rerank ([[bm25Rerank]]) so the candidate-selection and rescoring
    * stages can never drift onto different token streams. coalesce: Spark
    * `size(null array)` is -1, which would poison dl/Σdl while an oracle
    * engine's SUM just skips the NULL. Control strip: Java `\s` includes
    * \x0B, RE2's does not (the bpeTrainMerges parity rule). */
  private def bm25Tokens(text: Column): Column = {
    val cleaned = regexp_replace(
      lower(coalesce(text, lit(""))), "[\\x00-\\x1F]", " ")
    filter(split(cleaned, "\\s+"), x => length(x) > 0)
  }

  /** BM25 retrieval scoring (Robertson/Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
    * IDF variant) of every document against a literal query — the classical
    * lexical-retrieval baseline next to the TF-IDF and embedding matchers.
    *
    * Scale shape: ONE tiny global agg computes N, Σdl, and per-query-term
    * document frequencies in a single pass (the query is a literal, so
    * per-term tf needs no (doc, term) explode — a HOF count inside the
    * scan); the 1-row stats then broadcast and scoring is zero-shuffle.
    *
    * Determinism: per-term contribution floor-quantized to 1e-4 BEFORE the
    * sum (the [[TrainingData.ngramLmScore]] pattern), with the float
    * operation order pinned — dl/avgdl written as (dl·N)/Σdl — so the
    * DuckDB replica lands on identical integers. */
  /** Query terms pass through the SAME normalization as document tokens
    * (lowercase, control chars to spaces, whitespace split, empties
    * dropped): an un-normalized "Hash" would match nothing against the
    * lowercased token stream and silently zero the whole ranking. */
  private def normQueryTerms(queryTerms: Seq[String]): Seq[String] =
    queryTerms.flatMap(t =>
      t.toLowerCase.replaceAll("[\\x00-\\x1F]", " ").split("\\s+"))
      .filter(_.nonEmpty)

  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 queryTerms0: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val queryTerms = normQueryTerms(queryTerms0)
    require(queryTerms.nonEmpty, "bm25Scores needs at least one query term")
    val base = df.filter(col(idCol).isNotNull) // null ids cannot survive the rerank join-back
      .select(col(idCol), bm25Tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val aggs = count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).cast("double").as("sum_dl") +:
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
          .cast("double").as(s"df_$i")
      }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val termQ4 = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      val tfc = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") * col("n_docs")) / col("sum_dl")))
      floor(idf * tfc * lit(10000.0)).cast("long")
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), col("dl").as("n_tokens"),
        termQ4.reduce(_ + _).as("bm25_q4"))
  }

  /** Retrieve-then-rerank: BM25 top-`k` candidates, rescored by a richer
    * candidate-only "cross-encoder-style" lexical score — term coverage,
    * ordered query-bigram adjacency, total tf — then top-`m`. The integer
    * rerank key packs (coverage, adjacency, tf) into one Long with the
    * narrower signals capped, so ordering is exact in any engine.
    *
    * Scale shape: stage 1 is [[bm25Scores]]' zero-shuffle scan +
    * `TakeOrderedAndProject` top-k (per-partition heap, never a global
    * sort); stage 2 re-reads ONLY the k candidates via a broadcast
    * equi-join — the expensive positional features never run over
    * non-candidates, which is the entire point of the rerank pattern at
    * corpus scale. Final top-m touches k rows. */
  def bm25Rerank(df: DataFrame, idCol: String, textCol: String,
                 queryTerms0: Seq[String], k: Int = 50, m: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(normQueryTerms(queryTerms0).nonEmpty,
      "bm25Rerank needs at least one query term")
    val queryTerms = normQueryTerms(queryTerms0)
    val candidates = bm25Scores(df, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25_q4").desc, col(idCol).asc).limit(k)
    val cand = df
      .join(broadcast(candidates.select(col(idCol), col("bm25_q4"))), Seq(idCol))
      .select(col(idCol), col("bm25_q4"), bm25Tokens(col(textCol)).as("toks"))
    val distinctTerms = queryTerms.distinct
    val coverage = distinctTerms
      .map(t => when(array_contains(col("toks"), t), 1L).otherwise(0L))
      .reduce(_ + _)
    // ordered query bigrams against the token stream: zip each token with
    // its successor (zip_with right-pads with null, which no term equals)
    val shifted =
      slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0)))
    val bigrams = queryTerms.sliding(2).filter(_.size == 2).toSeq.distinct // dedup like distinctTerms — repeated query bigrams must not double-weight
    val adjacency =
      if (bigrams.isEmpty) lit(0L)
      else bigrams.map { bg =>
        val (x, y) = (bg.head, bg(1))
        size(filter(zip_with(col("toks"), shifted,
          (a, c) => a === x && c === y), p => p)).cast("long")
      }.reduce(_ + _)
    val tfTotal = distinctTerms
      .map(t => size(filter(col("toks"), x => x === t)).cast("long"))
      .reduce(_ + _)
    val rer = cand.select(col(idCol), col("bm25_q4"),
      coverage.as("coverage"),
      least(adjacency, lit(999999L)).as("adjacency"),
      least(tfTotal, lit(999999L)).as("tf_capped"))
      .withColumn("rerank_q",
        col("coverage") * lit(1000000000000L) +
          col("adjacency") * lit(1000000L) + col("tf_capped"))
    val ord = Seq(col("rerank_q").desc, col("bm25_q4").desc, col(idCol).asc)
    val w = Window.orderBy(ord: _*) // post-limit: ≤ m rows
    rer.orderBy(ord: _*).limit(m)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(idCol), col("bm25_q4"), col("coverage"),
        col("adjacency"), col("rerank_q"))
  }
}
