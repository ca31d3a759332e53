package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TextHashExpressions.fingerprint64
import graft.expressions.VectorExpressions.{centroid_argmax, float_cosine, hyperplane_bucket}

/** Approximate-nearest-neighbor search over an `array<float>` embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop scored scan
  * (queries are small, corpus is the big side; the 100 TB path streams the
  * corpus once per query batch, no shuffle of the corpus).
  *
  * Scale path: IVF-style LSH bucketing — corpus pre-bucketed by random
  * hyperplane signs; queries probe only matching buckets (optionally with
  * multi-probe by flipping bits). Recall/latency traded via `bits`.
  *
  * Null hygiene (uniform across all four operators): rows with a null id or
  * null vector are dropped on BOTH sides at entry — a null vector carries no
  * geometry, and emitting k null-scored "neighbors" for it (or silently
  * dropping it from one operator but not another) would poison downstream
  * ppm scoring. */
object SimilaritySearch {

  /** Entry hygiene shared by every operator: (id, vec) with nulls dropped. */
  private def valid(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.filter(col("id").isNotNull && col("vec").isNotNull)
      .select(col("id").as(idAs), col("vec").as(vecAs))

  /** Shared exact-cosine re-rank tail: per-query top-k with the
    * (score desc, corpus_id) tie order every oracle replays. */
  private def topKByScore(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))

  /** Brute-force exact top-k per query. `queries`/`corpus`: (id, vec). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = valid(queries, "query_id", "qv")
    val c = valid(corpus, "corpus_id", "cv")
    topKByScore(broadcast(q).crossJoin(c)
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .filter(col("query_id") =!= col("corpus_id")), k)
  }

  /** LSH-bucketed ANN with MULTI-PROBE: the corpus is bucketed once; each
    * query probes its own bucket plus every bucket within Hamming distance
    * `probeHamming` of it (bit-flip neighbors — where near neighbors that
    * straddle a hyperplane land). Candidates are re-ranked by exact cosine.
    * Probing multiplies only the (small, broadcast) query side — the corpus
    * is still scanned once and shuffled never. Recall vs `bruteForceTopK` is
    * measured in DedupRecallSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              bits: Int = 6, probeHamming: Int = 1): DataFrame = {
    // the mask enumeration below is 2^bits driver-side work, and past ~20
    // bits the buckets are so fine that recall collapses anyway — fail loud
    // rather than hang the driver (or, at bits = 64, silently lose
    // multi-probe to the 1L << 64 == 1 shift wraparound)
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    // all bit masks with popcount <= probeHamming (identity mask included)
    val masks: Seq[Long] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
    val q = valid(queries, "query_id", "qv")
      .withColumn("bucket0", hyperplane_bucket(col("qv"), bits, dim))
      .withColumn("bucket", explode(array(masks.map(m =>
        col("bucket0").bitwiseXOR(lit(m))): _*)))
      .drop("bucket0")
    val c = valid(corpus, "corpus_id", "cv")
      .withColumn("bucket", hyperplane_bucket(col("cv"), bits, dim))
    topKByScore(broadcast(q).join(c, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", float_cosine(col("qv"), col("cv"))), k)
  }

  /** Int8-quantized brute-force top-k: both sides symmetric-quantized
    * (4× smaller corpus residency — the difference between an in-memory and
    * a spilling ANN sweep at 100 TB), scored by exact integer dot/norms
    * with one double division. The per-vector scales cancel in cosine, so
    * only the int8 payloads flow through the join. Score error vs the
    * float path is bounded and measured in DedupRecallSpec. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.expressions.VectorExpressions.{byte_cosine, quantize_int8}
    val q = valid(queries, "query_id", "qv")
      .select(col("query_id"), quantize_int8(col("qv")).as("qq"))
    val c = valid(corpus, "corpus_id", "cv")
      .select(col("corpus_id"), quantize_int8(col("cv")).as("cq"))
    topKByScore(broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", byte_cosine(col("qq"), col("cq"))), k)
  }

  /** Deterministic IVF centroid training. Seeds = the `nlist` corpus vectors
    * ranked by the 64-bit id fingerprint (an unbiased deterministic sample —
    * same chain as TrainingData's sampling, replayable by the SQL oracle),
    * optionally refined by `lloydIters` rounds of distributed Lloyd:
    * assignment is a codegen'd one-pass argmax over broadcast centroids;
    * per-partition partial (sum, count) accumulators are merged on the
    * driver (nlist × dim doubles — the classic tiny-model combiner pattern,
    * exactly how Spark ML's KMeans iterates at scale). Empty lists keep
    * their previous centroid. The filtered corpus is persisted for the
    * duration (seed scan + one scan per Lloyd round would otherwise
    * re-evaluate the input lineage each time).
    *
    * Known limitation (documented, recall-gated): seeds are NOT deduplicated
    * by vector, so exact-duplicate embeddings can seed identical centroids
    * whose lists stay empty (argmax ties keep the lowest index) — on a
    * dup-heavy corpus that wastes probe slots. The recall gates in
    * DedupRecallSpec measure the net effect; dedup the corpus first
    * ([[Dedup.exact]]) when duplicates dominate. */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int,
                        lloydIters: Int = 0): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // null ids would SORT FIRST under the fp ranking (fingerprint of null is
    // null), hijacking the seed sample with rows that can never be results
    val vecs = corpus.filter(col("id").isNotNull && col("vec").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Float]] = vecs
        .withColumn("fp", fingerprint64(col("id").cast("string")))
        .orderBy(col("fp"), col("id")).limit(nlist)
        .select(col("vec")).as[Array[Float]].collect()
      require(centroids.nonEmpty,
        "corpus has no rows with non-null (id, vec) — nothing to seed from")
      val dim = centroids.head.length
      var iter = 0
      while (iter < lloydIters) {
        val bc = spark.sparkContext.broadcast(
          (centroids, graft.expressions.VectorExpressions.CentroidArgmax.norms(centroids)))
        val partials = vecs.select(col("vec")).as[Array[Float]]
          .mapPartitions { it =>
            val (cents, cnorms) = bc.value
            val sums = Array.ofDim[Double](cents.length, dim)
            val counts = new Array[Long](cents.length)
            it.foreach { v =>
              val c = graft.expressions.VectorExpressions.CentroidArgmax.compute(
                org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), cents, cnorms)
              var i = 0
              while (i < math.min(v.length, dim)) { sums(c)(i) += v(i); i += 1 }
              counts(c) += 1
            }
            Iterator.single((sums.map(_.toSeq).toSeq, counts.toSeq))
          }.collect()
        // single accumulation pass over the partials: per-(centroid, dim)
        // collection traversals would churn P·nlist·dim boxed doubles
        val accSums = Array.ofDim[Double](centroids.length, dim)
        val accCounts = new Array[Long](centroids.length)
        partials.foreach { case (ps, pc) =>
          var c = 0
          while (c < centroids.length) {
            accCounts(c) += pc(c)
            val row = ps(c)
            var i = 0
            while (i < dim) { accSums(c)(i) += row(i); i += 1 }
            c += 1
          }
        }
        centroids = Array.tabulate(centroids.length) { c =>
          if (accCounts(c) == 0) centroids(c)
          else {
            val merged = new Array[Float](dim)
            var i = 0
            while (i < dim) {
              merged(i) = (accSums(c)(i) / accCounts(c)).toFloat
              i += 1
            }
            merged
          }
        }
        bc.destroy()
        iter += 1
      }
      centroids
    } finally { vecs.unpersist(); () }
  }

  /** IVF ANN: corpus assigned once to its max-cosine centroid in a single
    * codegen'd pass (no blowup, no shuffle of the corpus); each query probes
    * its `nprobe` closest lists and re-ranks candidates by exact cosine.
    * The probe explosion multiplies only the small broadcast query side.
    * With lloydIters = 0 the centroids are exact corpus vectors, which keeps
    * the whole operator bit-replayable by the DuckDB oracle; recall vs
    * `bruteForceTopK` for both settings is measured in DedupRecallSpec. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int,
              nprobe: Int, lloydIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = trainIvfCentroids(corpus, nlist, lloydIters)
    val centDf = spark.createDataFrame(
      centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    ).toDF("cluster", "centv")
    val c = valid(corpus, "corpus_id", "cv")
      .withColumn("cluster", centroid_argmax(col("cv"), centroids))
    val q = valid(queries, "query_id", "qv")
      .crossJoin(broadcast(centDf))
      .withColumn("cscore", float_cosine(col("qv"), col("centv")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cscore"), col("cluster"))))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    topKByScore(broadcast(q).join(c, "cluster")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", float_cosine(col("qv"), col("cv"))), k)
  }
}
