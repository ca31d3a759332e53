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
  * multi-probe by flipping bits). Recall/latency traded via `bits`. */
object SimilaritySearch {

  /** Brute-force exact top-k per query. `queries`/`corpus`: (id, vec). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .filter(col("query_id") =!= col("corpus_id"))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
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
    // all bit masks with popcount <= probeHamming (identity mask included)
    val masks: Seq[Long] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("bucket0", hyperplane_bucket(col("qv"), bits, dim))
      .withColumn("bucket", explode(array(masks.map(m =>
        col("bucket0").bitwiseXOR(lit(m))): _*)))
      .drop("bucket0")
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"))
      .withColumn("bucket", hyperplane_bucket(col("cv"), bits, dim))
    broadcast(q).join(c, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
  }

  /** Int8-quantized brute-force top-k: both sides symmetric-quantized
    * (4× smaller corpus residency — the difference between an in-memory and
    * a spilling ANN sweep at 100 TB), scored by exact integer dot/norms
    * with one double division. The per-vector scales cancel in cosine, so
    * only the int8 payloads flow through the join. Score error vs the
    * float path is bounded and measured in DedupRecallSpec. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import graft.expressions.VectorExpressions.{byte_cosine, quantize_int8}
    val q = queries.select(col("id").as("query_id"),
      quantize_int8(col("vec")).as("qq"))
    val c = corpus.select(col("id").as("corpus_id"),
      quantize_int8(col("vec")).as("cq"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", byte_cosine(col("qq"), col("cq")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
  }

  /** Deterministic IVF centroid training. Seeds = the `nlist` corpus vectors
    * ranked by the 64-bit id fingerprint (an unbiased deterministic sample —
    * same chain as TrainingData's sampling, replayable by the SQL oracle),
    * optionally refined by `lloydIters` rounds of distributed Lloyd:
    * assignment is a codegen'd one-pass argmax over broadcast centroids;
    * per-partition partial (sum, count) accumulators are merged on the
    * driver (nlist × dim doubles — the classic tiny-model combiner pattern,
    * exactly how Spark ML's KMeans iterates at scale). Empty lists keep
    * their previous centroid. */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int,
                        lloydIters: Int = 0): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.filter(col("vec").isNotNull) // null vectors carry no geometry
    var centroids: Array[Array[Float]] = vecs
      .withColumn("fp", fingerprint64(col("id").cast("string")))
      .orderBy(col("fp"), col("id")).limit(nlist)
      .select(col("vec")).as[Array[Float]].collect()
    require(centroids.nonEmpty, "corpus smaller than nlist")
    val dim = centroids.head.length
    var iter = 0
    while (iter < lloydIters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val partials = vecs.select(col("vec")).as[Array[Float]]
        .mapPartitions { it =>
          val cents = bc.value
          val sums = Array.ofDim[Double](cents.length, dim)
          val counts = new Array[Long](cents.length)
          it.foreach { v =>
            val c = graft.expressions.VectorExpressions.CentroidArgmax.compute(
              org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), cents)
            var i = 0
            while (i < math.min(v.length, dim)) { sums(c)(i) += v(i); i += 1 }
            counts(c) += 1
          }
          Iterator.single((sums.map(_.toSeq).toSeq, counts.toSeq))
        }.collect()
      centroids = Array.tabulate(centroids.length) { c =>
        val total = partials.map(_._2(c)).sum
        if (total == 0) centroids(c)
        else {
          val merged = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            merged(i) = (partials.map(_._1(c)(i)).sum / total).toFloat
            i += 1
          }
          merged
        }
      }
      bc.destroy()
      iter += 1
    }
    centroids
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
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"))
      .withColumn("cluster", centroid_argmax(col("cv"), centroids))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("cscore", float_cosine(col("qv"), col("centv")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cscore"), col("cluster"))))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    broadcast(q).join(c, "cluster")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
  }
}
